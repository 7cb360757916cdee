"""Smoke tests for the CLI tools (the reference's demo-page / node-CLI
analogues: /root/reference/util/create-ksplat.js, demo/*.html).

Each tool's ``main(argv)`` is invoked in-process on a tiny scene so the
whole user-facing command surface stays importable and runnable.
"""

import json

import jax
import numpy as np
import pytest

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu import io as gio


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    path = tmp_path_factory.mktemp("tools") / "tiny.splat"
    splats = gs.random_splats(jax.random.PRNGKey(3), 128, sh_degree=0)
    gio.save(splats, str(path))
    return str(path)


def test_create_ksplat_cli(tiny_scene, tmp_path):
    from gaussiansplats3d_tpu.tools.create_ksplat import main

    out = str(tmp_path / "out.ksplat")
    assert main([tiny_scene, out, "1"]) == 0
    loaded = gio.load(out)
    assert loaded.num_splats == 128


def test_render_scene_cli(tiny_scene, tmp_path):
    from gaussiansplats3d_tpu.tools.render_scene import main

    out = str(tmp_path / "frame.png")
    rc = main([tiny_scene, out, "--width", "64", "--height", "48",
               "--sh", "0", "--frames", "1"])
    assert rc in (0, None)
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape[:2] == (48, 64)


def test_train_scene_cli(tiny_scene, tmp_path, capsys):
    from gaussiansplats3d_tpu.tools.train_scene import main

    fitted = str(tmp_path / "fitted.ksplat")
    rc = main(["--scene", tiny_scene, "--views", "2", "--iters", "4",
               "--init", "64", "--width", "64", "--height", "64",
               "--densify-every", "0", "--log-every", "2",
               "--save", fitted])
    assert rc == 0
    out = capsys.readouterr().out
    assert "final psnr" in out
    assert gio.load(fitted).num_splats == 64


def test_bench_configs_importable():
    # The full CLI renders at 1080p (too heavy for CI); keep the module
    # importable and its config table well-formed.
    from gaussiansplats3d_tpu.tools import bench_configs

    assert callable(bench_configs.main)
    assert callable(bench_configs.run_config)
