"""True multi-PROCESS distributed test (SURVEY.md §4, BASELINE config 4's
"2+ hosts" shape run as 2 processes x 4 virtual CPU devices on one host).

Unlike the rest of the suite (one process, 8 virtual devices), this spawns
two OS processes that bootstrap `jax.distributed` through the package's
`initialize_distributed`, form ONE global 8-device mesh, and run the
sharded render with real cross-process collectives.  The parent reassembles
each process's addressable tile blocks and checks them against the
single-process reference render.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax.numpy as jnp


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_render(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multiprocess_worker.py")
    coord = f"127.0.0.1:{_free_port()}"

    # strip the TPU plugin bootstrap (this machine's sitecustomize registers
    # the accelerator PJRT plugin at interpreter start, which initializes
    # the XLA backend before jax.distributed.initialize could run) and the
    # parent's CPU flags — the worker sets its own.
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
           and not k.startswith(("PALLAS_AXON", "AXON_"))}
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"worker{pid}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coord, str(pid), out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env))
    for p in procs:
        stdout, _ = p.communicate(timeout=560)
        assert p.returncode == 0, stdout.decode(errors="replace")[-4000:]

    # single-process reference (this process: 8 virtual devices, conftest)
    import jax

    import gaussiansplats3d_tpu as gs

    splats = gs.random_splats(jax.random.PRNGKey(3), 512, sh_degree=1)
    cfg = gs.RenderConfig(width=128, height=128, sh_degree=1, sort_bits=20,
                          background=(0.05, 0.1, 0.15))
    cam = gs.Camera.look_at((2.2, 1.4, 2.0), (0, 0, 0), fov_y_deg=60,
                            aspect=1.0)
    ref = gs.render(splats, cam, cfg)

    # reassemble the distributed tile blocks -> image, compare
    from gaussiansplats3d_tpu.render.pipeline import assemble_image

    t = cfg.num_tiles
    p = cfg.tile_size * cfg.tile_size
    chans = np.full((t, 4, p), np.nan, np.float32)
    for out in outs:
        data = np.load(out)
        for key in data.files:
            _, t0 = key.rsplit("_", 1)
            t0 = int(t0)
            block = data[key]
            chans[t0:t0 + block.shape[0]] = block
    assert not np.isnan(chans).any(), "missing tile blocks"
    out_img = assemble_image(jnp.asarray(chans), cfg)
    assert float(np.abs(np.asarray(out_img["color"])
                        - np.asarray(ref["color"])).max()) < 2e-3
