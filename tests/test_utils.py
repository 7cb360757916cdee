"""Metrics, logging, checkpointing."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.parallel import TrainState, make_mesh, make_train_step
from gaussiansplats3d_tpu.parallel.distributed import (
    load_checkpoint,
    save_checkpoint,
)
from gaussiansplats3d_tpu.parallel.sharded import device_put_sharded_splats
from gaussiansplats3d_tpu.parallel.train import image_to_tile_blocks
from gaussiansplats3d_tpu.utils import (
    FrameStats,
    Timer,
    get_logger,
    set_log_level,
)
from gaussiansplats3d_tpu.utils.metrics import timed_render
from gaussiansplats3d_tpu.viewer.enums import LogLevel


def test_timer_and_frame_stats():
    with Timer() as t:
        x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
        t.block_on(x)
    assert t.ms > 0
    fs = FrameStats(wall_ms=10.0, num_splats=100000)
    assert fs.msplats_per_s == 10.0
    assert "msplats_per_s" in fs.as_dict()


def test_timed_render():
    splats = gs.random_splats(jax.random.PRNGKey(0), 200)
    cam = gs.Camera.look_at((2, 1, 2), (0, 0, 0))
    cfg = gs.RenderConfig(width=64, height=64)
    out, stats = timed_render(gs.render, splats, cam, cfg, return_aux=True)
    assert stats.wall_ms > 0
    assert stats.width == 64 and stats.height == 64
    assert stats.num_pairs > 0


def test_log_level_gating(caplog):
    log = get_logger()
    set_log_level(LogLevel.ERROR)
    with caplog.at_level(logging.DEBUG, logger="gaussiansplats3d_tpu"):
        log.warning("hidden")
    assert log.level == logging.ERROR
    set_log_level(LogLevel.DEBUG)
    assert log.level == logging.DEBUG
    set_log_level(LogLevel.WARNING)


def test_checkpoint_roundtrip(tmp_path):
    mesh = make_mesh(splat_shards=4, tile_shards=2)
    cfg = gs.RenderConfig(width=64, height=64, sh_degree=1, sort_bits=16)
    cam = gs.Camera.look_at((2.2, 1.4, 2.0), (0, 0, 0))
    target = jnp.zeros((64, 64, 3))
    tiles, mask = image_to_tile_blocks(target, cfg)

    opt = optax.adam(1e-2)
    splats = device_put_sharded_splats(
        gs.random_splats(jax.random.PRNGKey(3), 256, sh_degree=1), mesh)
    state = TrainState.create(splats, opt)
    step = jax.jit(make_train_step(cfg, mesh, opt))
    for _ in range(3):
        state, metrics = step(state, cam, tiles, mask)

    prefix = str(tmp_path / "ckpt")
    save_checkpoint(state, prefix)
    restored = load_checkpoint(prefix, opt)
    assert int(restored.step) == 3
    # optimizer moments restored exactly
    a = jax.tree.leaves(state.opt_state)
    b = jax.tree.leaves(restored.opt_state)
    for x, y in zip(a, b):
        assert np.allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    # resumed training continues to work and matches a continued run
    s1, m1 = step(restored, cam, tiles, mask)
    s2, m2 = step(state, cam, tiles, mask)
    assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-3)


def test_psnr_ssim_metrics():
    import jax
    import jax.numpy as jnp
    from gaussiansplats3d_tpu.utils.image_metrics import (
        d_ssim_l1_loss, psnr, ssim)

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (64, 48, 3))
    # identical images: perfect scores
    assert float(psnr(img, img)) > 100.0
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    assert float(d_ssim_l1_loss(img, img)) < 1e-5
    # known-MSE case: psnr = 10 log10(1/mse)
    ref = img + 0.1
    import numpy as np
    assert abs(float(psnr(img, ref)) - 10 * np.log10(1 / 0.01)) < 1e-3
    # noise hurts ssim monotonically
    n1 = img + 0.05 * jax.random.normal(key, img.shape)
    n2 = img + 0.20 * jax.random.normal(key, img.shape)
    assert float(ssim(img, n1)) > float(ssim(img, n2))
    # differentiable (usable as a training loss)
    g = jax.grad(lambda x: d_ssim_l1_loss(x, jnp.zeros_like(x)))(img)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0
