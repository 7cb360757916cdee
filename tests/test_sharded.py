"""Sharded (splat, tile) mesh pipeline vs. the single-device fast path.

Runs on the 8 virtual CPU devices from conftest.py; the driver separately
dry-runs the same code through __graft_entry__.dryrun_multichip.
"""

import jax
import jax.numpy as jnp
import optax
import pytest

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.parallel import (
    TrainState,
    make_mesh,
    make_train_step,
    sharded_render,
)
from gaussiansplats3d_tpu.parallel.sharded import (
    device_put_sharded_splats,
    pad_splats_for_mesh,
)
from gaussiansplats3d_tpu.parallel.train import SplatParams, image_to_tile_blocks


def scene(n=512, sh_degree=1, seed=3):
    return gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=sh_degree)


CFG = gs.RenderConfig(width=128, height=128, sh_degree=1, sort_bits=20,
                      background=(0.05, 0.1, 0.15))
CAM = gs.Camera.look_at((2.2, 1.4, 2.0), (0, 0, 0), fov_y_deg=60, aspect=1.0)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4), (8, 1)])
def test_sharded_matches_single_device(shape):
    splats = scene()
    mesh = make_mesh(splat_shards=shape[0], tile_shards=shape[1])
    ref = gs.render(splats, CAM, CFG)
    sp = device_put_sharded_splats(splats, mesh)
    out = jax.jit(lambda s: sharded_render(mesh, s, CAM, CFG))(sp)
    assert jnp.max(jnp.abs(out["color"] - ref["color"])) < 2e-3
    assert jnp.max(jnp.abs(out["alpha"] - ref["alpha"])) < 2e-3


def test_sharded_gradients_match_single_device():
    splats = scene(300)
    mesh = make_mesh(splat_shards=2, tile_shards=4)
    target = jnp.zeros((CFG.height, CFG.width, 3))

    def loss_single(s):
        return jnp.mean((gs.render(s, CAM, CFG)["color"] - target) ** 2)

    def loss_sharded(s):
        img = sharded_render(mesh, s, CAM, CFG)["color"]
        return jnp.mean((img - target) ** 2)

    g_ref = jax.grad(loss_single)(splats)
    sp = device_put_sharded_splats(splats, mesh)
    g_sh = jax.jit(jax.grad(loss_sharded))(sp)
    for name in ("means", "scales", "quats", "colors", "sh"):
        a = getattr(g_sh, name)
        b = getattr(g_ref, name)
        scale = jnp.maximum(jnp.max(jnp.abs(b)), 1e-8)
        assert jnp.max(jnp.abs(a - b)) / scale < 5e-3, name


def test_padding_preserves_render():
    splats = scene(509)  # not divisible by 8
    mesh = make_mesh(splat_shards=8, tile_shards=1)
    padded = pad_splats_for_mesh(splats, mesh)
    assert padded.num_splats % 8 == 0
    ref = gs.render(splats, CAM, CFG)
    out = jax.jit(lambda s: sharded_render(mesh, s, CAM, CFG))(padded)
    assert jnp.max(jnp.abs(out["color"] - ref["color"])) < 2e-3


def test_train_step_reduces_loss():
    mesh = make_mesh(splat_shards=4, tile_shards=2)
    target_splats = scene(256, seed=11)
    target = gs.render(target_splats, CAM, CFG)["color"]
    target_tiles, tile_mask = image_to_tile_blocks(target, CFG)

    init = scene(256, seed=12)
    opt = optax.adam(2e-2)
    state = TrainState.create(device_put_sharded_splats(init, mesh), opt)
    step = jax.jit(make_train_step(CFG, mesh, opt))

    state, m0 = step(state, CAM, target_tiles, tile_mask)
    losses = [float(m0["loss"])]
    for _ in range(10):
        state, m = step(state, CAM, target_tiles, tile_mask)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert all(jnp.isfinite(jnp.asarray(losses)))
    assert int(state.step) == 11


def test_splat_params_roundtrip():
    splats = scene(64)
    rt = SplatParams.from_splats(splats).to_splats()
    assert jnp.allclose(rt.means, splats.means)
    assert jnp.allclose(rt.scales, splats.scales, rtol=1e-5)
    assert jnp.allclose(rt.colors, splats.colors, atol=1e-5)
