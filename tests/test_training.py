"""Densify/prune heuristics + batched-camera rendering."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.parallel.heuristics import (
    DensifyConfig,
    DensifyState,
    densify_and_prune,
    num_alive,
)
from gaussiansplats3d_tpu.parallel.train import SplatParams
from gaussiansplats3d_tpu.render.pipeline import render_batch, stack_cameras


def params_scene(n=256, seed=0):
    s = gs.random_splats(jax.random.PRNGKey(seed), n, sh_degree=1)
    return SplatParams.from_splats(s)


def test_prune_parks_transparent_splats():
    p = params_scene()
    lo = np.array(p.logit_opacity)
    lo[:50] = -8.0            # sigmoid ~ 3e-4 < min_opacity
    p = dataclasses.replace(p, logit_opacity=jnp.asarray(lo))
    st = DensifyState.create(256)
    cfg = DensifyConfig(grad_threshold=1e9)   # no densify, only prune
    p2, _ = densify_and_prune(p, st, jax.random.PRNGKey(0), cfg)
    assert int(num_alive(p2)) == 206
    assert (np.asarray(p2.logit_opacity[:50]) <= -8.0).all()


def test_densify_fills_dead_slots():
    n = 256
    p = params_scene(n)
    lo = np.array(p.logit_opacity)
    lo[:100] = -12.0          # dead slots available
    lo[100:] = 2.0            # alive
    p = dataclasses.replace(p, logit_opacity=jnp.asarray(lo))
    st = DensifyState.create(n)
    # big accumulated gradients on 20 alive splats
    grads = np.zeros((n, 3), np.float32)
    grads[100:120] = 1.0
    st = st.update(jnp.asarray(grads))
    cfg = DensifyConfig(grad_threshold=1e-3, budget_per_step=64,
                        scene_extent=1.0)
    before = int(num_alive(p))
    p2, st2 = densify_and_prune(p, st, jax.random.PRNGKey(1), cfg)
    after = int(num_alive(p2))
    assert after == before + 20
    # accumulators reset
    assert float(jnp.sum(st2.grad_accum)) == 0.0


def test_split_shrinks_scales():
    n = 64
    p = params_scene(n)
    lo = np.array(p.logit_opacity)
    lo[:32] = -12.0
    lo[32:] = 2.0
    ls = np.array(p.log_scales)
    ls[32:] = np.log(0.5)     # big: > percent_dense * extent
    p = dataclasses.replace(p, logit_opacity=jnp.asarray(lo),
                            log_scales=jnp.asarray(ls))
    st = DensifyState.create(n).update(jnp.ones((n, 3)))
    cfg = DensifyConfig(grad_threshold=1e-3, budget_per_step=16,
                        percent_dense=0.01, scene_extent=1.0)
    p2, _ = densify_and_prune(p, st, jax.random.PRNGKey(2), cfg)
    # split sources shrank by the split factor
    src_scales = np.exp(np.asarray(p2.log_scales[32:48]))
    assert (src_scales < 0.5 / 1.5).all()


def test_fit_psnr_gate():
    """Numerical training-quality gate: recover a perturbed scene to
    >= 25 dB on held renders within a bounded step count.  Catches
    optimizer/gradient regressions that a loss-merely-decreases check
    misses (the reference has no training at all; this is the BASELINE
    north-star capability)."""
    import optax

    key = jax.random.PRNGKey(5)
    truth = gs.random_splats(key, 300, sh_degree=0)
    cfg = gs.RenderConfig(width=64, height=64, sort_bits=14)
    cams = [gs.Camera.look_at(eye, (0, 0, 0), fov_y_deg=60.0)
            for eye in ((2.0, 1.0, 2.0), (-2.0, 1.2, 1.8),
                        (0.5, 2.4, -1.8))]
    render = jax.jit(lambda s, c: gs.render(s, c, cfg)["color"])
    targets = [render(truth, c) for c in cams]

    # perturbed init: same splats, nudged means and colors
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    init = dataclasses.replace(
        truth,
        means=truth.means + 0.03 * jax.random.normal(
            k1, truth.means.shape),
        colors=jnp.clip(truth.colors + 0.15 * jax.random.normal(
            k2, truth.colors.shape), 0.01, 1.0))
    params = SplatParams.from_splats(init)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    from gaussiansplats3d_tpu.render.pipeline import (
        render_batch, stack_cameras)
    cam_batch = stack_cameras(cams)
    target_batch = jnp.stack(targets)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            out = render_batch(p.to_splats(), cam_batch, cfg)["color"]
            return jnp.mean((out - target_batch) ** 2)
        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    from gaussiansplats3d_tpu.utils.image_metrics import psnr
    for _ in range(150):
        params, opt_state, l = step(params, opt_state)
    final = render_batch(params.to_splats(), cam_batch, cfg)["color"]
    p = float(psnr(final, target_batch))
    assert p >= 25.0, f"fit PSNR {p:.2f} dB < 25 dB"


def test_fit_psnr_gate_packed_records():
    """'train-packed' mode: record_precision='packed' with gradients ON
    (forward_only=False) rides the serving sort plan — 4 physical record
    operands (px positions, f16 conic, u8 color/opacity, u8-log box)
    instead of mixed's 8 — while every cotangent stays straight-through
    f32 (mean2d exact: the densification signal).  The quantized forward
    must not break trainability: same recovery gate as the mixed-mode
    fit test."""
    import optax

    key = jax.random.PRNGKey(5)
    truth = gs.random_splats(key, 300, sh_degree=0)
    cfg = gs.RenderConfig(width=64, height=64, sort_bits=14,
                          record_precision="packed")
    cams = [gs.Camera.look_at(eye, (0, 0, 0), fov_y_deg=60.0)
            for eye in ((2.0, 1.0, 2.0), (-2.0, 1.2, 1.8),
                        (0.5, 2.4, -1.8))]
    render = jax.jit(lambda s, c: gs.render(s, c, cfg)["color"])
    targets = [render(truth, c) for c in cams]

    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    init = dataclasses.replace(
        truth,
        means=truth.means + 0.03 * jax.random.normal(
            k1, truth.means.shape),
        colors=jnp.clip(truth.colors + 0.15 * jax.random.normal(
            k2, truth.colors.shape), 0.01, 1.0))
    params = SplatParams.from_splats(init)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    cam_batch = stack_cameras(cams)
    target_batch = jnp.stack(targets)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            out = render_batch(p.to_splats(), cam_batch, cfg)["color"]
            return jnp.mean((out - target_batch) ** 2)
        l, g = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    from gaussiansplats3d_tpu.utils.image_metrics import psnr
    for _ in range(150):
        params, opt_state, l = step(params, opt_state)
    final = render_batch(params.to_splats(), cam_batch, cfg)["color"]
    p = float(psnr(final, target_batch))
    assert p >= 25.0, f"packed-record fit PSNR {p:.2f} dB < 25 dB"


def test_render_batch_multi_view():
    splats = gs.random_splats(jax.random.PRNGKey(3), 200, sh_degree=0)
    cfg = gs.RenderConfig(width=48, height=48)
    cams = stack_cameras([
        gs.Camera.look_at((2.0, 1.0, 2.0), (0, 0, 0)),
        gs.Camera.look_at((-2.0, 1.0, 2.0), (0, 0, 0)),
        gs.Camera.look_at((0.0, 3.0, 0.1), (0, 0, 0)),
    ])
    out = jax.jit(lambda s, c: render_batch(s, c, cfg))(splats, cams)
    imgs = np.asarray(out["color"])
    assert imgs.shape == (3, 48, 48, 3)
    assert np.abs(imgs[0] - imgs[1]).max() > 1e-3
    assert np.isfinite(imgs).all()
