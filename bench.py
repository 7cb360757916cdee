"""Benchmark: fwd+bwd splat-render throughput at 1080p on the local chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Msplats/s", "vs_baseline": N}

Metric: million splats processed per second through a full forward+backward
render (loss = mean image error, gradients w.r.t. every splat attribute) at
1920x1080 — BASELINE.md's headline per-chip number.

`vs_baseline`: the reference has no published throughput (BASELINE.md); its
known bottleneck is the single-core CPU/WASM counting sort
(/root/reference/README.md:36-42, src/worker/sorter.cpp), which processes
roughly 10 Msplats/s forward-only on a desktop core (a ~100 ms sort of a
1M-splat scene, the README's "sub-optimal" regime).  We report our
fwd+bwd throughput against that 10 Msplats/s forward-only bound.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import gaussiansplats3d_tpu as gs  # noqa: E402

import numpy as np  # noqa: E402


def _sync(x):
    """1-element host readback: over the axon tunnel block_until_ready can
    return before remote execution completes; a device->host fetch cannot
    lie (the device executes in order, so one element of the LAST result
    implies everything before it finished)."""
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


N = (int(float(sys.argv[1]))
     if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 2_000_000)
WIDTH, HEIGHT = 1920, 1080
SH_DEGREE = 1
REFERENCE_CPU_SORT_MSPLATS_PER_S = 10.0


def _make_scene(n, sh_degree, key=0):
    splats = gs.random_splats(jax.random.PRNGKey(key), n, sh_degree=sh_degree,
                              extent=2.0)
    # Realistic scan-like splat sizes (a few pixels on screen), so the
    # pair/fragment workload matches real scenes rather than giant blobs.
    return dataclasses.replace(splats, scales=splats.scales * 0.15)


def frames_per_s_8m():
    """Forward-only frames/s at 8M splats SH0 1080p (BASELINE.md metric 2:
    the reference README's headline '8M splat scenes' capability)."""
    n = 8_000_000
    # record_precision='packed' is the view/serving mode (positions 1/16 px,
    # conic f16, color+opacity u8): the same fidelity class as the
    # reference's u8 color data textures it renders 8M scenes with.
    # forward_only drops the backward-alignment operand from the sort
    # (viewing never differentiates).
    cfg = gs.RenderConfig(width=WIDTH, height=HEIGHT, sh_degree=0,
                          sort_bits=16, record_precision="packed",
                          forward_only=True, aux_multiplier=0.3)
    splats = _make_scene(n, 0)
    camera = gs.Camera.look_at((4.5, 2.5, 4.5), (0.0, 0.0, 0.0),
                               fov_y_deg=60.0, aspect=WIDTH / HEIGHT)
    fwd = jax.jit(lambda s: gs.render(s, camera, cfg)["color"])
    _sync(fwd(splats))
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(splats)
    jax.block_until_ready(out)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def demo_16m():
    """16M-splat SH0 1080p forward render on one chip (no OOM) — the
    reference's headline scene size (/root/reference/README.md:48-53)."""
    n = 16_000_000
    cfg = gs.RenderConfig(width=WIDTH, height=HEIGHT, sh_degree=0,
                          sort_bits=16, record_precision="packed",
                          forward_only=True, aux_multiplier=0.3)
    splats = _make_scene(n, 0)
    camera = gs.Camera.look_at((4.5, 2.5, 4.5), (0.0, 0.0, 0.0),
                               fov_y_deg=60.0, aspect=WIDTH / HEIGHT)
    fwd = jax.jit(lambda s: gs.render(s, camera, cfg, return_aux=True))
    out = fwd(splats)
    jax.block_until_ready(out["color"])
    _sync(out["color"])
    t0 = time.perf_counter()
    out = fwd(splats)
    jax.block_until_ready(out["color"])
    _sync(out["color"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "16M SH0 1080p forward (single chip)",
        "value": round(dt * 1000.0, 1), "unit": "ms",
        "num_pairs": int(out["num_pairs"]),
        "overflow": int(out["overflow"])}))


def _grad_step_msplats(n, cfg, iters=5):
    """Full fwd+bwd step (gradients w.r.t. every attribute) throughput."""
    splats = _make_scene(n, cfg.sh_degree)
    camera = gs.Camera.look_at((4.5, 2.5, 4.5), (0.0, 0.0, 0.0),
                               fov_y_deg=60.0, aspect=WIDTH / HEIGHT)

    def loss_fn(s):
        img = gs.render(s, camera, cfg)["color"]
        return jnp.mean(img * img)

    step = jax.jit(jax.grad(loss_fn))
    g = step(splats)                       # compile + warmup
    jax.block_until_ready(g.means)
    _sync(g.means)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(splats)
    jax.block_until_ready(g.means)
    _sync(g.means)
    dt = (time.perf_counter() - t0) / iters
    return n / dt / 1e6


def main():
    cfg = gs.RenderConfig(width=WIDTH, height=HEIGHT, sh_degree=SH_DEGREE,
                          sort_bits=16)
    msplats_per_s = _grad_step_msplats(N, cfg)
    # 'train-packed': the serving record codecs (positions 1/16 px, conic
    # f16, color+opacity u8) with gradients ON — cotangents stay
    # straight-through f32 (mean2d exact: the densification signal); the
    # fused pair sort rides 4 physical operands instead of mixed's 8.
    cfg_tp = cfg.replace(record_precision="packed")
    tp_2m = _grad_step_msplats(N, cfg_tp)
    # the BASELINE bar's scale: fwd+bwd at 8M splats @1080p
    tp_8m = _grad_step_msplats(8_000_000, cfg_tp)
    print(json.dumps({
        "metric": "fwd+bwd Msplats/s/chip @1080p "
                  f"(N={N}, SH{SH_DEGREE})",
        "value": round(msplats_per_s, 3),
        "unit": "Msplats/s",
        "vs_baseline": round(
            msplats_per_s / REFERENCE_CPU_SORT_MSPLATS_PER_S, 3),
        "train_packed_msplats": round(tp_2m, 2),
        "fwd_bwd_8m_train_packed_msplats": round(tp_8m, 2),
        "frames_per_s_8m": round(frames_per_s_8m(), 2),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--demo16m":
        demo_16m()
    else:
        main()
