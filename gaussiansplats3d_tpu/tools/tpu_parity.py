"""On-hardware Pallas kernel parity gate.

CI exercises the Pallas compositor only through interpret mode
(tests/test_pallas.py); this tool runs the REAL kernels on the local TPU
at a shape that exercises the risky kernel paths:

- early exit (an opaque wall of splats drives transmittance under the
  exit threshold mid-tile, so the backward replay starts at exit_k);
- shared floor-aligned boundary chunks (tile ranges that straddle chunk
  boundaries, so adjacent grid steps read-modify-write the same gradient
  chunk through the aliased DMA pipeline);
- the depth channel's 4-wide record layout;
- the 2DGS surfel kernel (ray-plane fragment + hand-derived transpose),
  with and without the depth channel.

Two comparisons per case:

1. **compiled vs interpret** (fwd images AND gradients, tight 1e-3): the
   same Pallas program through Mosaic and through the interpreter has
   IDENTICAL semantics (including the early-exit cutoff), so any
   FIELD-WIDE divergence is a compilation/hardware bug — exactly what CI
   can't see.  Isolated elements may legitimately differ by a full
   truncated-tail quantum: the pipeline's hard thresholds (1e-4 exit,
   min_alpha, ALPHA_CLAMP, support box) are discrete decisions fed by
   transcendentals whose last ulp differs between the TPU VPU and host
   libm, so the gate is on error MASS (p99.9 / over-bar fraction, plus a
   60x catastrophic cap) rather than the elementwise max.
2. **compiled vs the pure-JAX backend** (fwd images, 5e-3): a
   semantics cross-check against the independent XLA compositor.  (Its
   gradients composite the sub-1e-4-transmittance tail that both the
   Pallas kernels and the reference shader cut off — fragment discard at
   test_T < 0.0001, SplatMaterial2D.js:339 — so gradient comparison
   against it is done by CI at scenes where the tail is negligible,
   not here.)

Usage:  python -m gaussiansplats3d_tpu.tools.tpu_parity
Exits nonzero (with a diff report) on divergence.  This is the round gate
the verify skill runs before committing kernel changes.
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

import gaussiansplats3d_tpu as gs


def build_scene():
    # 6k splats, some scaled way up so single splats span many tiles (aux
    # path + early exit), plus near-opaque colors for the exit threshold.
    splats = gs.random_splats(jax.random.PRNGKey(11), 6000, sh_degree=1)
    big = jax.random.uniform(jax.random.PRNGKey(12), (6000, 1)) < 0.02
    scales = jnp.where(big, splats.scales * 20.0, splats.scales)
    colors = splats.colors.at[:, 3].set(
        jnp.clip(splats.colors[:, 3] * 2.0, 0.0, 0.98))
    return dataclasses.replace(splats, scales=scales, colors=colors)


class _InterpretPallas:
    """Context manager: route pallas_call through the interpreter."""

    def __enter__(self):
        from jax.experimental import pallas as pl

        from ..render import pallas_rasterize as pr
        from ..render import pallas_surfel as ps

        self._mods = (pr, ps)
        self._orig = pl.pallas_call

        def patched(*a, **k):
            k["interpret"] = True
            return self._orig(*a, **k)

        for m in self._mods:
            m.pl.pallas_call = patched
        return self

    def __exit__(self, *exc):
        for m in self._mods:
            m.pl.pallas_call = self._orig
        return False


def _kernel_grad_fn(cfg):
    """(packed_records, starts, counts, tile_ids) -> record gradients of a
    scalar loss through ONLY the Pallas compositor — the kernel boundary."""
    if cfg.render_mode_2d:
        from ..render.pallas_surfel import composite_surfel_tiles_pallas
        comp = composite_surfel_tiles_pallas
    else:
        from ..render.pallas_rasterize import composite_tiles
        comp = composite_tiles

    def loss(rec, starts, counts, tile_ids):
        out = comp(cfg, rec.shape[1], rec, starts, counts, tile_ids)
        if cfg.render_mode_2d:
            cols, logt = out
            return jnp.mean(cols * cols) + jnp.mean(logt)
        return jnp.mean(out * out)   # chans [NC+1, T, P] incl. alpha row

    return jax.jit(jax.grad(loss))


def _build_records(cfg, splats, cam):
    """Sorted + packed pair records through the real pipeline (fwd-only
    plumbing; computed once so both parity sides see BIT-IDENTICAL
    inputs)."""
    if cfg.render_mode_2d:
        from ..render.pallas_surfel import pack_surfel_records
        from ..render.surfel import bin_sort_surfels, project_surfels

        def build(s):
            proj = project_surfels(s, cam, cfg)
            recs, starts, counts, _, _ = bin_sort_surfels(proj, cfg)
            return pack_surfel_records(recs), starts, counts

        return jax.jit(build)(splats)
    from ..render import binning
    from ..render.pallas_rasterize import pack_records_flat
    from ..render.projection import project_splats

    def build(s):
        proj = project_splats(s, cam, cfg)
        q = binning.bin_sort_records(proj, cfg)
        packed = pack_records_flat(q.xs, q.ys, q.cas, q.cbs, q.ccs,
                                   q.crs, q.cgs, q.cbs2, q.opas,
                                   q.rxs, q.rys, q.depths)
        return packed, q.tile_starts, q.tile_counts

    return jax.jit(build)(splats)


def run(cfg_kwargs, label):
    splats = build_scene()
    cam = gs.Camera.look_at((2.2, 1.4, 2.2), (0, 0, 0), fov_y_deg=60,
                            aspect=320 / 240)
    cfg_p = gs.RenderConfig(width=320, height=240, sh_degree=1,
                            backend="pallas", **cfg_kwargs)
    cfg_j = cfg_p.replace(backend="jax")

    def loss(s, cfg):
        out = gs.render(s, cam, cfg)
        l = jnp.mean(out["color"] ** 2) + jnp.mean(out["alpha"])
        if cfg.return_depth:
            l = l + 1e-3 * jnp.mean(out["depth"] ** 2)
        return l

    outs, grads = {}, {}
    outs["hw"] = jax.jit(lambda s: gs.render(s, cam, cfg_p))(splats)
    # End-to-end hardware gradients: finiteness sanity only.  Comparing
    # them against a CPU run would compare XLA:TPU vs XLA:CPU compilations
    # of the ill-conditioned PROJECTION chain (covariance eigen math on
    # the 20x-scaled test splats), whose legitimate compiler-numerics tail
    # swamps any kernel signal — CI's finite-difference tests own that
    # chain's correctness.
    grads["hw_e2e"] = jax.jit(jax.grad(lambda s: loss(s, cfg_p)))(splats)
    jax.block_until_ready(grads["hw_e2e"].means)

    # Kernel-boundary gradients: records built ONCE (on the TPU), then fed
    # bit-identically to the compiled kernel and the interpreter — any
    # field-wide divergence is a Mosaic compilation bug, full stop.
    packed, starts, counts = _build_records(cfg_p, splats, cam)
    tile_ids = jnp.arange(cfg_p.num_tiles, dtype=jnp.int32)
    kgrad = _kernel_grad_fn(cfg_p)
    grads["hw"] = kgrad(packed, starts, counts, tile_ids)
    jax.block_until_ready(grads["hw"])
    # interpret mode lowers to plain JAX ops — run it jitted on the host
    # CPU (eager interpret over the TPU tunnel would crawl)
    cpu = jax.devices("cpu")[0]
    with _InterpretPallas(), jax.default_device(cpu):
        args_c = jax.device_put((packed, starts, counts, tile_ids), cpu)
        outs["interp"] = jax.jit(
            lambda s: gs.render(s, cam, cfg_p))(
                jax.device_put(splats, cpu))
        grads["interp"] = _kernel_grad_fn(cfg_p)(*args_c)
        jax.block_until_ready(grads["interp"])
    outs["xla"] = jax.jit(lambda s: gs.render(s, cam, cfg_j))(splats)
    jax.block_until_ready(outs["xla"]["color"])

    channels = ("color", "alpha") + (
        ("depth",) if cfg_p.return_depth else ())
    failures = []

    def gate(err, bar, what):
        # Dual criterion (see _mass_gate, the single implementation):
        # every hard threshold in the pipeline (1e-4 early exit,
        # min_alpha, ALPHA_CLAMP, the support box) is a discrete decision
        # fed by transcendentals whose last ulp differs between the TPU
        # VPU and host libm — isolated elements may move by a full
        # truncated-tail quantum while the field matches to ~1e-5, so
        # gate on error MASS, never elementwise max alone.
        _mass_gate(failures, label, what, err, bar)

    # 1. compiled vs interpret: identical semantics, tight bar
    for key in channels:
        err = np.abs(np.asarray(outs["hw"][key])
                     - np.asarray(outs["interp"][key]))
        gate(err, 1e-3, f"hw-interp fwd {key}")
    a = np.asarray(grads["hw"])
    b = np.asarray(grads["interp"])
    scale = max(np.abs(b).max(), 1e-10)
    gate(np.abs(a - b) / scale, 1e-3, "hw-interp bwd records")
    for f in ("means", "scales", "quats", "colors", "sh"):
        if not np.isfinite(np.asarray(getattr(grads["hw_e2e"], f))).all():
            failures.append(f"{label}/hw-e2e/bwd/{f}: non-finite")
    # 2. compiled vs the pure-JAX backend: forward semantics cross-check
    for key in channels:
        err = np.abs(np.asarray(outs["hw"][key])
                     - np.asarray(outs["xla"][key]))
        gate(err, 5e-3, f"hw-xla fwd {key}")
    return failures


def _mass_gate(failures, label, what, err, bar):
    p999 = float(np.quantile(err, 0.999))
    frac = float((err > bar).mean())
    mx = float(err.max())
    print(f"[{label}] {what:22s} max {mx:9.3e}  p99.9 {p999:9.3e}  "
          f"frac>{bar:g} {frac:.1e}")
    if not np.isfinite(err).all():
        failures.append(f"{label}/{what}: non-finite")
    elif p999 > bar or frac > 1e-3 or mx > 60 * bar:
        failures.append(f"{label}/{what}: p99.9 {p999:.3e} frac {frac:.1e} "
                        f"max {mx:.3e}")


def run_binning_backward(precision, label):
    """Hardware-vs-CPU parity of bin_sort_records' BACKWARD alone:
    records-level cotangents in, projected-splat gradients out.

    Exercises exactly the path the kernel-boundary gate skips: the
    backward alignment sort, the bf16 cotangent pair packing, lane
    slicing, and the aux segment reduce — bypassing the ill-conditioned
    projection chain (an XLA:TPU-specific miscompile of the
    pack/unpack/sort path would otherwise only be finiteness-checked).
    Inputs are built ONCE on the TPU so both sides see identical bits;
    cotangent weights are an integer hash (no transcendentals), so the
    only legitimate divergence is f32 reassociation in the aux cumsum.
    """
    import dataclasses as dc

    from ..render import binning
    from ..render.projection import project_splats

    splats = build_scene()
    cam = gs.Camera.look_at((2.2, 1.4, 2.2), (0, 0, 0), fov_y_deg=60,
                            aspect=320 / 240)
    cfg = gs.RenderConfig(width=320, height=240, sh_degree=1,
                          record_precision=precision)
    proj = jax.jit(lambda s: project_splats(s, cam, cfg))(splats)
    jax.block_until_ready(proj.mean2d)

    diff_names = ("xs", "ys", "conic_a", "conic_b", "conic_c",
                  "col_r", "col_g", "col_b", "opacity")

    def make_loss(base):
        def loss(*flat):
            p2 = dc.replace(base, **dict(zip(diff_names, flat)))
            q = binning.bin_sort_records(p2, cfg)
            acc = jnp.float32(0.0)
            for i, f in enumerate((q.xs, q.ys, q.cas, q.cbs, q.ccs,
                                   q.crs, q.cgs, q.cbs2, q.opas)):
                h = (jnp.arange(f.shape[0], dtype=jnp.uint32)
                     * jnp.uint32(2654435761) + jnp.uint32(i * 97))
                w = ((h >> 16) & 0x3FF).astype(jnp.float32) / 512.0 - 1.0
                acc = acc + jnp.sum(f * w)
            return acc
        return loss

    argnums = tuple(range(len(diff_names)))
    args = tuple(getattr(proj, nm) for nm in diff_names)
    g_hw = jax.jit(jax.grad(make_loss(proj), argnums=argnums))(*args)
    jax.block_until_ready(g_hw[0])
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        args_c = jax.device_put(args, cpu)
        proj_c = jax.device_put(proj, cpu)
        g_cpu = jax.jit(jax.grad(make_loss(proj_c),
                                 argnums=argnums))(*args_c)
        jax.block_until_ready(g_cpu[0])

    failures = []
    for name, a, b in zip(diff_names, g_hw, g_cpu):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-10)
        _mass_gate(failures, label, f"hw-cpu binbwd {name}",
                   np.abs(a - b) / scale, 1e-3)
    return failures


def run_at_scale(label="at-scale"):
    """Kernel-boundary fwd+bwd parity at ~2M pairs: the aliased RMW
    gradient DMA pipeline and early-exit bookkeeping at real chunk counts
    (the 6k-splat cases only reach a few hundred chunks)."""
    n = 1_000_000
    splats = gs.random_splats(jax.random.PRNGKey(21), n, sh_degree=0)
    splats = dataclasses.replace(
        splats,
        scales=splats.scales * 2.0,
        colors=splats.colors.at[:, 3].set(
            jnp.clip(splats.colors[:, 3] * 1.5, 0.0, 0.95)))
    cam = gs.Camera.look_at((2.2, 1.4, 2.2), (0, 0, 0), fov_y_deg=60,
                            aspect=512 / 384)
    cfg = gs.RenderConfig(width=512, height=384, sh_degree=0,
                          backend="pallas")
    packed, starts, counts = _build_records(cfg, splats, cam)
    n_pairs = int(np.asarray(counts).sum())
    print(f"[{label}] pairs={n_pairs}")
    tile_ids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)

    from ..render.pallas_rasterize import composite_tiles
    fwd = jax.jit(lambda r, s, c, t: composite_tiles(
        cfg, r.shape[1], r, s, c, t))
    out_hw = fwd(packed, starts, counts, tile_ids)
    kgrad = _kernel_grad_fn(cfg)
    g_hw = kgrad(packed, starts, counts, tile_ids)
    jax.block_until_ready(g_hw)

    cpu = jax.devices("cpu")[0]
    with _InterpretPallas(), jax.default_device(cpu):
        args_c = jax.device_put((packed, starts, counts, tile_ids), cpu)
        out_in = jax.jit(lambda r, s, c, t: composite_tiles(
            cfg, r.shape[1], r, s, c, t))(*args_c)
        g_in = _kernel_grad_fn(cfg)(*args_c)
        jax.block_until_ready(g_in)

    failures = []
    _mass_gate(failures, label, "hw-interp fwd chans",
               np.abs(np.asarray(out_hw) - np.asarray(out_in)), 1e-3)
    a, b = np.asarray(g_hw), np.asarray(g_in)
    scale = max(np.abs(b).max(), 1e-10)
    _mass_gate(failures, label, "hw-interp bwd records",
               np.abs(a - b) / scale, 1e-3)
    return failures


def main():
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        print(f"ERROR: default device is {platform!r}, not a TPU — this "
              "gate must run on hardware (CI covers interpret mode).")
        return 2
    failures = run({}, "rgb")
    failures += run({"return_depth": True}, "rgb+depth")
    # packed record precision: the u16/f16 sort-operand packing must decode
    # identically through Mosaic and the interpreter (bitcast/shift chains
    # are exactly where compilation bugs would bite).
    failures += run({"record_precision": "packed"}, "rgb+packed")
    # 2DGS surfel kernel (pallas_surfel): ray-plane fragment + hand-derived
    # transpose, with and without the 4-wide depth-channel layout.
    failures += run({"render_mode_2d": True}, "2d")
    failures += run({"render_mode_2d": True, "return_depth": True},
                    "2d+depth")
    # binning backward alone, hw vs CPU (alignment sort + bf16 cotangent
    # packing + aux segment reduce) for each cotangent-packing mode
    failures += run_binning_backward("mixed", "binbwd-mixed")
    failures += run_binning_backward("f32", "binbwd-f32")
    # ~2M-pair kernel-boundary case: the RMW gradient pipeline at scale
    failures += run_at_scale()
    if failures:
        print("PARITY FAILURES:\n  " + "\n  ".join(failures))
        return 1
    print("TPU kernel parity: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
