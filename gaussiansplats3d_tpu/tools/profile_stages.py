"""Per-stage wall-clock profile of the tiled render pipeline.

Times each pipeline stage in isolation (its inputs precomputed on device)
plus the fused forward and forward+backward, so the gap between the stage
sum and the end-to-end number — XLA's inter-stage fusion/layout overhead —
is visible.  This is the framework's equivalent of the reference's
per-sort timing instrumentation (/root/reference/src/worker/SortWorker.js:
33,76-78 and the info panel, Viewer.js:1804-1822), extended to the
backward pass the reference doesn't have.

Usage:
    python -m gaussiansplats3d_tpu.tools.profile_stages [N] [options]
    --sh D           SH degree (default 1)
    --precision P    record_precision (default mixed)
    --fwd-only       skip the backward stages
    --scale S        splat scale multiplier (default 0.15, bench-like)
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp


def _sync(out):
    """Force completion with a 1-element host readback from EVERY leaf:
    over the axon tunnel, block_until_ready has been observed returning
    before remote execution finishes (a 60 ms sort "measured" at 0.1 ms);
    a device->host fetch cannot lie."""
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(leaf[(0,) * getattr(leaf, "ndim", 0)]))


def _timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=float, default=2_000_000)
    ap.add_argument("--sh", type=int, default=1)
    ap.add_argument("--precision", default="mixed")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--scale", type=float, default=0.15)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--lanes", type=int, default=2)
    ap.add_argument("--aux", type=float, default=0.25)
    ap.add_argument("--tile", type=int, default=32)
    args = ap.parse_args()
    n = int(args.n)

    import gaussiansplats3d_tpu as gs
    from gaussiansplats3d_tpu.render import binning
    from gaussiansplats3d_tpu.render.pipeline import (
        assemble_image, composite_sorted, render)
    from gaussiansplats3d_tpu.render.projection import project_splats

    cfg = gs.RenderConfig(width=args.width, height=args.height,
                          sh_degree=args.sh, sort_bits=16,
                          record_precision=args.precision,
                          lanes=args.lanes, aux_multiplier=args.aux,
                          tile_size=args.tile)
    splats = gs.random_splats(jax.random.PRNGKey(0), n, sh_degree=args.sh,
                              extent=2.0)
    splats = dataclasses.replace(splats, scales=splats.scales * args.scale)
    cam = gs.Camera.look_at((4.5, 2.5, 4.5), (0.0, 0.0, 0.0),
                            fov_y_deg=60.0, aspect=args.width / args.height)

    print(f"N={n} SH{args.sh} {args.width}x{args.height} "
          f"precision={args.precision} lanes={cfg.lanes} "
          f"aux={cfg.aux_multiplier} tile={cfg.tile_size}", flush=True)

    # --- forward stages ---------------------------------------------------
    proj_fn = jax.jit(lambda s: project_splats(s, cam, cfg))
    proj = proj_fn(splats)
    t_proj = _timeit(proj_fn, splats)
    print(f"  project fwd          {t_proj:8.1f} ms", flush=True)

    sort_fn = jax.jit(lambda p: binning.bin_sort_records(p, cfg))
    pairs = sort_fn(proj)
    t_sort = _timeit(sort_fn, proj)
    s_cap = pairs.capacity
    print(f"  bin_sort_records fwd {t_sort:8.1f} ms   (S={s_cap}, "
          f"pairs={int(pairs.total_pairs)}, overflow={int(pairs.overflow)})",
          flush=True)

    comp_fn = jax.jit(
        lambda p: composite_sorted(cfg, p, 0, cfg.num_tiles))
    tiles = comp_fn(pairs)
    t_comp = _timeit(comp_fn, pairs)
    print(f"  composite fwd        {t_comp:8.1f} ms", flush=True)

    asm_fn = jax.jit(lambda ch: assemble_image(ch, cfg))
    t_asm = _timeit(asm_fn, tiles)
    print(f"  assemble             {t_asm:8.1f} ms", flush=True)

    fwd_fn = jax.jit(lambda s: render(s, cam, cfg)["color"])
    t_fwd = _timeit(fwd_fn, splats)
    stage_sum = t_proj + t_sort + t_comp + t_asm
    print(f"  FWD total            {t_fwd:8.1f} ms   (stage sum "
          f"{stage_sum:.1f}, gap {t_fwd - stage_sum:+.1f})", flush=True)

    if args.fwd_only:
        return

    # --- backward stages ----------------------------------------------------
    # compositor bwd alone (vjp w.r.t. the record fields).
    def comp_loss(p):
        ch = composite_sorted(cfg, p, 0, cfg.num_tiles)
        return jnp.sum(ch * ch)

    comp_grad = jax.jit(jax.grad(comp_loss, allow_int=True))
    t_comp_bwd = _timeit(comp_grad, pairs) - t_comp
    print(f"  composite bwd        {t_comp_bwd:8.1f} ms   (grad - fwd)",
          flush=True)

    # the backward alignment sort alone (permutation key + n_diff cotangents)
    n_diff = 9 + (1 if cfg.return_depth else 0)
    perm = jax.random.permutation(jax.random.PRNGKey(1),
                                  jnp.arange(s_cap, dtype=jnp.int32))
    gfields = [jnp.ones((s_cap,), jnp.float32) for _ in range(n_diff)]

    def align(perm, *gs_):
        ops = jax.lax.sort(
            (perm,) + tuple(jax.lax.bitcast_convert_type(g, jnp.int32)
                            for g in gs_),
            dimension=0, num_keys=1, is_stable=True)
        return [jax.lax.bitcast_convert_type(g, jnp.float32)
                for g in ops[1:]]

    align_fn = jax.jit(align)
    t_align = _timeit(align_fn, perm, *gfields)
    print(f"  bwd alignment sort   {t_align:8.1f} ms   "
          f"({n_diff} f32 operands @ S={s_cap})", flush=True)

    # binning bwd total (alignment sort + lane slicing + aux segment reduce)
    def sort_loss(p):
        pr = binning.bin_sort_records(p, cfg)
        return (jnp.sum(pr.xs) + jnp.sum(pr.ys) + jnp.sum(pr.cas)
                + jnp.sum(pr.cbs) + jnp.sum(pr.ccs) + jnp.sum(pr.crs)
                + jnp.sum(pr.cgs) + jnp.sum(pr.cbs2) + jnp.sum(pr.opas))

    sort_grad = jax.jit(jax.grad(sort_loss, allow_int=True))
    t_sort_bwd = _timeit(sort_grad, proj) - t_sort
    print(f"  bin_sort bwd         {t_sort_bwd:8.1f} ms   (grad - fwd)",
          flush=True)

    # projection bwd
    def proj_loss(s):
        p = project_splats(s, cam, cfg)
        return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.color)
                + jnp.sum(p.opacity))

    proj_grad = jax.jit(jax.grad(proj_loss))
    t_proj_bwd = _timeit(proj_grad, splats) - t_proj
    print(f"  project bwd          {t_proj_bwd:8.1f} ms   (grad - fwd)",
          flush=True)

    def loss_fn(s):
        img = render(s, cam, cfg)["color"]
        return jnp.mean(img * img)

    grad_fn = jax.jit(jax.grad(loss_fn))
    t_grad = _timeit(grad_fn, splats)
    bwd_sum = (t_fwd + t_comp_bwd + t_sort_bwd + t_proj_bwd)
    print(f"  FWD+BWD total        {t_grad:8.1f} ms   (stage sum "
          f"{bwd_sum:.1f}, gap {t_grad - bwd_sum:+.1f})", flush=True)
    print(f"  => {n / t_grad / 1e3:.2f} Msplats/s fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
