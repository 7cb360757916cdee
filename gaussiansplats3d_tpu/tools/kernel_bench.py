"""Ablation microbench for the Pallas tile compositor.

Builds the real bench workload (random scene -> projection -> fused
expand+sort) and times kernel VARIANTS that each remove one piece of the
forward compositor — early-exit max, the transmittance scan, the fragment
math, the color matmul — isolating what the kernel is actually bound by.
Perf-probe variants compute wrong colors on purpose; only timings matter.

    python -m gaussiansplats3d_tpu.tools.kernel_bench [N] [--tile 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(out):
    """1-element host readback per leaf — see profile_stages._sync (the
    axon tunnel's block_until_ready can return before remote completion)."""
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


def build_variant(cfg, variant: str):
    """A composite_tiles forward clone with one piece ablated."""
    from gaussiansplats3d_tpu.render.pallas_rasterize import (
        CHUNK, RECORD_WIDTH, _T_FLOOR, _chunk_alpha_block,
        _excl_prefix_prod_lanes, _mm_nt, _pixel_coords, _window_mask)

    p = cfg.tile_size * cfg.tile_size
    nc = 3

    def kernel(starts_ref, counts_ref, ids_ref, rec_hbm,
               colors_out, logt_out, exit_k_out, chunk_vmem, sem):
        i = pl.program_id(0)
        start = starts_ref[i]
        start_chunk = start // CHUNK
        count = counts_ref[i]
        px, py = _pixel_coords(ids_ref[i], cfg)
        num_chunks = pl.cdiv(start % CHUNK + count, CHUNK)

        if variant == "grid_only":
            # no DMA, no loop: isolates the per-grid-step (per-tile)
            # dispatch/prologue/output cost from the chunk work
            colors_out[0] = jnp.zeros((p, nc), jnp.float32)
            logt_out[0] = jnp.zeros((p, 1), jnp.float32)
            exit_k_out[i] = num_chunks
            return

        def dma_for(k):
            slot = jax.lax.rem(k, 2)
            return pltpu.make_async_copy(
                rec_hbm.at[:, pl.ds((start_chunk + k) * CHUNK, CHUNK)],
                chunk_vmem.at[slot], sem.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            dma_for(jnp.int32(0)).start()

        def body(state):
            k, col, t = state
            @pl.when(k + 1 < num_chunks)
            def _():
                dma_for(k + 1).start()
            dma_for(k).wait()
            rec = chunk_vmem[jax.lax.rem(k, 2)]
            window = _window_mask((start_chunk + k) * CHUNK, start, count)
            if variant == "dma_only":
                col = col + rec[0, 0]
                return k + 1, col, t
            alpha, _, _, _ = _chunk_alpha_block(rec, px, py, window,
                                                cfg.min_alpha, nc)
            if variant == "no_scan":
                w = alpha * t
            elif variant.startswith("mxu_scan"):
                # log-space prefix on the MXU via the bf16 limb split
                # (Mosaic has no Precision.HIGH lowering; _mm_tri splits
                # the data operand into bf16 limbs).  Pass the limb count
                # LOCALLY — mutating the module global would silently
                # degrade the production backward scan for the rest of
                # the process.
                from gaussiansplats3d_tpu.render import pallas_rasterize
                logw = jnp.log1p(-alpha)
                excl_log = pallas_rasterize._mm_tri(
                    logw, True, int(variant[-1]))
                w = alpha * (jnp.exp(excl_log) * t)
                csum = excl_log[:, CHUNK - 1:CHUNK] + logw[:, CHUNK - 1:CHUNK]
                t = jnp.maximum(t * jnp.exp(csum), _T_FLOOR)
            else:
                excl, cprod = _excl_prefix_prod_lanes(1.0 - alpha)
                w = alpha * (excl * t)
                t = jnp.maximum(t * cprod, _T_FLOOR)
            if variant == "no_matmul":
                col = col + w[:, 0:nc]
            else:
                col = col + _mm_nt(w, rec[5:5 + nc, :])
            return k + 1, col, t

        if variant == "no_exit":
            def cond(state):
                return state[0] < num_chunks
        elif variant == "exit_every4":
            def cond(state):
                k, _, t = state
                coarse = jnp.where(jax.lax.rem(k, 4) == 0,
                                   jnp.max(t), jnp.float32(1.0))
                return (k < num_chunks) & (coarse > 1e-4)
        else:
            def cond(state):
                k, _, t = state
                return (k < num_chunks) & (jnp.max(t) > 1e-4)

        k_end, col, t = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((p, nc), jnp.float32),
             jnp.ones((p, 1), jnp.float32)))
        @pl.when(k_end < num_chunks)
        def _():
            dma_for(k_end).wait()
        colors_out[0] = col
        logt_out[0] = t
        exit_k_out[i] = k_end

    def run(records, tile_starts, tile_counts, tile_ids):
        t = tile_starts.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, p, nc), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, RECORD_WIDTH, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((t, p, nc), jnp.float32),
                jax.ShapeDtypeStruct((t, p, 1), jnp.float32),
                jax.ShapeDtypeStruct((t,), jnp.int32),
            ],
        )(tile_starts, tile_counts, tile_ids, records)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=float, default=2_000_000)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--sh", type=int, default=1)
    args = ap.parse_args()
    n = int(args.n)

    import gaussiansplats3d_tpu as gs
    from gaussiansplats3d_tpu.render import binning
    from gaussiansplats3d_tpu.render.pallas_rasterize import pack_records_flat
    from gaussiansplats3d_tpu.render.projection import project_splats

    cfg = gs.RenderConfig(width=1920, height=1080, sh_degree=args.sh,
                          tile_size=args.tile)
    splats = gs.random_splats(jax.random.PRNGKey(0), n, sh_degree=args.sh,
                              extent=2.0)
    splats = dataclasses.replace(splats, scales=splats.scales * 0.15)
    cam = gs.Camera.look_at((4.5, 2.5, 4.5), (0.0, 0.0, 0.0),
                            fov_y_deg=60.0, aspect=1920 / 1080)
    proj = jax.jit(lambda s: project_splats(s, cam, cfg))(splats)
    pairs = jax.jit(lambda p: binning.bin_sort_records(p, cfg))(proj)
    records = jax.jit(lambda q: pack_records_flat(
        q.xs, q.ys, q.cas, q.cbs, q.ccs, q.crs, q.cgs, q.cbs2, q.opas,
        q.rxs, q.rys))(pairs)
    records = jax.block_until_ready(records)
    tile_ids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    print(f"N={n} tile={args.tile} pairs={int(pairs.total_pairs)} "
          f"S={pairs.capacity} tiles={cfg.num_tiles}", flush=True)

    for variant in ("full", "mxu_scan_2", "mxu_scan_3",
                    "exit_every4", "no_exit", "no_scan",
                    "no_matmul", "dma_only", "grid_only"):
        fn = jax.jit(build_variant(cfg, variant))
        ms = _timeit(fn, records, pairs.tile_starts, pairs.tile_counts,
                     tile_ids)
        out = fn(records, pairs.tile_starts, pairs.tile_counts, tile_ids)
        mean_exit = float(jnp.mean(out[2]))
        print(f"  {variant:12s} {ms:8.1f} ms   (mean exit_k {mean_exit:.1f})",
              flush=True)

    # --- isolated REAL kernels: fwd via _composite_fwd, bwd via
    # _composite_bwd on the fwd's residuals (the production custom-vjp
    # pair, no surrounding pipeline), at 2/3/6 backward tri-matmul limbs
    from gaussiansplats3d_tpu.render import pallas_rasterize as prmod

    orig_tri, orig_mm = prmod._TRI_PASSES, prmod._MM_PASSES
    try:
        residuals = None
        for mm in (3, 6):
            prmod._MM_PASSES = mm
            fwd_fn = jax.jit(lambda r, s, c, t: prmod._composite_fwd(
                cfg, r.shape[1], r, s, c, t))
            chans, res = fwd_fn(records, pairs.tile_starts,
                                pairs.tile_counts, tile_ids)
            if residuals is None:
                residuals = res      # mm only changes the color matmul
                gchans = jnp.ones_like(chans) * 0.1
            ms = _timeit(lambda *a: fwd_fn(*a)[0], records,
                         pairs.tile_starts, pairs.tile_counts, tile_ids)
            print(f"  REAL fwd mm={mm}  {ms:8.1f} ms", flush=True)
            for tri in (2, 3, 6):
                prmod._TRI_PASSES = tri
                bwd_fn = jax.jit(lambda res, g: prmod._composite_bwd(
                    cfg, records.shape[1], res, g)[0])
                ms = _timeit(bwd_fn, residuals, gchans)
                print(f"  REAL bwd mm={mm} tri={tri} {ms:6.1f} ms",
                      flush=True)
    finally:
        prmod._TRI_PASSES = orig_tri
        prmod._MM_PASSES = orig_mm


if __name__ == "__main__":
    main()
