"""On-chip Pallas compositor for 2DGS surfels.

Same kernel architecture as `pallas_rasterize` (one grid step per tile,
double-buffered chunk DMA, product-space forward transmittance with a
log-space backward replay, early exit, exact reverse replay with aliased
read-modify-write gradient accumulation) with
the 3D Gaussian fragment swapped for the reference's 2D ray-plane
intersection (/root/reference/src/splatmesh/SplatMaterial2D.js:289-344):

    k = px * Tw - Tu,  l = py * Tw - Tv,  p = k x l
    (su, sv) = (p.x / p.z, p.y / p.z)
    rho = min(|s|^2, 2 |pix - center|^2);  depth >= 0.2
    alpha = min(0.99, opacity * exp(-rho / 2))

Everything is pixels-on-sublanes x splats-on-lanes ([P, C] blocks); the
fragment chain and its hand-derived transpose are pure VPU elementwise ops
plus [1, C] row reductions — no MXU except the color accumulation.

Record packing — field-major [24, capacity] f32 (each [24, C] chunk window
is three (8, 128) register tiles, DMA'd at 128-aligned minor offsets):

    row  0-8      T row-major (t00 t01 t02 | t10 ... t22); Tu/Tv/Tw are the
                  COLUMNS: Tu = (r0, r3, r6), Tv = (r1, r4, r7), Tw = (r2, r5, r8)
    row  9-10     center2d (x, y)
    row 11:11+NC  channels (rgb, or rgb + per-splat depth with
                  cfg.return_depth — the same 4th-channel re-design as
                  pallas_rasterize)
    row 11+NC     opacity (0 on invalid slots)
    row 12+NC..   support-box radius (rx, ry) — hard cutoff, no gradient
    rest          padding (zeros)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import RenderConfig
from .pallas_rasterize import (
    CHUNK,
    _CS_FLOOR,
    _DMA_DEPTH,
    _FWD_TRI_PASSES,
    _mm,
    _mm_nt,
    _mm_tn,
    _mm_tri,
    _pixel_coords,
    _window_mask,
)

SURFEL_RECORD_WIDTH = 24
_ALPHA_MAX = 0.99
_NEAR_N = 0.2
# reference saturation cutoff: test_T < 0.0001 (SplatMaterial2D.js:339)
_EXIT_T = 1e-4


def pack_surfel_records(recs: jnp.ndarray) -> jnp.ndarray:
    """[cap, 17 or 18] record table (rasterize_surfel layout)
    -> field-major [24, cap] (the kernel DMAs [24, C] chunk windows)."""
    cap = recs.shape[0]
    assert cap % CHUNK == 0, cap
    rec = recs.T                                      # [17, cap]
    return jnp.concatenate(
        [rec, jnp.zeros((SURFEL_RECORD_WIDTH - rec.shape[0], cap),
                        jnp.float32)], axis=0)


def _surfel_chunk_alpha(rec, px, py, window, min_alpha, nc=3):
    """Fragment forward for one chunk: rec [24, C] -> alpha [P, C] plus the
    intermediates the backward chain reuses.  ``nc``: channel-row count
    (3, or 4 with a depth channel) — opacity/radius sit right after."""
    tu0, tv0, tw0 = rec[0:1, :], rec[1:2, :], rec[2:3, :]
    tu1, tv1, tw1 = rec[3:4, :], rec[4:5, :], rec[5:6, :]
    tu2, tv2, tw2 = rec[6:7, :], rec[7:8, :], rec[8:9, :]
    cx, cy = rec[9:10, :], rec[10:11, :]
    opa = jnp.where(window, rec[11 + nc:12 + nc, :], 0.0)
    rx, ry = rec[12 + nc:13 + nc, :], rec[13 + nc:14 + nc, :]

    k0 = px * tw0 - tu0                                # [P, C]
    k1 = px * tw1 - tu1
    k2 = px * tw2 - tu2
    l0 = py * tw0 - tv0
    l1 = py * tw1 - tv1
    l2 = py * tw2 - tv2
    p0 = k1 * l2 - k2 * l1
    p1 = k2 * l0 - k0 * l2
    p2 = k0 * l1 - k1 * l0
    tiny = jnp.abs(p2) < 1e-12
    sp2 = jnp.where(tiny, 1e-12, p2)
    su = p0 / sp2
    sv = p1 / sp2
    rho3d = su * su + sv * sv
    dx = px - cx
    dy = py - cy
    rho2d = 2.0 * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.where(use3d, rho3d, rho2d)
    depth = jnp.where(use3d, su * tw0 + sv * tw1 + tw2, tw2)
    ea = jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(opa * ea, _ALPHA_MAX)
    bad = (tiny | (depth < _NEAR_N) | (alpha < min_alpha)
           | (jnp.abs(dx) > rx) | (jnp.abs(dy) > ry))
    alpha = jnp.where(bad, 0.0, alpha)
    return (alpha, ea, su, sv, sp2, k0, k1, k2, l0, l1, l2, dx, dy, use3d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def composite_surfel_tiles_pallas(cfg: RenderConfig, capacity: int,
                                  records, tile_starts, tile_counts,
                                  tile_ids
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas surfel compositor.

    records: [24, capacity] field-major (pack_surfel_records).
    Returns (tile_colors [T, P, NC], tile_logtrans [T, P]) — NC is 3, or 4
    with cfg.return_depth (channel 3 = alpha-weighted depth sum).
    """
    out, _ = _fwd(cfg, capacity, records, tile_starts, tile_counts,
                  tile_ids)
    return out


def _fwd(cfg, capacity, records, tile_starts, tile_counts, tile_ids):
    t = tile_starts.shape[0]
    p = cfg.tile_size * cfg.tile_size
    nc = 4 if cfg.return_depth else 3

    def kernel(starts_ref, counts_ref, ids_ref, rec_hbm,
               colors_out, logt_out, exit_k_out, chunk_vmem, sem):
        i = pl.program_id(0)
        start = starts_ref[i]
        start_chunk = start // CHUNK
        count = counts_ref[i]
        px, py = _pixel_coords(ids_ref[i], cfg)
        num_chunks = pl.cdiv(start % CHUNK + count, CHUNK)

        def dma_for(k):
            slot = jax.lax.rem(k, _DMA_DEPTH)
            return pltpu.make_async_copy(
                rec_hbm.at[:, pl.ds((start_chunk + k) * CHUNK, CHUNK)],
                chunk_vmem.at[slot], sem.at[slot])

        # _DMA_DEPTH-deep chunk-read pipeline (see pallas_rasterize:
        # the [W, C] strided read is latency-bound, not bandwidth-bound)
        for j in range(_DMA_DEPTH - 1):
            @pl.when(j < num_chunks)
            def _(j=j):
                dma_for(jnp.int32(j)).start()

        def body(state):
            k, col, t, lt = state
            @pl.when(k + _DMA_DEPTH - 1 < num_chunks)
            def _():
                dma_for(k + _DMA_DEPTH - 1).start()
            dma_for(k).wait()
            rec = chunk_vmem[jax.lax.rem(k, _DMA_DEPTH)]
            window = _window_mask((start_chunk + k) * CHUNK, start, count)
            alpha = _surfel_chunk_alpha(rec, px, py, window,
                                        cfg.min_alpha, nc)[0]
            # log-space MXU prefix (2 bf16 limbs — pallas_rasterize
            # _FWD_TRI_PASSES: measured ~24% faster than the roll-multiply
            # product scan in the 3D kernel's ablation, same error bound)
            logw = jnp.log1p(-alpha)
            excl_log = _mm_tri(logw, True, _FWD_TRI_PASSES)
            w = alpha * (jnp.exp(excl_log) * t)
            # passes=6: tiny output — see the matching forward note in
            # pallas_rasterize._composite_fwd
            col = col + _mm_nt(w, rec[11:11 + nc, :], passes=6)
            csum = excl_log[:, CHUNK - 1:CHUNK] + logw[:, CHUNK - 1:CHUNK]
            t = t * jnp.exp(csum)
            # per-chunk clamped log T accumulation (pallas_rasterize
            # _CS_FLOOR note: keeps the backward replay bounded/exact)
            lt = lt + jnp.maximum(csum, _CS_FLOOR)
            return k + 1, col, t, lt

        def cond(state):
            k, _, t, _ = state
            return (k < num_chunks) & (jnp.max(t) > _EXIT_T)

        k_end, col, t, lt = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((p, nc), jnp.float32),
             jnp.ones((p, 1), jnp.float32),
             jnp.zeros((p, 1), jnp.float32)))
        for j in range(_DMA_DEPTH - 1):
            @pl.when(k_end + j < num_chunks)
            def _(j=j):
                dma_for(k_end + j).wait()
        colors_out[0] = col
        logt_out[0] = lt
        exit_k_out[i] = k_end

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
            pltpu.VMEM((_DMA_DEPTH, SURFEL_RECORD_WIDTH, CHUNK),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((_DMA_DEPTH,)),
        ],
    )

    colors, logt3, exit_k = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, p, nc), jnp.float32),
            jax.ShapeDtypeStruct((t, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((t,), jnp.int32),
        ],
    )(tile_starts, tile_counts, tile_ids, records)
    logt = logt3[:, :, 0]
    residuals = (records, tile_starts, tile_counts, tile_ids, logt, exit_k)
    return (colors, logt), residuals


def _bwd(cfg, capacity, residuals, cotangents):
    records, tile_starts, tile_counts, tile_ids, logt_fin, exit_k = residuals
    gcol, glogt = cotangents
    t = tile_starts.shape[0]
    p = cfg.tile_size * cfg.tile_size
    nc = 4 if cfg.return_depth else 3

    def kernel(starts_ref, counts_ref, ids_ref, exit_k_ref,
               rec_hbm, logt_blk, gcol_blk, glogt_blk, grad_in_hbm,
               grad_hbm, chunk_vmem, gin_vmem, gout_vmem, sem, gsem, wsem):
        del grad_in_hbm
        i = pl.program_id(0)
        start = starts_ref[i]
        start_chunk = start // CHUNK
        count = counts_ref[i]
        px, py = _pixel_coords(ids_ref[i], cfg)
        num_chunks = pl.cdiv(start % CHUNK + count, CHUNK)
        k_exit = exit_k_ref[i]

        logt_fin_t = logt_blk[0]
        gcol_t = gcol_blk[0]
        glogt_t = glogt_blk[0]

        def dma_for(k):
            slot = jax.lax.rem(k, _DMA_DEPTH)
            return pltpu.make_async_copy(
                rec_hbm.at[:, pl.ds((start_chunk + k) * CHUNK, CHUNK)],
                chunk_vmem.at[slot], sem.at[slot])

        def grad_read_for(k):
            slot = jax.lax.rem(k, 2)
            return pltpu.make_async_copy(
                grad_hbm.at[:, pl.ds((start_chunk + k) * CHUNK, CHUNK)],
                gin_vmem.at[slot], gsem.at[slot])

        def grad_write_for(k):
            slot = jax.lax.rem(k, 2)
            return pltpu.make_async_copy(
                gout_vmem.at[slot],
                grad_hbm.at[:, pl.ds((start_chunk + k) * CHUNK, CHUNK)],
                wsem.at[slot])

        # Boundary-only RMW reads (see pallas_rasterize: only a tile's
        # first/last chunks can be shared with a neighboring tile).
        def is_boundary(j):
            return (j == 0) | (j == num_chunks - 1)

        @pl.when(k_exit > 0)
        def _():
            # _DMA_DEPTH-deep descending record reads (pallas_rasterize)
            for j in range(_DMA_DEPTH - 1):
                @pl.when(k_exit - 1 - j >= 0)
                def _(j=j):
                    dma_for(k_exit - 1 - j).start()
            @pl.when(is_boundary(k_exit - 1))
            def _():
                grad_read_for(k_exit - 1).start()

        def body(state):
            k, logt_after, sg = state
            k = k - 1
            @pl.when(k - (_DMA_DEPTH - 1) >= 0)
            def _():
                dma_for(k - (_DMA_DEPTH - 1)).start()
            @pl.when(k > 0)
            def _():
                @pl.when(k + 1 < k_exit)
                def _():
                    grad_write_for(k + 1).wait()
                @pl.when(is_boundary(k - 1))
                def _():
                    grad_read_for(k - 1).start()
            dma_for(k).wait()
            rec = chunk_vmem[jax.lax.rem(k, _DMA_DEPTH)]
            window = _window_mask((start_chunk + k) * CHUNK, start, count)
            (alpha, ea, su, sv, sp2, k0, k1, k2, l0, l1, l2, dx, dy,
             use3d) = _surfel_chunk_alpha(rec, px, py, window,
                                          cfg.min_alpha, nc)
            logw = jnp.log1p(-alpha)
            # exclusive prefix sum on the MXU (see _composite_bwd)
            excl = _mm_tri(logw, True)
            chunk_sum = jnp.maximum(
                excl[:, CHUNK - 1:CHUNK] + logw[:, CHUNK - 1:CHUNK],
                _CS_FLOOR)
            logt_before = logt_after - chunk_sum
            t_i = jnp.exp(excl + logt_before)
            w = alpha * t_i

            cg = _mm(gcol_t, rec[11:11 + nc, :])        # [P, C]
            d_chan = _mm_tn(gcol_t, w)                  # [NC, C]
            u = w * cg
            # exclusive suffix sum on the MXU (see pallas_rasterize._composite_bwd)
            suffix = _mm_tri(u, False) + sg

            one_minus = jnp.maximum(1.0 - alpha, 1e-6)
            d_alpha = t_i * cg - suffix / one_minus - glogt_t / one_minus
            gate = (alpha > 0.0) & (alpha < _ALPHA_MAX)
            d_alpha = jnp.where(gate, d_alpha, 0.0)

            # --- fragment transpose (hand-derived) -------------------
            opa = rec[11 + nc:12 + nc, :]
            d_opa_frag = d_alpha * ea                  # alpha = opa * ea
            d_rho = d_alpha * opa * ea * (-0.5)
            d_rho3 = jnp.where(use3d, d_rho, 0.0)
            d_rho2 = jnp.where(use3d, 0.0, d_rho)
            # rho2d = 2 (dx^2 + dy^2); dx = px - cx
            d_dx = 4.0 * dx * d_rho2
            d_dy = 4.0 * dy * d_rho2
            # rho3d = su^2 + sv^2; su = p0/sp2, sv = p1/sp2
            d_su = 2.0 * su * d_rho3
            d_sv = 2.0 * sv * d_rho3
            inv_p2 = 1.0 / sp2
            d_p0 = d_su * inv_p2
            d_p1 = d_sv * inv_p2
            d_p2 = -(su * d_su + sv * d_sv) * inv_p2
            # p = k x l
            d_k0 = l1 * d_p2 - l2 * d_p1
            d_k1 = l2 * d_p0 - l0 * d_p2
            d_k2 = l0 * d_p1 - l1 * d_p0
            d_l0 = k2 * d_p1 - k1 * d_p2
            d_l1 = k0 * d_p2 - k2 * d_p0
            d_l2 = k1 * d_p0 - k0 * d_p1
            # k_i = px Tw_i - Tu_i ; l_i = py Tw_i - Tv_i
            maskc = window.astype(jnp.float32)          # [1, C]

            ones_p = jnp.ones((1, p), jnp.float32)

            def rowsum(x):
                # pixel reduction on the MXU (see pallas_rasterize)
                return _mm(ones_p, x)

            rows = [
                -rowsum(d_k0) * maskc,                          # t00 (Tu0)
                -rowsum(d_l0) * maskc,                          # t01 (Tv0)
                rowsum(px * d_k0 + py * d_l0) * maskc,          # t02 (Tw0)
                -rowsum(d_k1) * maskc,                          # t10
                -rowsum(d_l1) * maskc,                          # t11
                rowsum(px * d_k1 + py * d_l1) * maskc,          # t12
                -rowsum(d_k2) * maskc,                          # t20
                -rowsum(d_l2) * maskc,                          # t21
                rowsum(px * d_k2 + py * d_l2) * maskc,          # t22
                -rowsum(d_dx) * maskc,                          # cx
                -rowsum(d_dy) * maskc,                          # cy
            ]
            gr = jnp.concatenate(
                rows + [d_chan * maskc, rowsum(d_opa_frag) * maskc,
                        jnp.zeros((SURFEL_RECORD_WIDTH - 12 - nc, CHUNK),
                                  jnp.float32)], axis=0)        # [24, C]

            slot = jax.lax.rem(k, 2)
            @pl.when(is_boundary(k))
            def _():
                grad_read_for(k).wait()
                gout_vmem[slot] = gin_vmem[slot] + gr
            @pl.when(~is_boundary(k))
            def _():
                gout_vmem[slot] = gr
            grad_write_for(k).start()

            sg = sg + jnp.sum(u, axis=1, keepdims=True)
            return k, logt_before, sg

        def cond(state):
            return state[0] > 0

        init = (k_exit, logt_fin_t, jnp.zeros((p, 1), jnp.float32))
        jax.lax.while_loop(cond, body, init)
        @pl.when(k_exit > 0)
        def _():
            grad_write_for(0).wait()
        @pl.when(k_exit > 1)
        def _():
            grad_write_for(1).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, nc), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_DMA_DEPTH, SURFEL_RECORD_WIDTH, CHUNK),
                       jnp.float32),
            pltpu.VMEM((2, SURFEL_RECORD_WIDTH, CHUNK), jnp.float32),
            pltpu.VMEM((2, SURFEL_RECORD_WIDTH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((_DMA_DEPTH,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    grad_init = jnp.zeros(records.shape, jnp.float32)
    grad_records = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(records.shape, jnp.float32),
        input_output_aliases={8: 0},
        # The 24-row surfel gradient body peaks just past Mosaic's default
        # 16 MB scoped-vmem budget on hardware (v5e VMEM is 128 MB; the
        # forward fits).  Interpret-mode CI cannot see this — the on-TPU
        # parity gate (tools/tpu_parity.py) is what catches it.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024),
    )(tile_starts, tile_counts, tile_ids, exit_k,
      records, logt_fin[:, :, None], gcol, glogt[:, :, None], grad_init)
    return grad_records, None, None, None


composite_surfel_tiles_pallas.defvjp(_fwd, _bwd)
