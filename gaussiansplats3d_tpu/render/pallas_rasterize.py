"""On-chip Pallas compositor: the hot kernel of the framework.

Replaces the pure-JAX `rasterize.rasterize_pairs` scan on TPU.  One grid
step = one image tile; the kernel walks the tile's depth-sorted pair list in
chunks of C=128 splats, DMA-ing packed records from HBM into VMEM and
compositing front-to-back entirely on-chip.

Everything is laid out **pixels-on-sublanes x splats-on-lanes** ([P, C]
blocks, P = tile_size^2, C = 128) so that no transposes or relayouts appear
anywhere in the inner loop:

    alpha [P, C] = opacity * exp(-0.5 G)                   (VPU)
    excl  [P, C] = exclusive prefix-sum of log1p(-alpha)   (MXU tri-matmul)
    col   [P, 3] += (alpha * exp(excl) * T) @ rgb          (MXU)
    T     [P, 1] *= exp(chunk log-sum)

The transmittance prefix runs in LOG space on the MXU (a [P, C] @
strict-upper-triangular [C, C] matmul, 2 bf16 limbs — `_mm_tri`): the
measured kernel ablation has it ~24% faster than the 7-pass VPU
roll-multiply product scan it replaced (kernel_bench 2M: 51.1 vs
66.9 ms), and the 16-bit limb precision bounds the log-prefix error of
any still-compositing pixel to ~7e-5 (see _FWD_TRI_PASSES).  The
backward replay uses the same log-space scan at 3 limbs, where
chunk-entry transmittance reconstruction is an exact subtraction (a
product-space replay would divide by per-chunk products that underflow).

This is the TPU replacement for the reference's fragment pipeline
(/root/reference/src/splatmesh/SplatMaterial3D.js:234-252: per-fragment
falloff + NormalBlending over sorted quads) with per-fragment semantics kept
identical to `compositing.splat_alphas`.  Unlike the reference (and the JAX
fallback) the kernel early-exits a tile once every pixel's transmittance
drops below ~1/512; the number of chunks composited is emitted so the
backward kernel replays exactly the same prefix in reverse, reconstructing
chunk-entry transmittance by subtracting log-space sums (exact — no
divide-by-(1-alpha) drift), and emits per-pair gradients.

Record packing — a FIELD-MAJOR [16, capacity] f32 array (the capacity is a
CHUNK multiple; tile ranges start anywhere and the kernel reads
floor-aligned chunks, masking each tile's [start, start + count) window).
Each chunk is ONE [16, C] strided DMA (two (8, 128) register tiles) at a
128-aligned minor offset — Mosaic-legal, and the layout is exactly the
`jnp.stack` of the sort's output operands: no [16, S] -> [S/C, 16, C]
relayout pass over the whole record set per frame (at 2M splats that
transpose re-materialized ~300 MB).
Row layout (within a chunk, each row is [1, C] across splats):

    row  0-1   mean2d (x, y)
    row  2-4   conic (a, b, c)
    row  5-7   rgb            (5-8 rgb + depth with cfg.return_depth)
    row  8     opacity        (9 with return_depth)
    row  9-10  support-box radius (rx, ry)   (10-11 with return_depth)
    row  rest  padding (zeros)

Gradients come back in the same layout (padding rows zero).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ALPHA_CLAMP, GAUSSIAN_CUTOFF
from ..core.types import RenderConfig

RECORD_WIDTH = 16
CHUNK = 128
# NOTE on hw-vs-interpret parity: every hard threshold in the pipeline
# (the 1e-4 early exit, min_alpha, the ALPHA_CLAMP saturation, the support
# box) is a DISCRETE decision fed by transcendentals (exp/log1p) whose
# last-ulp rounding differs between the TPU VPU and host libm.  A 1-ulp
# alpha difference can flip one tile's exit chunk or one fragment's
# cutoff, changing isolated outputs by a full truncated-tail quantum while
# every other element matches to ~1e-5.  Parity checks must therefore
# gate on error MASS (quantiles / over-bar fraction), not elementwise max
# — see tools/tpu_parity.py.
# Matches rasterize._LOG_T_FLOOR.
_LOG_T_FLOOR = -80.0
_T_FLOOR = math.exp(_LOG_T_FLOOR)
# Per-CHUNK floor on the log-transmittance contribution.  A single
# 128-pair chunk of near-opaque splats can contribute log T ~ -590 — far
# below f32 exp range — while other pixels keep the tile compositing, so
# a pixel's log T must be accumulated per chunk with a matching clamp on
# BOTH sides: the forward accumulates max(log(chunk product), CS_FLOOR)
# and the backward replay subtracts max(scan sum, CS_FLOOR); using the
# same constant makes the reconstruction exact through the chunk where a
# pixel dies and bounded (zero weights, zero gradients — the true values)
# beyond it.  Reconstructing from a SINGLE floored final log T instead
# diverged: entry T estimates overflowed exp() and poisoned every
# gradient row of dense scenes with NaN (caught by the at-scale parity
# case, ~400k pairs).
_CS_FLOOR = math.log(1e-37)
# Early-exit when every pixel's transmittance falls below 1e-4 — the
# REFERENCE's own saturation cutoff (its fragment shader discards at
# test_T < 0.0001, SplatMaterial2D.js:339; 3D splats saturate the same
# way).  Keeping the same constant bounds the truncation error of both
# the forward tail and the backward replay (which starts at exit_k) to
# the reference's.
_EXIT_T = 1e-4


def pack_records(mean2d_s, conic_s, color_s, opacity_s, radius_s
                 ) -> jnp.ndarray:
    """Pack [cap]-long pair-record arrays into the [16, cap] field-major
    layout.

    The capacity must be a CHUNK multiple (binning's slot layout pads to
    one, slot_layout_for)."""
    cap = mean2d_s.shape[0]
    assert cap % CHUNK == 0, cap
    rec = jnp.stack([
        mean2d_s[:, 0], mean2d_s[:, 1],
        conic_s[:, 0], conic_s[:, 1], conic_s[:, 2],
        color_s[:, 0], color_s[:, 1], color_s[:, 2],
        opacity_s,
        radius_s[:, 0], radius_s[:, 1],
    ], axis=0)                                       # [11, cap]
    return jnp.concatenate(
        [rec, jnp.zeros((RECORD_WIDTH - 11, cap), jnp.float32)], axis=0)


def pack_records_flat(xs, ys, cas, cbs, ccs, crs, cgs, cbs2, opas, rxs, rys,
                      depths=None) -> jnp.ndarray:
    """Pack flat [cap] record field arrays (binning.SortedPairs layout)
    into the field-major [16, cap] layout the kernels consume (one stack,
    no relayout — the kernel DMAs [16, C] chunk windows).

    With ``depths`` (cfg.return_depth) the channel block grows to 4 rows —
    [r, g, b, depth] at rows 5-8 — shifting opacity/radius to rows 9-11,
    so the kernel's per-chunk channel matmul stays one contiguous slice.
    """
    cap = xs.shape[0]
    assert cap % CHUNK == 0, cap
    rows = [xs, ys, cas, cbs, ccs, crs, cgs, cbs2]
    if depths is not None:
        rows.append(depths)
    rows += [opas, rxs, rys]
    rec = jnp.stack(rows, axis=0)                    # [11 or 12, cap]
    return jnp.concatenate(
        [rec, jnp.zeros((RECORD_WIDTH - len(rows), cap), jnp.float32)],
        axis=0)


def _pixel_coords(tile_id, cfg: RenderConfig):
    """GL pixel-center coords for one tile: ([P, 1], [P, 1])."""
    ts = cfg.tile_size
    p = ts * ts
    tx = (tile_id % cfg.tiles_x).astype(jnp.float32)
    ty = (tile_id // cfg.tiles_x).astype(jnp.float32)
    pid = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    ix = jnp.mod(pid, ts).astype(jnp.float32)
    iy = (pid // ts).astype(jnp.float32)
    px = tx * float(ts) + ix + 0.5
    py = ty * float(ts) + iy + 0.5
    return px, py


def _window_mask(chunk_base, start, count):
    """[1, C] bool: which lanes of a floor-aligned chunk fall inside the
    tile's [start, start + count) pair window."""
    gpos = chunk_base + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    return (gpos >= start) & (gpos < start + count)


def _chunk_alpha_block(rec, px, py, window, min_alpha, nc=3):
    """Alpha for one chunk: rec [16, C] -> (alpha [P, C], dx, dy, g).

    ``nc``: channel-row count (3, or 4 with a depth channel) — opacity and
    the support radius sit right after the channel block (pack_records_flat).
    """
    mx, my = rec[0:1, :], rec[1:2, :]                 # [1, C]
    ca, cb, cc = rec[2:3, :], rec[3:4, :], rec[4:5, :]
    opa = rec[5 + nc:6 + nc, :]
    rx, ry = rec[6 + nc:7 + nc, :], rec[7 + nc:8 + nc, :]
    opa = jnp.where(window, opa, 0.0)

    dx = px - mx                                      # [P, C]
    dy = py - my
    g = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    alpha = opa * jnp.exp(-0.5 * g)
    outside = ((g > GAUSSIAN_CUTOFF) | (alpha < min_alpha)
               | (jnp.abs(dx) > rx) | (jnp.abs(dy) > ry))
    alpha = jnp.where(outside, 0.0, alpha)
    alpha = jnp.minimum(alpha, ALPHA_CLAMP)
    return alpha, dx, dy, g


def _excl_prefix_prod_lanes(x):
    """EXCLUSIVE prefix product along lanes (axis 1) of a [P, C] block.

    Log-step roll-multiply scan (exact-ish f32: ~1 ulp per factor); the
    final roll-by-one turns the inclusive scan exclusive (lane 0 = 1).
    Returns (exclusive_prod [P, C], chunk_prod [P, 1])."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    acc = x
    shift = 1
    while shift < CHUNK:
        rolled = pltpu.roll(acc, shift, axis=1)
        acc = acc * jnp.where(lane >= shift, rolled, 1.0)
        shift *= 2
    total = acc[:, CHUNK - 1:CHUNK]
    excl = jnp.where(lane >= 1, pltpu.roll(acc, 1, axis=1), 1.0)
    return excl, total


def _tri(strict_upper: bool):
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return ((c > r) if strict_upper else (c < r)).astype(jnp.float32)


# MXU passes for the triangular prefix/suffix-scan matmuls.  The
# triangular operand is 0/1 — exactly representable in bf16 — so splitting
# ONLY the data operand into `passes` bf16 limbs reproduces the f32
# product at 8*passes mantissa bits: 3 limbs = 24 bits = full-f32
# accuracy (what Precision.HIGHEST buys with 6 passes, at half the MXU
# cost).  Mosaic has no Precision.HIGH lowering, hence the manual split.
#
# The FORWARD transmittance scan uses 2 limbs (16 mantissa bits): the
# exclusive log-T prefix of any pixel still compositing is bounded by
# |log _EXIT_T| ~ 9.2, so the limb-truncation error is <= 9.2 * 2^-17
# ~ 7e-5 absolute in log space -> <1e-4 relative on color weights, an
# order under the parity gate's 1e-3 error-mass bar — and each limb
# dropped from the in-loop scan is a measured ~6 ms/frame at 2M
# (kernel_bench: roll-scan 66.9 ms, mxu_scan_2 51.1, mxu_scan_3 63.7).
# The BACKWARD replay uses the SAME 2 limbs as the forward: the entry-T
# reconstruction subtracts per-chunk scan sums from the accumulated
# log-T residual (logt_after - chunk_sum), and the forward accumulated
# those sums with the 2-limb scan — re-running the identical 2-limb scan
# in the replay reproduces them BIT-FOR-BIT, so the subtraction is exact
# by construction (a higher-precision backward scan would *mismatch* the
# forward's own rounding).  Only pixels already dead (t < _EXIT_T) see
# the residual truncation, and their weights/gradients are ~0.
# (r4 ran the replay at 3 limbs out of caution; the 2-limb hardware
# parity gate and the r5 kernel ablation both hold at 2.)
_TRI_PASSES = 2
_FWD_TRI_PASSES = 2

# Record-DMA pipeline depth (both kernels).  Each chunk read is a [16, C]
# strided copy — 8 KB in 16 rows, ~1.2 us apiece (kernel_bench dma_only:
# 26k chunk reads = 31.7 ms = 6.8 GB/s against >800 GB/s of HBM).
# Measured on hardware (r5 job 05, 2M/tile32): depth 2/4/6 are IDENTICAL
# (fwd 35.6/35.7/35.8, bwd 51.2/51.3/51.9 ms) — the 2-slot issue-ahead
# already hides everything the DMA engine can overlap, so the extra
# in-flight reads buy nothing.  Keep the knob at 2 (lowest VMEM); the
# pipeline code is depth-generic if a future workload disagrees.
_DMA_DEPTH = 2

# Tiles composited per grid step (both kernels).  kernel_bench's
# 'grid_only' variant measures 13.5 us/tile of per-step machinery, but
# batching tiles does NOT recover it: measured on hardware (r5 job 08,
# 2M/tile32) tps 1/2/4 are bit-identical AND time-identical (fwd
# 35.8/35.2/35.2, bwd 51.5/51.7/52.4 ms) — Mosaic already overlaps the
# output-block writes and step prologue with the next step's work.
# Keep 1 (no padding work); the kernels are tps-generic if a future
# tile size / workload disagrees.  Sub-tiles run fully sequentially with
# per-tile DMA prime/drain, so the backward's boundary-chunk RMW
# ordering is unchanged at any tps (the caller pads the tile list to a
# multiple; padded tiles have count 0 -> zero chunks -> zero output).
_TILES_PER_STEP = 1

# Non-scan matmul precision (forward color accumulation, backward moment
# basis / channel grads / cotangent broadcast): Precision.HIGHEST lowers
# an f32 matmul to 6 bf16 MXU passes; a 3-pass double-limb product
# (ah@bh + ah@bl + al@bh, dropping only the al@bl term) reproduces ~16
# mantissa bits — relative error ~2^-16 ≈ 1.5e-5, two orders under the
# 5e-3 pallas-vs-XLA gradient gates and the 1e-3 hardware parity bar —
# at HALF the MXU passes.  6 restores exact HIGHEST (kernel_bench
# ablation knob).
_MM_PASSES = 3


def _mm_limbs(a, b, dims, passes=None):
    if passes is None:
        passes = _MM_PASSES
    if passes >= 6:
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def f(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

    return f(ah, bh) + f(ah, bl) + f(al, bh)


def _mm_tri(x, strict_upper: bool, passes=None):
    """[P, C] @ triangular-0/1 [C, C] on the MXU via bf16 limb splitting."""
    if passes is None:
        passes = _TRI_PASSES
    if passes >= 6:
        return _mm(x, _tri(strict_upper), passes=6)
    tri = _tri(strict_upper).astype(jnp.bfloat16)
    acc = None
    rem = x
    for p in range(passes):
        limb = rem.astype(jnp.bfloat16)
        if p + 1 < passes:
            rem = rem - limb.astype(jnp.float32)
        y = jax.lax.dot_general(limb, tri, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc


def _mm(a, b, passes=None):
    """[M, K] @ [K, N] -> [M, N] on the MXU (~f32 via _mm_limbs)."""
    return _mm_limbs(a, b, (((1,), (0,)), ((), ())), passes)


def _mm_nt(a, b, passes=None):
    """[M, K] x [N, K] -> [M, N] (contract trailing dims; no relayout)."""
    return _mm_limbs(a, b, (((1,), (1,)), ((), ())), passes)


def _mm_tn(a, b, passes=None):
    """[K, M] x [K, N] -> [M, N] (contract leading dims; no relayout)."""
    return _mm_limbs(a, b, (((0,), (0,)), ((), ())), passes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def composite_tiles(cfg: RenderConfig, capacity: int,
                    records, tile_starts, tile_counts, tile_ids
                    ) -> jnp.ndarray:
    """Pallas tile compositor.

    Args:
      records: [16, capacity] field-major packed pair records
        (pack_records / pack_records_flat).
      tile_starts / tile_counts: [T] pair-list ranges per tile; every start
        need NOT be CHUNK-aligned: the kernel reads floor-aligned chunks
        and masks each tile's [start, start + count) window.
      tile_ids: [T] global tile ids (pixel-coordinate placement; the
        tile-sharded path passes its slab's global ids).

    Returns ``chans [T, NC + 1, P]``: per tile, rows 0..NC-1 are the
    record channels (rgb, + depth with cfg.return_depth), row NC is the
    composited ALPHA (sum of per-pair weights, exactly 1 - transmittance
    by the compositing identity sum_i a_i prod_{j<i}(1-a_j) =
    1 - prod_i(1-a_i), accumulated by the SAME matmul against a
    constant-ones channel row).  The channel dim sits SECOND-MINOR: a
    [T, P, NC] output has XLA lane-pad the minor NC dim to 128 (a ~1 GB
    buffer at 1080p/tile32 that every downstream elementwise pass
    re-reads), while [T, NC+1, P] pads only NC+1 -> 8 sublanes (~2x on
    33 MB) and keeps per-tile blocks Mosaic-legal ((1, NC+1, P): the
    last two block dims equal the array dims).
    """
    out, _ = _composite_fwd(cfg, capacity, records, tile_starts, tile_counts,
                            tile_ids)
    return out


def _composite_fwd(cfg, capacity, records, tile_starts, tile_counts,
                   tile_ids):
    t = tile_starts.shape[0]
    p = cfg.tile_size * cfg.tile_size
    nc = 4 if cfg.return_depth else 3

    def kernel(starts_ref, counts_ref, ids_ref, rec_hbm,
               chans_out, logt_out, exit_k_out, chunk_vmem, sem):
        for sub in range(_TILES_PER_STEP):
            _fwd_one_tile(sub, starts_ref, counts_ref, ids_ref, rec_hbm,
                          chans_out, logt_out, exit_k_out, chunk_vmem, sem)

    def _fwd_one_tile(sub, starts_ref, counts_ref, ids_ref, rec_hbm,
                      chans_out, logt_out, exit_k_out, chunk_vmem, sem):
        i = pl.program_id(0) * _TILES_PER_STEP + sub
        start = starts_ref[i]
        start_chunk = start // CHUNK
        count = counts_ref[i]
        px, py = _pixel_coords(ids_ref[i], cfg)
        # floor-aligned chunk window: tile pairs need not start on a chunk
        # boundary; the head/tail lanes outside [start, start+count) mask out
        num_chunks = pl.cdiv(start % CHUNK + count, CHUNK)

        def dma_for(k):
            slot = jax.lax.rem(k, _DMA_DEPTH)
            return pltpu.make_async_copy(
                rec_hbm.at[:, pl.ds((start_chunk + k) * CHUNK, CHUNK)],
                chunk_vmem.at[slot], sem.at[slot])

        # Prime the pipeline: issue reads for chunks 0.._DMA_DEPTH-2 so
        # _DMA_DEPTH-1 chunk DMAs stay in flight throughout (see
        # _DMA_DEPTH — the read is latency-bound, not bandwidth-bound).
        for j in range(_DMA_DEPTH - 1):
            @pl.when(j < num_chunks)
            def _(j=j):
                dma_for(jnp.int32(j)).start()

        ones_row = jnp.ones((1, CHUNK), jnp.float32)

        def body(state):
            k, col, t, lt = state
            # Issue the deepest prefetch, then consume this chunk.
            @pl.when(k + _DMA_DEPTH - 1 < num_chunks)
            def _():
                dma_for(k + _DMA_DEPTH - 1).start()
            dma_for(k).wait()
            rec = chunk_vmem[jax.lax.rem(k, _DMA_DEPTH)]
            window = _window_mask((start_chunk + k) * CHUNK, start, count)
            alpha, _, _, _ = _chunk_alpha_block(rec, px, py, window,
                                                cfg.min_alpha, nc)
            # Log-space exclusive prefix on the MXU (2 bf16 limbs — see
            # _FWD_TRI_PASSES): alpha <= ALPHA_CLAMP keeps logw finite.
            logw = jnp.log1p(-alpha)                  # [P, C]
            excl_log = _mm_tri(logw, True, _FWD_TRI_PASSES)
            w = alpha * (jnp.exp(excl_log) * t)       # [P, C]
            # channel rows + a ones row: one [NC+1, C] x [P, C] matmul
            # accumulates colors AND the alpha sum (see composite_tiles)
            rec_aug = jnp.concatenate([rec[5:5 + nc, :], ones_row], axis=0)
            # passes=6 (HIGHEST): the [NC+1, P] output is tiny, so the
            # MXU passes are cheap and the 3-pass limb split's extra VPU
            # work LOSES here (measured +2 ms at 2M; the backward's big
            # [P, C]-output matmuls are where 3-pass wins).
            col = col + _mm_nt(rec_aug, w, passes=6)  # [NC+1, P]
            csum = excl_log[:, CHUNK - 1:CHUNK] + logw[:, CHUNK - 1:CHUNK]
            t = t * jnp.exp(csum)                     # product (may hit 0)
            # log T accumulated per chunk with the _CS_FLOOR clamp — the
            # backward replay's exact-subtraction source (see _CS_FLOOR)
            lt = lt + jnp.maximum(csum, _CS_FLOOR)
            return k + 1, col, t, lt

        def cond(state):
            k, _, t, _ = state
            return (k < num_chunks) & (jnp.max(t) > _EXIT_T)

        k_end, col, t, lt = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((nc + 1, p), jnp.float32),
             jnp.ones((p, 1), jnp.float32),
             jnp.zeros((p, 1), jnp.float32)))
        # Drain the prefetches issued beyond the exit point (chunks
        # k_end .. k_end+_DMA_DEPTH-2 may be in flight) so every
        # semaphore is clean for the next grid step.
        for j in range(_DMA_DEPTH - 1):
            @pl.when(k_end + j < num_chunks)
            def _(j=j):
                dma_for(k_end + j).wait()
        chans_out[sub] = col
        logt_out[sub] = lt    # finite by construction (>= _CS_FLOOR/chunk)
        exit_k_out[i] = k_end

    # Pad the tile list to a _TILES_PER_STEP multiple: padded tiles have
    # count 0 (zero chunks -> zero output) and reuse tile id 0.
    tps = _TILES_PER_STEP
    t_pad = -(-t // tps) * tps
    if t_pad != t:
        tile_starts = jnp.pad(tile_starts, (0, t_pad - t))
        tile_counts = jnp.pad(tile_counts, (0, t_pad - t))
        tile_ids = jnp.pad(tile_ids, (0, t_pad - t))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tps, nc + 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tps, p, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_DMA_DEPTH, RECORD_WIDTH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((_DMA_DEPTH,)),
        ],
    )

    chans, logt3, exit_k = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, nc + 1, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((t_pad,), jnp.int32),
        ],
    )(tile_starts, tile_counts, tile_ids, records)
    # logt3/exit_k stay PADDED in the pallas-private residuals (only the
    # backward kernel reads them, tile-for-tile at the same padding);
    # chans is sliced back to the caller's tile count.
    residuals = (records, tile_starts, tile_counts, tile_ids, logt3, exit_k)
    return chans[:t], residuals


def _composite_bwd(cfg, capacity, residuals, cotangents):
    records, tile_starts, tile_counts, tile_ids, logt3, exit_k = residuals
    gchans = cotangents                                # [T, NC+1, P]
    t = tile_starts.shape[0]
    p = cfg.tile_size * cfg.tile_size
    nc = 4 if cfg.return_depth else 3

    def kernel(starts_ref, counts_ref, ids_ref, exit_k_ref,
               rec_hbm, logt_blk, gcol_blk, grad_in_hbm,
               grad_hbm, chunk_vmem, gin_vmem, gout_vmem, sem, gsem, wsem):
        del grad_in_hbm   # aliased with grad_hbm (the output ref)
        # Sub-tiles run fully sequentially (per-tile prime + drain), so
        # the boundary-chunk RMW ordering between adjacent tiles is
        # identical to one-tile-per-step.
        for sub in range(_TILES_PER_STEP):
            _bwd_one_tile(sub, starts_ref, counts_ref, ids_ref, exit_k_ref,
                          rec_hbm, logt_blk, gcol_blk, grad_hbm,
                          chunk_vmem, gin_vmem, gout_vmem, sem, gsem, wsem)

    def _bwd_one_tile(sub, starts_ref, counts_ref, ids_ref, exit_k_ref,
                      rec_hbm, logt_blk, gcol_blk,
                      grad_hbm, chunk_vmem, gin_vmem, gout_vmem,
                      sem, gsem, wsem):
        i = pl.program_id(0) * _TILES_PER_STEP + sub
        start = starts_ref[i]
        start_chunk = start // CHUNK
        count = counts_ref[i]
        px, py = _pixel_coords(ids_ref[i], cfg)
        num_chunks = pl.cdiv(start % CHUNK + count, CHUNK)
        k_exit = exit_k_ref[i]

        logt_fin_t = logt_blk[sub]                    # [P, 1]
        gcol_t = gcol_blk[sub]                        # [NC+1, P] (alpha last)

        # TILE-LOCAL pixel-moment basis (1, x, y, x^2, xy, y^2): every
        # spatial gradient row is a polynomial moment of d_quad in pixel
        # coordinates, so ONE [6, P] @ [P, C] MXU matmul replaces five
        # [P, C]-wide rowsum integrands (the bulk of the backward VPU
        # work).  Local coordinates keep the basis tile-independent and
        # bound the de-centering cancellation to ~(radius/dx)^2 * 1e-7.
        ts = cfg.tile_size
        pid_l = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        pxl = jnp.mod(pid_l, ts).astype(jnp.float32) + 0.5   # [1, P]
        pyl = (pid_l // ts).astype(jnp.float32) + 0.5
        basis = jnp.concatenate([
            jnp.ones((1, p), jnp.float32), pxl, pyl,
            pxl * pxl, pxl * pyl, pyl * pyl], axis=0)        # [6, P]
        tx = (ids_ref[i] % cfg.tiles_x).astype(jnp.float32)
        ty = (ids_ref[i] // cfg.tiles_x).astype(jnp.float32)
        ox = tx * float(ts)                                  # tile origin
        oy = ty * float(ts)

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

        # Only a tile's FIRST and LAST chunks can be shared with a
        # neighboring tile's floor-aligned window (pair ranges are
        # contiguous CSR) — interior chunks are exclusively owned and
        # still hold their zero init, so their gradient read is skipped:
        # the RMW read traffic drops from exit_k to <= 2 chunks per tile
        # (mean exit_k ~5 at 2M).
        def is_boundary(j):
            return (j == 0) | (j == num_chunks - 1)

        # Replay starts at the forward's exit chunk: chunks beyond it never
        # ran forward, contribute zero gradient (the buffer is zero-init)
        # and must not perturb the transmittance replay — skip them.
        # Prime a _DMA_DEPTH-deep descending record-read pipeline (see
        # _DMA_DEPTH); the 2-slot gradient RMW pipeline is unchanged.
        @pl.when(k_exit > 0)
        def _():
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
            active = jnp.float32(1.0)
            @pl.when(k - (_DMA_DEPTH - 1) >= 0)
            def _():
                dma_for(k - (_DMA_DEPTH - 1)).start()
            @pl.when(k > 0)
            def _():
                # before chunk k-1's computation reuses gout slot
                # (k-1)%2 = (k+1)%2, chunk k+1's outbound write from that
                # slot must have drained
                @pl.when(k + 1 < k_exit)
                def _():
                    grad_write_for(k + 1).wait()
                @pl.when(is_boundary(k - 1))
                def _():
                    grad_read_for(k - 1).start()
            dma_for(k).wait()
            rec = chunk_vmem[jax.lax.rem(k, _DMA_DEPTH)]
            window = _window_mask((start_chunk + k) * CHUNK, start, count)
            alpha, _, _, _ = _chunk_alpha_block(rec, px, py, window,
                                                cfg.min_alpha, nc)
            logw = jnp.log1p(-alpha)                   # [P, C]
            # Exclusive prefix sum on the MXU (strict-upper triangular 0/1
            # matmul; full-f32 accuracy via the bf16 limb split, _mm_tri).
            excl = _mm_tri(logw, True)                 # [P, C]
            # the _CS_FLOOR clamp mirrors the forward accumulation exactly
            # (same constant), keeping the entry-T reconstruction bounded
            # through chunks where a pixel's transmittance dies
            chunk_sum = jnp.maximum(
                excl[:, CHUNK - 1:CHUNK] + logw[:, CHUNK - 1:CHUNK],
                _CS_FLOOR)
            logt_before = logt_after - active * chunk_sum
            t_i = jnp.exp(excl + logt_before)          # [P, C]
            w = alpha * t_i

            # Channel rows + the ones row (the alpha-sum channel's
            # cotangent flows through cg exactly like a color channel —
            # the old separate log-T cotangent term is subsumed).
            rec_aug = jnp.concatenate(
                [rec[5:5 + nc, :], jnp.ones((1, CHUNK), jnp.float32)],
                axis=0)                                # [NC+1, C]
            cg = _mm_tn(gcol_t, rec_aug)               # [P, C]
            d_chan = _mm(gcol_t, w)                    # [NC+1, C]
            u = w * cg
            # Exclusive suffix sum as an MXU matmul with a strict-lower
            # triangular 0/1 matrix: the roll-scan's ~21 VPU ops per
            # pair-pixel move to the otherwise-idle MXU (full-f32 accuracy
            # via the bf16 limb split, _mm_tri).
            suffix = _mm_tri(u, False) + sg            # [P, C]

            one_minus = jnp.maximum(1.0 - alpha, 1e-6)
            d_alpha = t_i * cg - suffix / one_minus
            gate = (alpha > 0.0) & (alpha < ALPHA_CLAMP)
            d_alpha = jnp.where(gate, d_alpha, 0.0)

            d_quad = d_alpha * (-0.5 * alpha)          # [P, C]
            ca, cb, cc = rec[2:3, :], rec[3:4, :], rec[4:5, :]
            mxl = rec[0:1, :] - ox                     # tile-local mean
            myl = rec[1:2, :] - oy
            opa = rec[5 + nc:6 + nc, :]
            maskc = window.astype(jnp.float32) * active  # [1, C]

            # All spatial gradient rows from the moment matmul: with
            # S* = sum_p d_quad * basis_p, the centered moments give
            #   E[dx^a dy^b] = sum_p d_quad (px-mx)^a (py-my)^b
            # and d_opa = -2 S0 / opa (since d_alpha*alpha = -2 d_quad and
            # d(alpha)/d(opa) = alpha/opa wherever the gate is open).
            mom = _mm(basis, d_quad)                   # [6, C]
            s0, sx, sy = mom[0:1, :], mom[1:2, :], mom[2:3, :]
            sxx, sxy, syy = mom[3:4, :], mom[4:5, :], mom[5:6, :]
            ex = sx - mxl * s0                         # E[dx]
            ey = sy - myl * s0                         # E[dy]
            exx = sxx - mxl * (sx + ex)                # E[dx^2]
            exy = sxy - mxl * sy - myl * ex            # E[dx dy]
            eyy = syy - myl * (sy + ey)                # E[dy^2]
            d_mx = -2.0 * (ca * ex + cb * ey)
            d_my = -2.0 * (cb * ex + cc * ey)
            d_opa = jnp.where(opa > 0.0, -2.0 * s0 / jnp.maximum(opa, 1e-12),
                              0.0)

            gr = jnp.concatenate([
                d_mx * maskc,
                d_my * maskc,
                exx * maskc,
                2.0 * exy * maskc,
                eyy * maskc,
                d_chan[:nc] * maskc,   # the ones row has no record field
                d_opa * maskc,
                jnp.zeros((RECORD_WIDTH - 6 - nc, CHUNK), jnp.float32),
            ], axis=0)                                      # [16, C]
            # Pipelined read-modify-write accumulation: adjacent tiles
            # share floor-aligned boundary chunks, so contributions ADD
            # into the zero-initialized (aliased) gradient buffer.  The
            # inbound grad read (boundary chunks only — see is_boundary)
            # was prefetched one iteration ago; the outbound write drains
            # before its staging slot is reused and fully at kernel end
            # (the next grid step may touch the boundary chunk).
            slot = jax.lax.rem(k, 2)
            @pl.when(is_boundary(k))
            def _():
                grad_read_for(k).wait()
                gout_vmem[slot] = gin_vmem[slot] + gr
            @pl.when(~is_boundary(k))
            def _():
                gout_vmem[slot] = gr
            grad_write_for(k).start()

            sg = sg + active * jnp.sum(u, axis=1, keepdims=True)
            return k, logt_before, sg

        def cond(state):
            return state[0] > 0

        init = (k_exit, logt_fin_t, jnp.zeros((p, 1), jnp.float32))
        jax.lax.while_loop(cond, body, init)
        # Drain outstanding grad writes (chunks 0 and 1) so the next grid
        # step sees fully-written boundary chunks.
        @pl.when(k_exit > 0)
        def _():
            grad_write_for(0).wait()
        @pl.when(k_exit > 1)
        def _():
            grad_write_for(1).wait()

    # The residual tile arrays are already padded to a _TILES_PER_STEP
    # multiple (forward); only the cotangent needs padding here (padded
    # tiles have exit_k 0, so their gchans rows are never read).
    tps = _TILES_PER_STEP
    t_pad = tile_starts.shape[0]
    if gchans.shape[0] != t_pad:
        gchans = jnp.pad(
            gchans, ((0, t_pad - gchans.shape[0]), (0, 0), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(t_pad // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # records
            pl.BlockSpec((tps, p, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                # logt_fin
            pl.BlockSpec((tps, nc + 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                # gchans
            pl.BlockSpec(memory_space=pl.ANY),                 # grad in
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_DMA_DEPTH, RECORD_WIDTH, CHUNK), jnp.float32),
            pltpu.VMEM((2, RECORD_WIDTH, CHUNK), jnp.float32),
            pltpu.VMEM((2, RECORD_WIDTH, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((_DMA_DEPTH,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    # The gradient buffer is a donated zero-initialized INPUT: chunks the
    # kernel never touches stay zero, and boundary chunks accumulate from
    # both owning tiles.
    grad_init = jnp.zeros(records.shape, jnp.float32)
    grad_records = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(records.shape, jnp.float32),
        input_output_aliases={7: 0},
        # Headroom over Mosaic's default 16 MB scoped-vmem budget (see the
        # matching note in pallas_surfel._bwd; v5e VMEM is 128 MB).
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024),
    )(tile_starts, tile_counts, tile_ids, exit_k,
      records, logt3, gchans, grad_init)
    return grad_records, None, None, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
