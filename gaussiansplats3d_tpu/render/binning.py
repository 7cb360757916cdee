"""Tile binning + depth sorting: the on-device replacement for the
reference's CPU sort machinery.

The reference sorts *all* splats globally on the CPU every time the view
changes (web worker + WASM counting sort, /root/reference/src/worker/
sorter.cpp + SortWorker.js), culls with an octree (Viewer.js:1969-2077), and
renders quads back-to-front.  On TPU we replace all of that with the standard
tile-binning decomposition, entirely on device and inside one jit:

1. every visible splat's screen AABB is expanded into (tile, splat) pairs;
2. each pair gets a fused key ``tile_id << sort_bits | quantized_depth`` —
   the depth quantization follows the sorter's distance map
   (sorter.cpp:142-149, 2^sort_bits buckets);
3. one stable sort of the fused keys (carrying splat ids) yields, per tile,
   a contiguous front-to-back splat list;
4. per-tile ranges are recovered with binary searches.

Pair expansion is GATHER-FREE for typical splats (random gathers are the
scaling wall on TPU — a 16M-row ownership gather costs ~0.5 s on v5e):

- splats whose tile rect fits ``SMALL_K x SMALL_K`` (the overwhelming
  majority at real splat sizes) emit exactly K = SMALL_K^2 key slots each,
  k-major, every key a pure elementwise expression over [N] vectors;
  out-of-rect slots get the sentinel key and sort to the tail;
- bigger splats go through a scatter+prefix-sum ownership table over a
  small auxiliary capacity (``capacity // 4``), where the per-pair row
  gather is affordable because few splats are big.

Everything is static-shaped for XLA; the sorted list is truncated to
`capacity` and dropped pairs are counted in ``overflow``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.types import RenderConfig
from .projection import ProjectedSplats, quantize_depth

import numpy as np

SMALL_K = 2                     # small-splat rect side, in tiles
# np scalar, not jnp: a module-level jnp constant would initialize the XLA
# backend at import time, breaking jax.distributed.initialize ordering.
_SENTINEL = np.int32(2147483647)


@jax.tree_util.register_dataclass
@dataclass
class BinnedPairs:
    """Sorted (tile, splat) pair lists + per-tile ranges (a JAX pytree)."""

    sorted_splat_idx: jnp.ndarray   # [capacity] int32, splat index per pair
    pair_valid: jnp.ndarray         # [capacity] bool
    tile_starts: jnp.ndarray        # [num_tiles] int32 offsets into the list
    tile_counts: jnp.ndarray        # [num_tiles] int32
    total_pairs: jnp.ndarray        # [] int32 (pre-overflow-clamp)
    overflow: jnp.ndarray           # [] int32 pairs dropped due to capacity


def tile_bounds(proj: ProjectedSplats, cfg: RenderConfig,
                ty_lo: int = 0, ty_hi: int | None = None):
    """Inclusive tile-coordinate bounds [tx0, tx1] x [ty0, ty1] per splat.

    Returns (tx0, tx1, ty0, ty1, counts) where counts is 0 for culled splats
    or splats whose AABB misses the viewport (or the [ty_lo, ty_hi) tile-row
    window when given — the tile-sharded path's per-device slab).
    """
    if ty_hi is None:
        ty_hi = cfg.tiles_y
    ts = float(cfg.tile_size)
    x, y = proj.mean2d[:, 0], proj.mean2d[:, 1]
    rx, ry = proj.radius[:, 0], proj.radius[:, 1]
    tx0 = jnp.floor((x - rx) / ts).astype(jnp.int32)
    tx1 = jnp.floor((x + rx) / ts).astype(jnp.int32)
    ty0 = jnp.floor((y - ry) / ts).astype(jnp.int32)
    ty1 = jnp.floor((y + ry) / ts).astype(jnp.int32)
    inside = (proj.mask & (tx1 >= 0) & (ty1 >= ty_lo)
              & (tx0 < cfg.tiles_x) & (ty0 < ty_hi))
    tx0 = jnp.clip(tx0, 0, cfg.tiles_x - 1)
    tx1 = jnp.clip(tx1, 0, cfg.tiles_x - 1)
    ty0 = jnp.clip(ty0, ty_lo, ty_hi - 1)
    ty1 = jnp.clip(ty1, ty_lo, ty_hi - 1)
    counts = jnp.where(inside, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
    return tx0, tx1, ty0, ty1, counts.astype(jnp.int32)


def _segment_owner(big: jnp.ndarray, offsets: jnp.ndarray, cap: int,
                   n: int) -> jnp.ndarray:
    """Owning SPLAT INDEX for each slot of a segment table.

    ``big`` marks the owning splats; splat i owns slots [offsets[i],
    offsets[i] + counts[i]).  Scattering the index DELTA between
    consecutive owners at each segment start makes the running sum
    reconstruct true splat indices (a plain scatter-ones would only yield
    owner ordinals).
    """
    iota = jnp.arange(offsets.shape[0], dtype=jnp.int32)
    prev_incl = jax.lax.cummax(jnp.where(big, iota, -1))
    prev_excl = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                 prev_incl[:-1]])
    delta = jnp.where(big, iota - prev_excl, 0)
    marks = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(big, offsets, cap)].add(delta, mode="drop")
    return jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1).astype(jnp.int32)


def bin_and_sort(proj: ProjectedSplats, cfg: RenderConfig,
                 capacity: int,
                 tile_range: tuple | None = None,
                 depth_bounds: tuple | None = None) -> BinnedPairs:
    """Expand splats into depth-sorted per-tile pair lists (static shapes).

    Args:
      tile_range: optional (tile_lo, num_local_tiles) restricting binning to a
        contiguous range of global tile ids — the tile-sharded multi-chip path
        gives each device its own range.  Output tile ids are range-relative.
      depth_bounds: optional (dmin, dmax) scalars for the depth quantization
        range; multi-chip callers pass globally-reduced bounds so every shard
        quantizes identically.

    Tile ranges start at arbitrary offsets; the Pallas compositor reads
    floor-aligned chunks and masks each tile's [start, start + count)
    window, so no padded re-layout is needed.
    """
    if tile_range is None:
        tile_lo, num_tiles = 0, cfg.num_tiles
    else:
        tile_lo, num_tiles = tile_range
    tile_bits = max(1, (num_tiles - 1).bit_length())
    assert tile_bits + cfg.sort_bits <= 31, (
        f"tile bits ({tile_bits}) + sort bits ({cfg.sort_bits}) must fit an "
        f"int32 key; lower sort_bits or use larger tiles")

    if tile_range is not None:
        # tile_lo may be a traced per-device value (axis_index * local_tiles);
        # alignment to whole tile rows is the caller's contract.
        assert num_tiles % cfg.tiles_x == 0, (
            "tile_range must cover whole tile rows")
        if isinstance(tile_lo, int):
            assert tile_lo % cfg.tiles_x == 0, (
                "tile_range must start on a tile-row boundary")
        ty_lo = tile_lo // cfg.tiles_x
        ty_hi = ty_lo + num_tiles // cfg.tiles_x
    else:
        ty_lo, ty_hi = 0, cfg.tiles_y

    n = proj.opacity.shape[0]
    tx0, tx1, ty0, ty1, counts = tile_bounds(proj, cfg, ty_lo, ty_hi)
    depth_q = quantize_depth(proj.depth, proj.mask, cfg.sort_bits,
                             depth_bounds)

    width = tx1 - tx0 + 1
    height = ty1 - ty0 + 1
    small = (counts > 0) & (width <= SMALL_K) & (height <= SMALL_K)
    big = (counts > 0) & ~small

    # --- small splats: K elementwise key lanes, no gathers ---------------
    iota_n = jnp.arange(n, dtype=jnp.int32)
    small_keys = []
    for k in range(SMALL_K * SMALL_K):
        dy, dx = k // SMALL_K, k % SMALL_K
        in_rect = small & (dx < width) & (dy < height)
        tile_k = (ty0 + dy) * cfg.tiles_x + (tx0 + dx) - tile_lo
        key_k = jnp.where(in_rect, (tile_k << cfg.sort_bits) | depth_q,
                          _SENTINEL)
        small_keys.append(key_k)
    keys_small = jnp.concatenate(small_keys)             # [K*N] k-major
    splat_small = jnp.tile(iota_n, SMALL_K * SMALL_K)

    # --- big splats: ownership table over a small auxiliary capacity -----
    big_capacity = max(256, capacity // 4)
    counts_big = jnp.where(big, counts, 0)
    offsets_big = jnp.cumsum(counts_big) - counts_big
    total_big = offsets_big[-1] + counts_big[-1]
    slots_b = jnp.arange(big_capacity, dtype=jnp.int32)
    splat_of_b = _segment_owner(big, offsets_big, big_capacity, n)
    packed = jnp.stack([offsets_big, width, tx0, ty0, depth_q], axis=1)
    prow = packed[splat_of_b]
    rank = slots_b - prow[:, 0]
    bw = prow[:, 1]
    bdy, bdx = rank // bw, rank % bw
    tile_b = (prow[:, 3] + bdy) * cfg.tiles_x + (prow[:, 2] + bdx) - tile_lo
    valid_b = slots_b < jnp.minimum(total_big, big_capacity)
    key_b = jnp.where(valid_b, (tile_b << cfg.sort_bits) | prow[:, 4],
                      _SENTINEL)

    # --- one fused sort over both populations ----------------------------
    keys = jnp.concatenate([keys_small, key_b])
    splat_arr = jnp.concatenate([splat_small, splat_of_b])
    sorted_key, sorted_idx = jax.lax.sort(
        (keys, splat_arr), dimension=0, num_keys=1, is_stable=True)
    sorted_key = sorted_key[:capacity]
    sorted_idx = sorted_idx[:capacity]
    sorted_tile = jnp.where(sorted_key == _SENTINEL, jnp.int32(num_tiles),
                            sorted_key >> cfg.sort_bits)

    total_small = jnp.sum(jnp.where(small, counts, 0))
    total = total_small + total_big
    overflow = (jnp.maximum(total - capacity, 0)
                + jnp.maximum(total_big - big_capacity, 0))

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids,
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids,
                            side="right").astype(jnp.int32)

    return BinnedPairs(
        sorted_splat_idx=sorted_idx,
        pair_valid=sorted_key != _SENTINEL,
        tile_starts=starts,
        tile_counts=ends - starts,
        total_pairs=total,
        overflow=overflow,
    )


# ===========================================================================
# Fused expand + sort + records path ("records ride the sort")
# ===========================================================================
#
# The measured scaling wall on TPU is the random per-pair record gather
# (12-15 ns per index: ~450 ms for 36M pair rows on v5e) and its mirror-image
# re-grouping gather in the backward pass.  Both disappear when the record
# FIELDS travel through `lax.sort` as extra value operands: a value operand
# costs ~0.55 ns per slot per pass-set (measured: 36M-slot sort goes from
# 152 ms at 2 operands to 192 ms at 4), an order of magnitude cheaper than
# gathering the same data afterwards.
#
# Slot layout (S = 2N + aux_capacity, a CHUNK multiple):
#   lane 0  [0,  N)   the first  covered tile of splats covering 1-2 tiles
#   lane 1  [N, 2N)   the second covered tile of splats covering exactly 2
#   aux     [2N, S)   every pair of splats covering >= 3 tiles, laid out by
#                     a scatter-ones + prefix-sum ownership table
# Lanes are pure elementwise expressions over [N] vectors (gather-free);
# only the (rare) aux splats pay one row gather over the small aux range.
# Unused slots carry a sentinel key and sort to the tail, outside every
# tile's [start, start + count) window.
#
# The backward pass exploits that the sorted slot ids are a PERMUTATION of
# 0..S-1: sorting (sorted_slot, grad columns) aligns every pair gradient
# with its source slot in one shot — lane gradients are then plain [N]
# slices and the aux segment-reduction runs over boundaries that are known
# elementwise (the ownership offsets).  No histogram, no searchsorted, no
# row gather.
#
# This supersedes the reference's whole sort machinery
# (/root/reference/src/worker/sorter.cpp + SortWorker.js) on TPU while
# keeping its ordering semantics (quantized-depth buckets, stable ties).

_F16_SCALE = 16.0  # radius fixed-point: 1/16 px, exact in u16
_PX_SCALE = 8.0    # packed-mode position fixed-point: 1/8 px
_PX_OFFSET = 1024.0  # covers centers up to maxScreenSpaceSplatSize off-screen


def _pack_f16_pair(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Two f32 -> one int32 carrying two f16 payloads (hi<<16 | lo)."""
    h = jax.lax.bitcast_convert_type(hi.astype(jnp.float16), jnp.uint16)
    l = jax.lax.bitcast_convert_type(lo.astype(jnp.float16), jnp.uint16)
    return ((h.astype(jnp.uint32) << 16) | l.astype(jnp.uint32)).astype(
        jnp.int32)


def _unpack_f16_pair(packed: jnp.ndarray):
    u = packed.astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16),
                                      jnp.float16)
    lo = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16),
                                      jnp.float16)
    return hi.astype(jnp.float32), lo.astype(jnp.float32)


def _px_scale_for(cfg: RenderConfig) -> float:
    """Finest u16 fixed-point step covering the viewport plus a +-1024-px
    off-screen-center margin: 1/16 px up to ~2K viewports, 1/8 px to ~6K."""
    span = max(cfg.width, cfg.height) + 2.0 * _PX_OFFSET
    return 16.0 if span * 16.0 <= 65536.0 else _PX_SCALE


def _pack_px_pair(hi: jnp.ndarray, lo: jnp.ndarray, scale: float
                  ) -> jnp.ndarray:
    """Two pixel coordinates -> one int32 (u16 fixed point, +1024 offset)."""
    def q(v):
        return jnp.clip((v + _PX_OFFSET) * scale, 0.0, 65535.0).astype(
            jnp.uint32)
    return ((q(hi) << 16) | q(lo)).astype(jnp.int32)


def _unpack_px_pair(packed: jnp.ndarray, scale: float):
    u = packed.astype(jnp.uint32)
    inv = 1.0 / scale
    return ((u >> 16).astype(jnp.float32) * inv - _PX_OFFSET,
            (u & 0xFFFF).astype(jnp.float32) * inv - _PX_OFFSET)


def _pack_bf16_pair(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Two f32 -> one int32 carrying two round-to-nearest bf16 payloads.

    bf16 keeps f32's exponent range — safe for gradient magnitudes (f16
    would flush small cotangents to zero)."""
    def q(v):
        u = jax.lax.bitcast_convert_type(v, jnp.uint32)
        u = u + 0x7FFF + ((u >> 16) & 1)          # round to nearest even
        return u >> 16
    return ((q(hi) << 16) | q(lo)).astype(jnp.int32)


def _unpack_bf16_pair(packed: jnp.ndarray):
    u = packed.astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return hi, lo


def _pack_u16_pair(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Two non-negative f32 (1/16-px fixed point) -> one int32."""
    h = (hi * _F16_SCALE).astype(jnp.uint32)
    l = (lo * _F16_SCALE).astype(jnp.uint32)
    return ((h << 16) | (l & 0xFFFF)).astype(jnp.int32)


def _unpack_u16_pair(packed: jnp.ndarray):
    u = packed.astype(jnp.uint32)
    inv = 1.0 / _F16_SCALE
    return ((u >> 16).astype(jnp.float32) * inv,
            (u & 0xFFFF).astype(jnp.float32) * inv)


@jax.tree_util.register_dataclass
@dataclass
class SortedPairs:
    """Depth/tile-sorted pair records as flat field arrays (a JAX pytree).

    All record arrays have length S = lanes*N + aux_capacity + pad; slots\n    outside the per-tile [start, start + count) windows are sentinels that
    no compositor reads (their opacity is additionally zeroed).
    """

    xs: jnp.ndarray            # [S] mean2d.x
    ys: jnp.ndarray            # [S] mean2d.y
    cas: jnp.ndarray           # [S] conic a
    cbs: jnp.ndarray           # [S] conic b
    ccs: jnp.ndarray           # [S] conic c
    crs: jnp.ndarray           # [S] color r
    cgs: jnp.ndarray           # [S] color g
    cbs2: jnp.ndarray          # [S] color b
    opas: jnp.ndarray          # [S] opacity (0 on invalid slots)
    rxs: jnp.ndarray           # [S] support half-extent x
    rys: jnp.ndarray           # [S] support half-extent y
    # [S] f32 depth (cfg.return_depth only; None otherwise) — the same
    # pre-quantization depth key the sort uses, 0 on culled splats.
    depths: jnp.ndarray | None
    tile_starts: jnp.ndarray   # [num_tiles] int32
    tile_counts: jnp.ndarray   # [num_tiles] int32
    total_pairs: jnp.ndarray   # [] int32
    overflow: jnp.ndarray      # [] int32 (aux pairs dropped)

    @property
    def capacity(self) -> int:
        return self.xs.shape[0]


def slot_layout_for(cfg: RenderConfig, n: int):
    """Static slot layout (lanes L, aux_cap, pad): S = L*n + aux_cap + pad,
    CHUNK-aligned.  aux_multiplier <= 0 disables the aux path entirely
    (no ownership scatter/gather; splats beyond the lane rect are dropped
    and counted in ``overflow``)."""
    lanes = cfg.lanes
    if cfg.aux_multiplier <= 0:
        aux = 0
    else:
        # Floor of 4096: small scenes can be dominated by big splats
        # (zoomed-in views), where aux pairs far exceed aux_multiplier * n.
        aux = max(4096, int(n * cfg.aux_multiplier))
    pad = (-(lanes * n + aux)) % cfg.chunk_size
    return lanes, aux, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _expand_sort(cfg: RenderConfig, num_tiles: int, aux_cap: int,
                 n_diff: int, pack_plan, tile_lo, depth_q, tx0, ty0, wt, ht,
                 counts, *fields):
    """Generic fused expand+sort over an arbitrary per-splat record.

    ``fields`` are [N] arrays riding the sort as value operands; the first
    ``n_diff`` are f32 and receive gradients (the rest — packed ints,
    hard-cutoff radii — are gradient-free plumbing).  Returns
    (sorted_field_0.., pair_valid, starts, counts, total, overflow).

    ``pack_plan`` (static) maps logical fields onto PHYSICAL sort operands
    — None rides every field as its own int32-bitcast operand; otherwise a
    tuple of ``("raw", i)`` / ``("f16", i, j)`` / ``("px", i, j, scale)``
    entries (f16: two half payloads; px: u16 fixed point at ``scale``
    subpixels, ``_px_scale_for``), j = -1 for an unpaired half.  Each
    dropped operand shaves a full value pass off the
    sort; forward values are quantized but gradients flow STRAIGHT-THROUGH
    exactly (the backward path is layout-independent — cotangents of the
    logical fields ride the alignment sort unpacked).
    """
    out, _ = _expand_sort_fwd(cfg, num_tiles, aux_cap, n_diff, pack_plan,
                              tile_lo, depth_q, tx0, ty0, wt, ht, counts,
                              *fields)
    return out


class _StaticInt(int):
    """An int residual that survives custom_vjp as a static Python value."""

    def __repr__(self):  # pragma: no cover
        return f"_StaticInt({int(self)})"


jax.tree_util.register_pytree_node(
    _StaticInt, lambda x: ((), int(x)), lambda aux, _: _StaticInt(aux))


def _lane_masks(cfg, counts, wt, ht):
    """Per-lane (dx, dy, valid) with the lane-coverable 'small' predicate."""
    if cfg.lanes == 1:
        small = counts == 1
        return small, [(0, 0, small)]
    if cfg.lanes == 2:
        small = (counts >= 1) & (counts <= 2)
        return small, [
            (0, 0, small),
            # second tile: right neighbor for 2x1 rects, below for 1x2
            (None, None, small & (counts == 2)),
        ]
    small = (counts >= 1) & (wt <= 2) & (ht <= 2)
    return small, [
        (0, 0, small),
        (1, 0, small & (wt > 1)),
        (0, 1, small & (ht > 1)),
        (1, 1, small & (wt > 1) & (ht > 1)),
    ]


def _pack_fields(pack_plan, fields):
    """Logical [N] fields -> physical int32 sort operands per the plan."""
    if pack_plan is None:
        pack_plan = tuple(("raw", i) for i in range(len(fields)))
    phys = []
    for spec in pack_plan:
        kind, i = spec[0], spec[1]
        if kind == "raw":
            f = fields[i]
            phys.append(f if f.dtype == jnp.int32
                        else jax.lax.bitcast_convert_type(f, jnp.int32))
            continue
        j = spec[2]
        lo = fields[j] if j >= 0 else jnp.zeros_like(fields[i])
        if kind == "f16":
            phys.append(_pack_f16_pair(fields[i], lo))
        else:
            phys.append(_pack_px_pair(fields[i], lo, spec[3]))
    return pack_plan, phys


def _unpack_fields(pack_plan, fields, sorted_phys):
    """Sorted physical operands -> sorted logical fields (original order)."""
    out = [None] * len(fields)
    for spec, v in zip(pack_plan, sorted_phys):
        kind, i = spec[0], spec[1]
        if kind == "raw":
            f = fields[i]
            out[i] = (v if f.dtype == jnp.int32
                      else jax.lax.bitcast_convert_type(v, f.dtype))
            continue
        j = spec[2]
        if kind == "f16":
            hi, lo = _unpack_f16_pair(v)
        else:
            hi, lo = _unpack_px_pair(v, spec[3])
        out[i] = hi
        if j >= 0:
            out[j] = lo
    return out


def _expand_sort_fwd(cfg, num_tiles, aux_cap, n_diff, pack_plan, tile_lo,
                     depth_q, tx0, ty0, wt, ht, counts, *fields):
    fields = list(fields)
    pack_plan, phys = _pack_fields(pack_plan, fields)
    n = fields[0].shape[0]
    lanes = cfg.lanes
    pad = (-(lanes * n + aux_cap)) % cfg.chunk_size
    s_total = lanes * n + aux_cap + pad
    tile_bits = max(1, (num_tiles - 1).bit_length())
    fused = tile_bits + cfg.sort_bits <= 31
    tiles_x = cfg.tiles_x

    # --- lane keys (pure elementwise) ---------------------------------
    tile0 = ty0 * tiles_x + tx0 - tile_lo
    small, lane_defs = _lane_masks(cfg, counts, wt, ht)
    lane_tiles, lane_valids = [], []
    for (dx, dy, valid) in lane_defs:
        if dx is None:  # 2-lane mode's mixed-direction second tile
            tile_k = tile0 + jnp.where(wt > 1, 1, tiles_x)
        else:
            tile_k = tile0 + dy * tiles_x + dx
        lane_tiles.append(tile_k)
        lane_valids.append(valid)
    big = (counts >= 1) & ~small

    # --- aux ownership table for splats beyond the lane rect ----------
    # Big splats are first COMPACTED into a static [B] table (one 2-operand
    # sort over N), so every remaining aux op — the ownership scatter, the
    # segment cumsum, the per-pair row gather and the backward
    # segment-reduce — runs over the small big-splat range instead of [N].
    # (The previous [N]-sized cummax+scatter ownership build plus the [N]
    # backward prefix gathers cost ~60 ms at N=2M on v5e — more than the
    # whole lanes=2 sort.)
    counts_aux = jnp.where(big, counts, 0)
    total_aux = jnp.sum(counts_aux)
    if aux_cap > 0:
        b_cap = -(-max(128, aux_cap // 2) // 128) * 128   # static
        iota_n = jnp.arange(n, dtype=jnp.int32)
        _, big_idx = jax.lax.sort(
            ((~big).astype(jnp.int32), iota_n), dimension=0, num_keys=1,
            is_stable=True)
        big_c = big_idx[: min(b_cap, n)]                  # [B'] splat ids
        if b_cap > n:
            big_c = jnp.pad(big_c, (0, b_cap - n))
        n_big = jnp.sum(big.astype(jnp.int32))
        vb = jnp.arange(b_cap, dtype=jnp.int32) < n_big
        counts_c = jnp.where(vb, counts_aux[big_c], 0)    # [B]
        offs_c = jnp.cumsum(counts_c) - counts_c
        covered = offs_c[-1] + counts_c[-1]               # pairs in table

        iota_aux = jnp.arange(aux_cap, dtype=jnp.int32)
        marks = jnp.zeros((aux_cap,), jnp.int32).at[
            jnp.where(counts_c > 0, offs_c, aux_cap)].add(1, mode="drop")
        ord_c = jnp.clip(jnp.cumsum(marks) - 1, 0, b_cap - 1)
        # Pair -> owning splat / segment start via two cheap 1-wide gathers
        # over the aux range, then ONE row gather pulls each pair's whole
        # record (1-wide per-field gathers are ~6x costlier per index).
        splat_of = big_c[ord_c]                           # [aux_cap]
        off_of = offs_c[ord_c]                            # [aux_cap]

        aux_tbl = jnp.stack(
            [wt, tx0, ty0, depth_q] + phys, axis=1)       # [N, 4 + F]
        prow = aux_tbl[splat_of]                          # [aux_cap, 4 + F]
        rank = iota_aux - off_of
        bw = jnp.maximum(prow[:, 0], 1)
        bdy, bdx = rank // bw, rank % bw
        tile_a = (prow[:, 2] + bdy) * tiles_x + (prow[:, 1] + bdx) - tile_lo
        valid_a = iota_aux < jnp.minimum(covered, aux_cap)
        depth_a = prow[:, 3]
        aux_vals = [prow[:, 4 + i] for i in range(len(phys))]
        dropped = total_aux - jnp.minimum(covered, aux_cap)
    else:
        aux_vals = None
        big_c = counts_c = offs_c = None
        dropped = total_aux

    def cat(i, op):
        # All value operands ride the sort as int32 BIT PATTERNS (a sort
        # only permutes values, so bitcasts round-trip exactly); all-integer
        # operand lists keep XLA:TPU on its fast sort path.
        parts = [op] * lanes
        if aux_cap > 0:
            parts.append(aux_vals[i])
        if pad:
            parts.append(jnp.zeros((pad,), jnp.int32))
        return jnp.concatenate(parts)

    slot = jnp.arange(s_total, dtype=jnp.int32)
    ops = (slot,) + tuple(cat(i, op) for i, op in enumerate(phys))

    def cat_keys(lane_keys, aux_key, pad_key):
        parts = list(lane_keys)
        if aux_cap > 0:
            parts.append(aux_key)
        if pad:
            parts.append(jnp.full((pad,), pad_key, jnp.int32))
        return jnp.concatenate(parts)

    if fused:
        lane_keys = [
            jnp.where(v, (t << cfg.sort_bits) | depth_q, _SENTINEL)
            for t, v in zip(lane_tiles, lane_valids)]
        aux_key = None
        if aux_cap > 0:
            aux_key = jnp.where(valid_a,
                                (tile_a << cfg.sort_bits) | depth_a,
                                _SENTINEL)
        keys = cat_keys(lane_keys, aux_key, _SENTINEL)
        sorted_ops = jax.lax.sort((keys,) + ops, dimension=0, num_keys=1,
                                  is_stable=True)
        skey = sorted_ops[0]
        sorted_tile = jnp.where(skey == _SENTINEL, jnp.int32(num_tiles),
                                skey >> cfg.sort_bits)
        vals = sorted_ops[1:]
    else:
        # two-operand key: (tile, depth) — supports sort_bits up to 24 at
        # any resolution (splatSortDistanceMapPrecision parity,
        # /root/reference/src/Viewer.js:208-210).
        tkeys = cat_keys(
            [jnp.where(v, t, num_tiles)
             for t, v in zip(lane_tiles, lane_valids)],
            jnp.where(valid_a, tile_a, num_tiles) if aux_cap > 0 else None,
            num_tiles)
        dkeys = cat_keys([depth_q] * lanes,
                         depth_a if aux_cap > 0 else None, 0)
        sorted_ops = jax.lax.sort((tkeys, dkeys) + ops, dimension=0,
                                  num_keys=2, is_stable=True)
        sorted_tile = sorted_ops[0]
        vals = sorted_ops[2:]

    sorted_slot = vals[0]
    sorted_fields = _unpack_fields(pack_plan, fields, vals[1:])
    pair_valid = sorted_tile < num_tiles

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids,
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids,
                            side="right").astype(jnp.int32)

    total = sum(jnp.sum(v.astype(jnp.int32)) for v in lane_valids)
    total = total + total_aux
    overflow = dropped

    out = tuple(sorted_fields) + (pair_valid, starts, ends - starts,
                                  total, overflow)
    residuals = (sorted_slot, _StaticInt(n), big_c, counts_c, offs_c)
    return out, residuals


def _expand_sort_bwd(cfg, num_tiles, aux_cap, n_diff, pack_plan, residuals,
                     cots):
    del pack_plan   # packing is forward-only; gradients are straight-through
    sorted_slot, n, big_c, counts_c, offs_c = residuals
    n = int(n)
    lanes = cfg.lanes
    n_fields = len(cots) - 5        # outputs beyond the fields: pair_valid,
    g_fields = list(cots[:n_diff])  # starts, counts, total, overflow
    # fields beyond n_diff (packed radii etc.) are hard-cutoff plumbing
    # (stop-gradient contract, like the reference's quad clamp).

    # One sort aligns every pair gradient to its source slot (the sorted
    # slots are a permutation of 0..S-1); lane gradients become plain [N]
    # slices and aux gradients a segment-reduce over the COMPACT big-splat
    # table, scattered back to the [N] owners with 1-wide adds.  Cotangents
    # ride as int32 bit patterns (same fast-sort-path trick as forward).
    # Under mixed/packed record precision, cotangent PAIRS ride as bf16
    # payloads in one int32 each (9 -> 5 value passes off the dominant
    # alignment sort; bf16 keeps f32's exponent range so no gradient
    # magnitude is flushed, and the ~2^-8 relative rounding is of the
    # same fidelity class as the forward's own f16 record packing).
    if cfg.record_precision == "f32":
        raw_count = n_diff           # everything exact
    else:
        raw_count = 2                # mean2d cotangents stay exact: they are
        #                              the densification signal and the bf16
        #                              rounding measurably degrades them
    ops, pairs_plan = [], []
    for a in range(raw_count):
        ops.append(jax.lax.bitcast_convert_type(g_fields[a], jnp.int32))
    for a in range(raw_count, n_diff - 1, 2):
        ops.append(_pack_bf16_pair(g_fields[a], g_fields[a + 1]))
        pairs_plan.append((a, a + 1))
    if (n_diff - raw_count) % 2:
        ops.append(jax.lax.bitcast_convert_type(g_fields[-1], jnp.int32))
    aligned_raw = jax.lax.sort(
        tuple([sorted_slot] + ops), dimension=0, num_keys=1,
        is_stable=True)[1:]
    aligned = [None] * n_diff
    for a in range(raw_count):
        aligned[a] = jax.lax.bitcast_convert_type(aligned_raw[a], jnp.float32)
    for (a, b), v in zip(pairs_plan, aligned_raw[raw_count:]):
        aligned[a], aligned[b] = _unpack_bf16_pair(v)
    if (n_diff - raw_count) % 2:
        aligned[-1] = jax.lax.bitcast_convert_type(aligned_raw[-1],
                                                   jnp.float32)

    def to_splat(g):
        acc = g[:n]
        for k in range(1, lanes):
            acc = acc + g[k * n:(k + 1) * n]
        return acc

    d = [to_splat(g) for g in aligned]

    if aux_cap > 0:
        base = lanes * n
        g_aux = jnp.stack([g[base:base + aux_cap] for g in aligned], axis=1)
        prefix = jnp.concatenate(
            [jnp.zeros((1, n_diff), jnp.float32),
             jnp.cumsum(g_aux, axis=0)], axis=0)
        starts_i = jnp.minimum(offs_c, aux_cap)
        ends_i = jnp.minimum(offs_c + counts_c, aux_cap)
        seg = prefix[ends_i] - prefix[starts_i]            # [B, n_diff]
        owner = jnp.where(counts_c > 0, big_c, n)
        d = [d[i].at[owner].add(seg[:, i], mode="drop")
             for i in range(n_diff)]

    # Nones: tile_lo, depth_q, tx0, ty0, wt, ht, counts (integer plumbing),
    # then the n_diff record-field cotangents, then the grad-free fields.
    return (None, None, None, None, None, None, None,
            *d, *([None] * (n_fields - n_diff)))


_expand_sort.defvjp(_expand_sort_fwd, _expand_sort_bwd)


def bin_sort_records(proj: ProjectedSplats, cfg: RenderConfig,
                     tile_range: tuple | None = None,
                     depth_bounds: tuple | None = None,
                     aux_capacity: int | None = None) -> SortedPairs:
    """Expand splats into depth-sorted per-tile pair RECORDS in one sort.

    The fused replacement for ``bin_and_sort`` + the post-sort record
    gather: record fields ride the sort as value operands (see the module
    section comment).  Returns sorted flat field arrays of static length
    S = 2N + aux_capacity plus per-tile ranges.

    ``tile_range`` / ``depth_bounds`` follow :func:`bin_and_sort`'s
    contract (the tile-sharded multi-chip path's slab windows).
    """
    if tile_range is None:
        tile_lo, num_tiles = 0, cfg.num_tiles
        ty_lo, ty_hi = 0, cfg.tiles_y
    else:
        tile_lo, num_tiles = tile_range
        assert num_tiles % cfg.tiles_x == 0, (
            "tile_range must cover whole tile rows")
        if isinstance(tile_lo, int):
            assert tile_lo % cfg.tiles_x == 0, (
                "tile_range must start on a tile-row boundary")
        ty_lo = tile_lo // cfg.tiles_x
        ty_hi = ty_lo + num_tiles // cfg.tiles_x

    n = proj.opacity.shape[0]
    if aux_capacity is None:
        _, aux_capacity, _ = slot_layout_for(cfg, n)
    tx0, tx1, ty0, ty1, counts = tile_bounds(proj, cfg, ty_lo, ty_hi)
    depth_q = quantize_depth(proj.depth, proj.mask, cfg.sort_bits,
                             depth_bounds)
    wt = tx1 - tx0 + 1
    ht = ty1 - ty0 + 1

    si = jax.lax.stop_gradient
    # The radius rides as u16 fixed point — it is a hard gradient-free
    # cutoff and projection already quantized it to 1/16 px.
    prr = _pack_u16_pair(si(proj.radius[:, 0]), si(proj.radius[:, 1]))
    diff_fields = [
        proj.mean2d[:, 0], proj.mean2d[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        proj.color[:, 0], proj.color[:, 1], proj.color[:, 2],
        proj.opacity]
    di = -1
    if cfg.return_depth:
        # depth rides as a 10th differentiable operand (culled splats carry
        # +inf depth — zero it so 0-weight slots can't produce inf * 0 NaNs
        # in the compositor's matmul).
        di = len(diff_fields)
        diff_fields.append(jnp.where(proj.mask, proj.depth, 0.0))
    ri = len(diff_fields)                     # prr (non-diff, already int32)
    # Field -> sort-operand layout (each dropped operand is a full value
    # pass off the sort; gradients are straight-through regardless):
    #   f32:    everything exact (finite-difference-grade; grad-check tests)
    #   mixed:  color/opacity as f16 pairs (12 -> 10 operands) — still above
    #           the reference's fidelity, which stores color as u8 texels
    #           (SplatMesh.js color texture) and covariance as f16
    #   packed: geometry too — positions 1/8-px u16 fixed point, conic f16
    #           (12 -> 8 operands) — the view/serving mode, comparable to
    #           the reference's compressed .ksplat levels (f16 centers)
    if cfg.record_precision == "f32":
        plan = None
    elif cfg.record_precision == "mixed":
        plan = tuple(("raw", i) for i in range(5)) + (
            ("f16", 5, 6), ("f16", 7, 8)) + (
            (("raw", di),) if di >= 0 else ()) + (("raw", ri),)
    else:   # "packed"
        plan = (("px", 0, 1, _px_scale_for(cfg)), ("f16", 2, 3),
                ("f16", 4, 8), ("f16", 5, 6), ("f16", 7, di), ("raw", ri))
    out = _expand_sort(
        cfg, num_tiles, aux_capacity, len(diff_fields), plan,
        jnp.asarray(tile_lo, jnp.int32), depth_q,
        tx0, ty0, wt, ht, counts, *diff_fields, prr)
    nf = len(diff_fields) + 1
    sorted_fields = out[:nf]
    (xs, ys, cas, cbs, ccs, crs, cgs, cbs2, opas) = sorted_fields[:9]
    depths = sorted_fields[9] if cfg.return_depth else None
    prr_s = sorted_fields[nf - 1]
    pair_valid, starts, tcounts, total, overflow = out[nf:]
    rxs, rys = _unpack_u16_pair(prr_s)
    opas = jnp.where(pair_valid, opas, 0.0)
    return SortedPairs(xs=xs, ys=ys, cas=cas, cbs=cbs, ccs=ccs,
                       crs=crs, cgs=cgs, cbs2=cbs2, opas=opas,
                       rxs=rxs, rys=rys, depths=depths,
                       tile_starts=starts, tile_counts=tcounts,
                       total_pairs=total, overflow=overflow)
