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

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.types import RenderConfig
from .projection import ProjectedSplats, quantize_depth

SMALL_K = 2                     # small-splat rect side, in tiles
_SENTINEL = jnp.int32(2147483647)


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
    marks = jnp.zeros((big_capacity,), jnp.int32).at[
        jnp.where(big, offsets_big, big_capacity)].add(1, mode="drop")
    splat_of_b = jnp.clip(jnp.cumsum(marks).astype(jnp.int32) - 1, 0, n - 1)
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
