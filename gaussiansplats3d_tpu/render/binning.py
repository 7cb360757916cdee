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
3. one stable radix sort of the fused keys yields, per tile, a contiguous
   front-to-back splat list;
4. per-tile ranges are recovered with binary searches.

Everything is static-shaped for XLA: the pair list has a fixed capacity and
overflow pairs are dropped (counted in ``overflow`` so callers can resize).
The expansion uses the searchsorted trick — pair slot *i* belongs to the
splat whose cumulative-pair-offset interval contains *i* — which is fully
vectorized (no data-dependent loops).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.types import RenderConfig
from .projection import ProjectedSplats, quantize_depth


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
    # Gradient-reduction plumbing (see pipeline.gather_records): the
    # pre-sort slot each pair came from (pre-sort order is grouped by
    # splat), and each splat's contiguous pre-sort segment.
    presort_slot: jnp.ndarray       # [capacity] int32 (invalid -> capacity)
    splat_offsets: jnp.ndarray      # [N] int32
    splat_counts: jnp.ndarray       # [N] int32


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

    tx0, tx1, ty0, ty1, counts = tile_bounds(proj, cfg, ty_lo, ty_hi)
    depth_q = quantize_depth(proj.depth, proj.mask, cfg.sort_bits,
                             depth_bounds)

    offsets = jnp.cumsum(counts) - counts          # exclusive prefix sum
    total = offsets[-1] + counts[-1]
    overflow = jnp.maximum(total - capacity, 0)

    # Pair slot i -> owning splat.  A searchsorted would cost ~20 random
    # gather passes on TPU; instead scatter a 1 at each splat's first slot
    # and prefix-sum (splat_of = #offsets <= slot - 1), then fetch all the
    # per-splat fields a pair needs with ONE packed row gather.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    marks = jnp.zeros((capacity,), jnp.int32).at[offsets].add(
        1, mode="drop")
    splat_of = jnp.cumsum(marks).astype(jnp.int32) - 1
    splat_of = jnp.clip(splat_of, 0, counts.shape[0] - 1)
    valid = slots < total

    packed = jnp.stack(
        [offsets, tx1 - tx0 + 1, tx0, ty0, depth_q], axis=1)  # [N, 5] i32
    prow = packed[splat_of]                                   # one gather
    rank = slots - prow[:, 0]
    width = prow[:, 1]
    dy, dx = rank // width, rank % width
    tile = (prow[:, 3] + dy) * cfg.tiles_x + (prow[:, 2] + dx) - tile_lo

    key = (tile << cfg.sort_bits) | prow[:, 4]
    key = jnp.where(valid, key, jnp.int32(2147483647))

    # Three-operand sort: carrying the splat id as a sort value is far
    # cheaper at scale than recovering it with a 16M-row gather afterwards.
    sorted_key, sorted_slot, sorted_idx = jax.lax.sort(
        (key, slots, splat_of), dimension=0, num_keys=1, is_stable=True)
    sorted_tile = sorted_key >> cfg.sort_bits

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    counts_t = ends - starts

    valid_s = jnp.arange(capacity) < jnp.minimum(total, capacity)
    return BinnedPairs(
        sorted_splat_idx=sorted_idx,
        pair_valid=valid_s,
        tile_starts=starts,
        tile_counts=counts_t,
        total_pairs=total,
        overflow=overflow,
        presort_slot=jnp.where(valid_s, sorted_slot, capacity),
        splat_offsets=offsets,
        splat_counts=counts,
    )
