"""The sharded render pipeline: shard_map over a (splat, tile) mesh.

Decomposition (SURVEY.md §5.7/§5.8, BASELINE.md config 4):

- **splat axis**: each device projects + SH-shades its contiguous shard of
  splats (embarrassingly parallel, the N-dominant compute).  Global depth
  bounds for the sort keys are a pmin/pmax over this axis — the multi-chip
  analogue of the WASM sorter's global min/max pass
  (/root/reference/src/worker/sorter.cpp:33-139).
- **exchange**: compact projected records (13 floats/splat) are
  all_gather'ed over the splat axis (rides ICI).  Its autodiff transpose is
  a psum_scatter, which distributes the parameter-gradient all-reduce
  across the backward sweep.
- **tile axis**: each device owns a slab of whole tile rows; it bins, sorts
  and composites only pairs that touch its slab.  The per-device sort is
  over ~pairs/tile_shards keys, so sort work scales out too.

The output is the global tile-block array, tile-sharded over the mesh; the
final image assembly (crop + y-flip) happens in the surrounding jit where
XLA inserts the (tiny) boundary exchanges.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import Camera, RenderConfig, SplatData
from ..render.binning import bin_and_sort
from ..render.pipeline import (
    assemble_image, composite_pairs, gather_records, pack_splat_table)
from ..render.projection import project_splats
from .mesh import SPLAT_AXIS, TILE_AXIS

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _tile_rows_per_shard(cfg: RenderConfig, tile_shards: int) -> int:
    if cfg.tiles_y % tile_shards != 0:
        raise ValueError(
            f"tiles_y ({cfg.tiles_y}) must divide evenly across "
            f"{tile_shards} tile shards; pad the viewport height to a "
            f"multiple of {cfg.tile_size * tile_shards}")
    return cfg.tiles_y // tile_shards


def sharded_render_tiles(mesh: Mesh, splats: SplatData, camera: Camera,
                         cfg: RenderConfig, capacity: int):
    """Render to tile blocks over the mesh.

    Args:
      splats: global splat pytree; leading axis must divide by the splat-axis
        size (pad with opacity-0 splats).
      capacity: per-device pair-list capacity.

    Returns (tile_colors [T, P, 3], tile_logtrans [T, P]) — global logical
    arrays sharded over the tile axis.
    """
    tile_shards = mesh.shape[TILE_AXIS]
    rows = _tile_rows_per_shard(cfg, tile_shards)
    local_tiles = rows * cfg.tiles_x

    def body(splats_l, camera_r):
        proj = project_splats(splats_l, camera_r, cfg)

        # Depth bounds feed integer sort keys only — non-differentiable
        # plumbing (pmin/pmax have no AD rule, and shouldn't need one here).
        big = jnp.float32(3.0e38)
        depth_ng = jax.lax.stop_gradient(proj.depth)
        dmin = jax.lax.pmin(
            jnp.min(jnp.where(proj.mask, depth_ng, big)), SPLAT_AXIS)
        dmax = jax.lax.pmax(
            jnp.max(jnp.where(proj.mask, depth_ng, -big)), SPLAT_AXIS)

        proj_all = jax.tree.map(
            lambda x: jax.lax.all_gather(x, SPLAT_AXIS, axis=0, tiled=True),
            proj)

        t_idx = jax.lax.axis_index(TILE_AXIS)
        tile_lo = t_idx * local_tiles
        pairs = bin_and_sort(proj_all, cfg, capacity,
                             tile_range=(tile_lo, local_tiles),
                             depth_bounds=(dmin, dmax))
        eff_capacity = capacity
        rec = gather_records(pack_splat_table(proj_all),
                             pairs.sorted_splat_idx, pairs.pair_valid)
        tile_colors, tile_logtrans = composite_pairs(
            cfg, eff_capacity, rec,
            pairs.tile_starts, pairs.tile_counts, tile_lo, local_tiles)
        return tile_colors, tile_logtrans

    splat_spec = jax.tree.map(lambda _: P(SPLAT_AXIS), splats)
    cam_spec = jax.tree.map(lambda _: P(), camera)
    out_spec = (P(TILE_AXIS), P(TILE_AXIS))
    fn = shard_map(body, mesh=mesh,
                   in_specs=(splat_spec, cam_spec),
                   out_specs=out_spec, check_vma=False)
    return fn(splats, camera)


def sharded_render(mesh: Mesh, splats: SplatData, camera: Camera,
                   cfg: RenderConfig,
                   capacity: Optional[int] = None):
    """Full sharded render returning the assembled image dict.

    Per-device pair capacity defaults to the single-chip capacity divided by
    the tile-shard count (each slab sees roughly 1/tile_shards of the pairs).
    """
    if capacity is None:
        tile_shards = mesh.shape[TILE_AXIS]
        capacity = -(-cfg.pair_capacity(splats.num_splats) // tile_shards)
        capacity = -(-capacity // cfg.chunk_size) * cfg.chunk_size
    tile_colors, tile_logtrans = sharded_render_tiles(
        mesh, splats, camera, cfg, capacity)
    return assemble_image(tile_colors, tile_logtrans, cfg)


def pad_splats_for_mesh(splats: SplatData, mesh: Mesh) -> SplatData:
    """Pad the splat axis to a multiple of the splat-shard count with
    fully-transparent splats (opacity 0 => culled everywhere)."""
    ds = mesh.shape[SPLAT_AXIS]
    n = splats.num_splats
    pad = (-n) % ds
    if pad == 0:
        return splats
    import dataclasses

    def pad_leaf(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    padded = jax.tree.map(pad_leaf, splats)
    # padded colors are zero => opacity 0; quats zero-norm is guarded in
    # quat_to_rotmat; keep scales tiny to avoid inf covariances.
    return dataclasses.replace(
        padded,
        scales=padded.scales.at[n:].set(1e-6),
        quats=padded.quats.at[n:, 3].set(1.0))


def device_put_sharded_splats(splats: SplatData, mesh: Mesh) -> SplatData:
    """Place splats on the mesh: sharded over the splat axis, replicated
    over the tile axis."""
    splats = pad_splats_for_mesh(splats, mesh)
    sharding = NamedSharding(mesh, P(SPLAT_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), splats)
