"""The fast tiled render path: project -> bin/sort -> composite -> image.

This is the TPU-native replacement for the reference's whole per-frame
machinery (octree cull + web-worker WASM counting sort + instanced quad
draw, /root/reference/src/Viewer.js:1833-1964 + src/worker/sorter.cpp +
src/splatmesh/SplatMaterial3D.js): a single jitted function containing

1. ``project_splats``  — fused EWA projection + SH shading (splat-parallel)
2. ``bin_and_sort``    — (tile, splat) pair expansion + one radix sort of
                         fused ``tile << sort_bits | depth`` keys
3. ``rasterize_pairs`` — per-tile front-to-back compositing (custom VJP)
4. tile assembly       — [T, P, 3] tile blocks -> [H, W, 3] image

The whole pipeline is differentiable: pair *indices* are integer plumbing
(non-differentiable, exactly like the reference's sorted index buffer), but
the gathers that build the per-pair records backpropagate into the projected
splat attributes and from there into means/scales/quats/colors/SH.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.types import Camera, RenderConfig, SplatData
from .binning import BinnedPairs, bin_and_sort
from .projection import ProjectedSplats, project_splats
from .rasterize import rasterize_pairs


def resolve_backend(cfg: RenderConfig) -> str:
    """'pallas' or 'jax'.  'auto' picks pallas on TPU-family backends."""
    if cfg.backend != "auto":
        return cfg.backend
    platform = jax.devices()[0].platform
    return "pallas" if platform in ("tpu", "axon") else "jax"


def composite_pairs(cfg: RenderConfig, capacity: int,
                    mean2d_s, conic_s, color_s, opacity_s, radius_s,
                    tile_starts, tile_counts, tile_base, num_tiles: int):
    """Backend dispatch for the tile compositor.

    Returns (tile_colors [T, P, 3], tile_logtrans [T, P]).
    """
    if resolve_backend(cfg) == "pallas":
        from .pallas_rasterize import composite_tiles, pack_records
        records = pack_records(mean2d_s, conic_s, color_s, opacity_s,
                               radius_s)
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32) + tile_base
        return composite_tiles(cfg, capacity, records,
                               tile_starts, tile_counts, tile_ids)
    return rasterize_pairs(cfg, capacity, mean2d_s, conic_s, color_s,
                           opacity_s, radius_s, tile_starts, tile_counts,
                           tile_base)


def gather_pair_records(proj: ProjectedSplats, pairs: BinnedPairs):
    """Build the sorted per-pair record arrays the compositor consumes.

    Invalid (beyond-total) pair slots get opacity 0 so they contribute
    nothing regardless of which splat index they alias.
    """
    idx = pairs.sorted_splat_idx
    mean2d_s = proj.mean2d[idx]
    conic_s = proj.conic[idx]
    color_s = proj.color[idx]
    opacity_s = jnp.where(pairs.pair_valid, proj.opacity[idx], 0.0)
    radius_s = jax.lax.stop_gradient(proj.radius[idx])
    return mean2d_s, conic_s, color_s, opacity_s, radius_s


def assemble_image(tile_colors: jnp.ndarray, tile_logtrans: jnp.ndarray,
                   cfg: RenderConfig):
    """Tile blocks -> (color [H, W, 3], alpha [H, W]) with row 0 at the top.

    Tile pixels are GL-oriented (y up); output images are raster-oriented.
    """
    ts = cfg.tile_size
    ty, tx = cfg.tiles_y, cfg.tiles_x
    trans = jnp.exp(tile_logtrans)

    def to_image(tiles, ch):
        img = tiles.reshape(ty, tx, ts, ts, ch)
        img = img.transpose(0, 2, 1, 3, 4).reshape(ty * ts, tx * ts, ch)
        # GL row y lives at image row H - 1 - y; crop the y/x padding.
        return img[:cfg.height][::-1, :cfg.width]

    color = to_image(tile_colors, 3)
    trans_img = to_image(trans[..., None], 1)[..., 0]
    bg = jnp.asarray(cfg.background, jnp.float32)
    return {
        "color": color + trans_img[..., None] * bg[None, None, :],
        "alpha": 1.0 - trans_img,
    }


def render(splats: SplatData, camera: Camera, cfg: RenderConfig,
           transforms: Optional[jnp.ndarray] = None,
           scene_indices: Optional[jnp.ndarray] = None,
           scene_opacities: Optional[jnp.ndarray] = None,
           scene_visibility: Optional[jnp.ndarray] = None,
           return_aux: bool = False):
    """Render one view through the tiled fast path.

    Returns a dict with ``color`` [H, W, 3] and ``alpha`` [H, W]; with
    ``return_aux`` also ``num_pairs`` / ``overflow`` diagnostics (the
    framework's equivalent of the reference info panel's splat counts,
    Viewer.js:1804-1822).
    """
    if cfg.render_mode_2d:
        # 2DGS surfel mode (SplatMaterial2D parity) uses its own
        # homography-based path; see render/surfel.py.
        from .surfel import render_2d
        out = render_2d(splats, camera, cfg, transforms, scene_indices,
                        scene_opacities, scene_visibility)
        if return_aux:
            out["num_pairs"] = jnp.int32(0)
            out["overflow"] = jnp.int32(0)
        return out

    proj = project_splats(splats, camera, cfg, transforms, scene_indices,
                          scene_opacities, scene_visibility)
    capacity = cfg.pair_capacity(splats.num_splats)
    align = None
    if resolve_backend(cfg) == "pallas":
        from .pallas_rasterize import CHUNK
        align = CHUNK
    pairs = bin_and_sort(proj, cfg, capacity, align_chunks=align)
    eff_capacity = pairs.sorted_splat_idx.shape[0]
    mean2d_s, conic_s, color_s, opacity_s, radius_s = gather_pair_records(
        proj, pairs)
    tile_colors, tile_logtrans = composite_pairs(
        cfg, eff_capacity, mean2d_s, conic_s, color_s, opacity_s, radius_s,
        pairs.tile_starts, pairs.tile_counts, 0, cfg.num_tiles)
    out = assemble_image(tile_colors, tile_logtrans, cfg)
    if return_aux:
        out["num_pairs"] = pairs.total_pairs
        out["overflow"] = pairs.overflow
    return out
