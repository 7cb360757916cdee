"""The fast tiled render path: project -> bin/sort -> composite -> image.

This is the TPU-native replacement for the reference's whole per-frame
machinery (octree cull + web-worker WASM counting sort + instanced quad
draw, /root/reference/src/Viewer.js:1833-1964 + src/worker/sorter.cpp +
src/splatmesh/SplatMaterial3D.js): a single jitted function containing

1. ``project_splats``  — fused EWA projection + SH shading (splat-parallel)
2. ``bin_sort_records`` — fused (tile, splat) pair expansion + one stable
                         sort of ``tile << sort_bits | depth`` keys with the
                         record fields riding as value operands
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
from .binning import SortedPairs, bin_sort_records
from .projection import ProjectedSplats, project_splats
from .rasterize import rasterize_pairs


def resolve_backend(cfg: RenderConfig) -> str:
    """'pallas' or 'jax'.  'auto' picks pallas on TPU-family backends."""
    if cfg.backend != "auto":
        return cfg.backend
    platform = jax.devices()[0].platform
    return "pallas" if platform in ("tpu", "axon") else "jax"


def composite_sorted(cfg: RenderConfig, pairs: SortedPairs,
                     tile_base: int | jnp.ndarray, num_tiles: int):
    """Backend dispatch for the tile compositor over a SortedPairs record
    set (the fused expand+sort path).

    Returns (tile_colors [T, P, 3], tile_logtrans [T, P]).
    """
    s_cap = pairs.capacity
    if cfg.return_depth:
        assert pairs.depths is not None, (
            "cfg.return_depth requires pairs built with the same config")
    if resolve_backend(cfg) == "pallas":
        from .pallas_rasterize import composite_tiles, pack_records_flat
        records3 = pack_records_flat(
            pairs.xs, pairs.ys, pairs.cas, pairs.cbs, pairs.ccs,
            pairs.crs, pairs.cgs, pairs.cbs2, pairs.opas,
            pairs.rxs, pairs.rys,
            depths=pairs.depths if cfg.return_depth else None)
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32) + tile_base
        return composite_tiles(cfg, s_cap, records3,
                               pairs.tile_starts, pairs.tile_counts, tile_ids)
    chan = [pairs.crs, pairs.cgs, pairs.cbs2]
    if cfg.return_depth:
        chan.append(pairs.depths)
    return rasterize_pairs(
        cfg, s_cap,
        jnp.stack([pairs.xs, pairs.ys], axis=1),
        jnp.stack([pairs.cas, pairs.cbs, pairs.ccs], axis=1),
        jnp.stack(chan, axis=1),
        pairs.opas,
        jnp.stack([pairs.rxs, pairs.rys], axis=1),
        pairs.tile_starts, pairs.tile_counts, tile_base)


def assemble_image(tile_colors: jnp.ndarray, tile_logtrans: jnp.ndarray,
                   cfg: RenderConfig):
    """Tile blocks -> (color [H, W, 3], alpha [H, W]) with row 0 at the top.

    Tile pixels are GL-oriented (y up); output images are raster-oriented.
    With cfg.return_depth, tile_colors carries a 4th channel (alpha-weighted
    depth sum) emitted as ``depth``: the alpha-normalized mean depth, 0 where
    nothing was hit (SceneHelper.js:38-91 parity — lets callers z-composite).
    """
    ts = cfg.tile_size
    ty, tx = cfg.tiles_y, cfg.tiles_x
    nc = tile_colors.shape[-1]
    trans = jnp.exp(tile_logtrans)

    def to_image(tiles, ch):
        # Keep the channel dim FUSED with the tile-row dim through the
        # transpose: a [.., ts, ts, ch] transpose leaves ch (3/1) as the
        # minor dim, which XLA lane-pads to 128 on TPU (up to 42x relayout
        # traffic); [.., ts, ts*ch] keeps the minor dim >= 96 wide.
        img = tiles.reshape(ty, tx, ts, ts * ch)
        img = img.transpose(0, 2, 1, 3).reshape(ty * ts, tx * ts, ch)
        # GL row y lives at image row H - 1 - y; crop the y/x padding.
        return img[:cfg.height][::-1, :cfg.width]

    # One fused relayout for color + transmittance ([.., ts*(nc+1)] minor).
    chans = to_image(jnp.concatenate([tile_colors, trans[..., None]],
                                     axis=-1), nc + 1)
    color = chans[..., :3]
    trans_img = chans[..., nc]
    bg = jnp.asarray(cfg.background, jnp.float32)
    alpha = 1.0 - trans_img
    out = {
        "color": color + trans_img[..., None] * bg[None, None, :],
        "alpha": alpha,
    }
    if nc == 4:
        depth = chans[..., 3] / jnp.maximum(alpha, 1e-6)
        out["depth"] = jnp.where(alpha > 1e-6, depth, 0.0)
    return out


def render(splats: SplatData, camera: Camera, cfg: RenderConfig,
           transforms: Optional[jnp.ndarray] = None,
           scene_indices: Optional[jnp.ndarray] = None,
           scene_opacities: Optional[jnp.ndarray] = None,
           scene_visibility: Optional[jnp.ndarray] = None,
           fade_params: Optional[tuple] = None,
           return_aux: bool = False):
    """Render one view through the tiled fast path.

    Returns a dict with ``color`` [H, W, 3] and ``alpha`` [H, W]; with
    ``cfg.return_depth`` also ``depth`` [H, W] (alpha-weighted mean depth,
    0 where empty); with ``return_aux`` also ``num_pairs`` / ``overflow``
    diagnostics (the framework's equivalent of the reference info panel's
    splat counts, Viewer.js:1804-1822).
    """
    if cfg.render_mode_2d:
        # 2DGS surfel mode (SplatMaterial2D parity): tiled fast path
        # (elementwise homography projection + fused expand/sort + per-tile
        # ray-plane compositing); render/surfel.py's global path is its
        # small-scene oracle.
        from .surfel import render_2d_tiled
        return render_2d_tiled(splats, camera, cfg, transforms,
                               scene_indices, scene_opacities,
                               scene_visibility, return_aux=return_aux)

    proj = project_splats(splats, camera, cfg, transforms, scene_indices,
                          scene_opacities, scene_visibility,
                          fade_params=fade_params)
    pairs = bin_sort_records(proj, cfg)
    tile_colors, tile_logtrans = composite_sorted(cfg, pairs, 0,
                                                  cfg.num_tiles)
    out = assemble_image(tile_colors, tile_logtrans, cfg)
    if return_aux:
        out["num_pairs"] = pairs.total_pairs
        out["overflow"] = pairs.overflow
    return out


def render_batch(splats: SplatData, cameras: Camera, cfg: RenderConfig,
                 **kwargs):
    """Render a BATCH of cameras (leading axis on every Camera field).

    Sequential `lax.map` over views inside one jit — the multi-view
    training/stereo/video path (each view runs the full sorted pipeline;
    views are independent).
    """
    return jax.lax.map(lambda cam: render(splats, cam, cfg, **kwargs),
                       cameras)


def stack_cameras(cams):
    """[Camera, ...] -> one batched Camera pytree for render_batch."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
