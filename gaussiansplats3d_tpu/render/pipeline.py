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

    Returns ``chans [T, NC + 1, P]`` — per tile, rows 0..NC-1 the
    record channels, row NC the composited alpha (= 1 - transmittance).
    The channel dim sits second-minor so the minor dim stays P-wide:
    [T, P, NC] tile blocks get their NC dim lane-padded to 128 by XLA (a
    ~1 GB buffer at 1080p that every downstream pass re-reads; see
    composite_tiles).
    """
    s_cap = pairs.capacity
    if cfg.return_depth:
        assert pairs.depths is not None, (
            "cfg.return_depth requires pairs built with the same config")
    if resolve_backend(cfg) == "pallas":
        from .pallas_rasterize import composite_tiles, pack_records_flat
        from .rasterize import tile_ids_from_base
        records3 = pack_records_flat(
            pairs.xs, pairs.ys, pairs.cas, pairs.cbs, pairs.ccs,
            pairs.crs, pairs.cgs, pairs.cbs2, pairs.opas,
            pairs.rxs, pairs.rys,
            depths=pairs.depths if cfg.return_depth else None)
        tile_ids = tile_ids_from_base(num_tiles, tile_base)
        return composite_tiles(cfg, s_cap, records3,
                               pairs.tile_starts, pairs.tile_counts, tile_ids)
    chan = [pairs.crs, pairs.cgs, pairs.cbs2]
    if cfg.return_depth:
        chan.append(pairs.depths)
    colors, logt = rasterize_pairs(
        cfg, s_cap,
        jnp.stack([pairs.xs, pairs.ys], axis=1),
        jnp.stack([pairs.cas, pairs.cbs, pairs.ccs], axis=1),
        jnp.stack(chan, axis=1),
        pairs.opas,
        jnp.stack([pairs.rxs, pairs.rys], axis=1),
        pairs.tile_starts, pairs.tile_counts, tile_base)
    return chans_from_colors_logt(colors, logt)


def chans_from_colors_logt(colors: jnp.ndarray, logt: jnp.ndarray):
    """(colors [T, P, NC], logt [T, P]) -> chans [T, NC+1, P] (alpha last).

    Adapter for the XLA-oracle and surfel compositors that still emit the
    channel-minor pair; the CPU/oracle paths don't care about the TPU
    lane-padding the channel-second-minor layout avoids."""
    alpha = 1.0 - jnp.exp(logt)
    return jnp.concatenate(
        [jnp.moveaxis(colors, -1, 1), alpha[:, None]], axis=1)


def assemble_image(chans: jnp.ndarray, cfg: RenderConfig):
    """Tile blocks [T, NC+1, P] (alpha last) -> (color [H, W, 3],
    alpha [H, W]) with row 0 at the top.

    Tile pixels are GL-oriented (y up); output images are raster-oriented.
    With cfg.return_depth, chans carries a 4th record channel
    (alpha-weighted depth sum) emitted as ``depth``: the alpha-normalized
    mean depth, 0 where nothing was hit (SceneHelper.js:38-91 parity —
    lets callers z-composite).  The channel dim stays MAJOR through the
    tile->image relayout (minor dims ts x ts per channel); only the final
    per-channel moveaxis touches a channel-minor array, and it fuses into
    whatever consumes the image (loss reduces, host transfers).
    """
    ts = cfg.tile_size
    ty, tx = cfg.tiles_y, cfg.tiles_x
    ncp = chans.shape[1]
    nc = ncp - 1

    # [T, C', P] -> [C', H, W]: per-channel tile grid relayout with the
    # channel dim left second-minor until the transpose, then crop + GL
    # row flip.
    img = chans.reshape(ty, tx, ncp, ts, ts)
    img = img.transpose(2, 0, 3, 1, 4).reshape(ncp, ty * ts, tx * ts)
    img = img[:, :cfg.height][:, ::-1, :cfg.width]

    alpha = img[nc]
    trans_img = 1.0 - alpha
    bg = jnp.asarray(cfg.background, jnp.float32)
    color = jnp.moveaxis(img[:3], 0, -1)
    out = {
        "color": color + trans_img[..., None] * bg[None, None, :],
        "alpha": alpha,
    }
    if nc == 4:
        depth = img[3] / jnp.maximum(alpha, 1e-6)
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
    chans = composite_sorted(cfg, pairs, 0, cfg.num_tiles)
    out = assemble_image(chans, cfg)
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
