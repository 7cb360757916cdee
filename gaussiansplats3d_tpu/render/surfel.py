"""2DGS "surfel" render mode (SplatRenderMode.TwoD).

Re-implements the reference's 2D-splat pipeline
(/root/reference/src/splatmesh/SplatMaterial2D.js) as a fused, differentiable
JAX path:

- Each splat is a flat disk in its tangent plane: L = R * diag(s) with only
  the first two columns used for geometry (:64-76 CUDA reference comment).
- ``T = splat2world^T * world2ndc * ndc2pix`` maps homogeneous tangent
  coords (u, v, 1) to homogeneous PIXEL coords; rows (Tu, Tv, Tw) (:96-127).
  (One deliberate deviation: ndc2pix uses W/2 rather than the reference's
  (W-1)/2 so pixel centers match this framework's GL convention exactly.)
- Screen AABB: distance = |Tw|^2 under (1,1,-1); center2d and 1-sigma
  extents from the homography (:165-186); support = 3 sigma (the quad's
  `radius * 3.0`, :187).
- Per fragment (:289-344): k = px*Tw - Tu, l = py*Tw - Tv, p = k x l,
  s = (p.x/p.z, p.y/p.z); rho3d = |s|^2; rho2d = 2 |pix - center2d|^2
  (the object-space/screen-space low-pass filter pair); rho = min;
  depth = s . (Tw.x, Tw.y) + Tw.z must be >= 0.2 (near_n);
  alpha = min(0.99, opacity * exp(-rho/2)), cutoff below 1/255.

Two paths share the projection (`project_surfels`, pure elementwise):
`render_2d` composites globally depth-sorted surfels over all pixels in
checkpointed chunks (the small-scene oracle), `render_2d_tiled` runs the
fused expand+sort + per-tile compositor (`rasterize_surfel`) and scales
like the 3D mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import CLIP_FACTOR
from ..core import math3d
from ..core.covariance import covariance_from_scale_quat  # noqa: F401 (parity)
from ..core.sh import eval_sh_color
from ..core.types import Camera, RenderConfig, SplatData
from .compositing import pixel_grid
from .projection import quantize_depth

_NEAR_N = 0.2
_FILTER_INV_SQUARE = 2.0


def _surfel_alpha(chunk, px, py, min_alpha):
    """Alpha for a [C]-chunk of surfels over [P] pixels -> [C, P]."""
    t_mat = chunk["t"]                  # [C, 3, 3]
    tu = t_mat[:, :, 0, None]           # [C, 3, 1] (columns of T)
    tv = t_mat[:, :, 1, None]
    tw = t_mat[:, :, 2, None]
    pix = jnp.stack([px, py])           # [2, P]
    k = pix[0][None, None, :] * tw - tu         # [C, 3, P]
    l_ = pix[1][None, None, :] * tw - tv
    p = jnp.cross(k, l_, axis=1)                 # [C, 3, P]
    pz = p[:, 2, :]
    safe_pz = jnp.where(jnp.abs(pz) < 1e-12, 1e-12, pz)
    su = p[:, 0, :] / safe_pz
    sv = p[:, 1, :] / safe_pz
    rho3d = su * su + sv * sv
    dx = px[None, :] - chunk["center2d"][:, 0:1]
    dy = py[None, :] - chunk["center2d"][:, 1:2]
    rho2d = _FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(rho3d <= rho2d,
                      su * tw[:, 0, :] + sv * tw[:, 1, :] + tw[:, 2, :],
                      tw[:, 2, :])
    alpha = chunk["opacity"][:, None] * jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(alpha, 0.99)
    bad = ((jnp.abs(pz) < 1e-12) | (depth < _NEAR_N) | (alpha < min_alpha)
           | (jnp.abs(dx) > chunk["radius"][:, 0:1])
           | (jnp.abs(dy) > chunk["radius"][:, 1:2]))
    return jnp.where(bad, 0.0, alpha)


def render_2d(splats: SplatData, camera: Camera, cfg: RenderConfig,
              transforms: jnp.ndarray | None = None,
              scene_indices: jnp.ndarray | None = None,
              scene_opacities: jnp.ndarray | None = None,
              scene_visibility: jnp.ndarray | None = None):
    """Full-image 2DGS render (globally sorted, chunk-checkpointed).

    This is the tiled path's ORACLE: it validates sorting/tiling/
    compositing, so it shares the projection (`project_surfels` — the
    support box must be bit-identical: in 2D mode the box edge carries
    non-negligible alpha, so any 1/16-px quantization disagreement flips
    whole fragments).  The fragment math itself is validated independently
    against a brute-force NumPy evaluation in tests/test_surfel.py.
    """
    sp = project_surfels(splats, camera, cfg, transforms, scene_indices,
                         scene_opacities, scene_visibility)
    n = splats.num_splats
    color = sp.color
    if cfg.return_depth:
        # depth rides as a 4th radiance channel (alpha-weighted mean depth,
        # same re-design as the 3D path; culled splats carry +inf -> 0).
        d = jnp.where(sp.mask, sp.depth, 0.0)
        color = jnp.concatenate([color, d[:, None]], axis=-1)
    proj = {
        "t": jnp.stack(list(sp.t), axis=1).reshape(n, 3, 3),
        "center2d": sp.mean2d, "radius": sp.radius, "color": color,
        "opacity": sp.opacity, "depth": sp.depth, "mask": sp.mask,
    }
    key = quantize_depth(proj["depth"], proj["mask"], cfg.sort_bits)
    order = jnp.argsort(key, stable=True)
    recs = {k: proj[k][order] for k in
            ("t", "center2d", "radius", "color", "opacity")}

    n = splats.num_splats
    c = cfg.chunk_size
    pad = (-n) % c
    if pad:
        recs = {k: jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
                for k, v in recs.items()}
    nchunks = (n + pad) // c
    chunks = jax.tree.map(
        lambda v: v.reshape((nchunks, c) + v.shape[1:]), recs)

    px, py = pixel_grid(cfg.width, cfg.height)
    p = px.shape[0]

    nc = color.shape[-1]

    def body(carry, chunk):
        color_acc, trans = carry
        alpha = _surfel_alpha(chunk, px, py, cfg.min_alpha)
        logw = jnp.log1p(-alpha)
        excl = jnp.cumsum(logw, axis=0) - logw
        wgt = alpha * jnp.exp(excl) * trans[None, :]
        color_acc = color_acc + jnp.einsum(
            "cp,ck->pk", wgt, chunk["color"],
            preferred_element_type=jnp.float32)
        trans = trans * jnp.exp(jnp.sum(logw, axis=0))
        return (color_acc, trans), None

    init = (jnp.zeros((p, nc), jnp.float32), jnp.ones((p,), jnp.float32))
    (color_acc, trans), _ = jax.lax.scan(jax.checkpoint(body), init, chunks)

    bg = jnp.asarray(cfg.background, jnp.float32)
    alpha_img = 1.0 - trans
    color_img = color_acc[:, :3] + trans[:, None] * bg[None, :]
    out = {
        "color": color_img.reshape(cfg.height, cfg.width, 3),
        "alpha": alpha_img.reshape(cfg.height, cfg.width),
    }
    if cfg.return_depth:
        depth_img = color_acc[:, 3] / jnp.maximum(alpha_img, 1e-6)
        depth_img = jnp.where(alpha_img > 1e-6, depth_img, 0.0)
        out["depth"] = depth_img.reshape(cfg.height, cfg.width)
    return out


# ===========================================================================
# Tiled 2DGS fast path (scales like the 3D mode)
# ===========================================================================
#
# The global path above materializes [N, 3, 3]/[N, 4, 4] temporaries and
# composites every surfel over every pixel — fine as the 2D oracle, hopeless
# at real scene sizes (XLA pads small trailing dims to (8, 128) register
# tiles: a 32-57x HBM blowup).  The fast path below mirrors the 3D design:
#
# - projection is pure elementwise math over flat [N] arrays (the [S, 4, 3]
#   per-scene matrix products stay on the tiny scene axis);
# - surfel records ride the fused expand+sort (`binning._expand_sort`,
#   n_diff=15) to per-tile depth-sorted lists;
# - `rasterize_surfel.composite_surfel_tiles` composites per tile with the
#   ray-plane fragment math and a replay backward.

from dataclasses import dataclass as _dataclass

from ..core.types import RenderConfig
from .binning import (
    _SENTINEL,  # noqa: F401
    _expand_sort,
    _pack_u16_pair,
    _unpack_u16_pair,
    slot_layout_for,
)


@jax.tree_util.register_dataclass
@_dataclass
class SurfelProjection:
    """Flat per-surfel screen-space quantities (a JAX pytree).

    ``t`` entries are the row-major 3x3 homography (GLSL Tu/Tv/Tw are its
    columns); mean2d/radius give the binning AABB; all arrays are [N]."""

    t: tuple                 # 9 x [N] (t00 t01 t02 t10 ... t22)
    mean2d: jnp.ndarray      # [N, 2] center2d
    radius: jnp.ndarray      # [N, 2] support half-extents (1/16-px grid)
    color: jnp.ndarray       # [N, 3]
    opacity: jnp.ndarray     # [N]
    depth: jnp.ndarray       # [N]
    mask: jnp.ndarray        # [N] bool

    # flat-field views (binning.tile_bounds consumes the same names as
    # ProjectedSplats; XLA fuses the slice-of-stack away inside one jit)
    @property
    def xs(self) -> jnp.ndarray:
        return self.mean2d[:, 0]

    @property
    def ys(self) -> jnp.ndarray:
        return self.mean2d[:, 1]

    @property
    def rx(self) -> jnp.ndarray:
        return self.radius[:, 0]

    @property
    def ry(self) -> jnp.ndarray:
        return self.radius[:, 1]


def project_surfels(splats: SplatData, camera: Camera, cfg: RenderConfig,
                    transforms: jnp.ndarray | None = None,
                    scene_indices: jnp.ndarray | None = None,
                    scene_opacities: jnp.ndarray | None = None,
                    scene_visibility: jnp.ndarray | None = None
                    ) -> SurfelProjection:
    """Elementwise surfel projection (no [N, k, k] temporaries).

    Same math as the reference (SplatMaterial2D.js:94-187),
    restructured so every per-splat quantity is a flat [N] expression; the
    4x4/4x3 matrix algebra happens once per scene on [S, ...] arrays.
    """
    n = splats.num_splats
    w, h = cfg.width, cfg.height
    means = splats.means
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]

    ndc2pix = jnp.array([
        [w / 2.0, 0.0, 0.0],
        [0.0, h / 2.0, 0.0],
        [0.0, 0.0, 0.0],
        [w / 2.0, h / 2.0, 1.0]], jnp.float32)               # [4, 3]

    if transforms is not None:
        scene_ids = (jnp.zeros((n,), jnp.int32) if scene_indices is None
                     else scene_indices)
        tfs = transforms.reshape(-1, 4, 4)
        mv_s = camera.view[None] @ tfs                        # [S, 4, 4]
        m_s = jnp.einsum("ij,sjk->sik", camera.proj, mv_s)    # [S, 4, 4]
        b_s = jnp.einsum("sjk,jl->skl", m_s, ndc2pix)         # [S, 4, 3]

        def bb(i, j):
            return b_s[:, i, j][scene_ids]

        def mv(i, j):
            return mv_s[:, i, j][scene_ids]

        inv_tf_s = jnp.linalg.inv(tfs)
        local_cam_s = (inv_tf_s[:, :3, :3] @ camera.cam_pos
                       + inv_tf_s[:, :3, 3])
        dirs = math3d.normalize(means - local_cam_s[scene_ids])
    else:
        scene_ids = None
        mv1 = camera.view
        m1 = camera.proj @ mv1
        b1 = jnp.einsum("jk,jl->kl", m1, ndc2pix)             # [4, 3]

        def bb(i, j):
            return b1[i, j]

        def mv(i, j):
            return mv1[i, j]

        dirs = math3d.normalize(means - camera.cam_pos)

    # view-space center + clip cull (elementwise, like the 3D path)
    vx = mv(0, 0) * mx + mv(0, 1) * my + mv(0, 2) * mz + mv(0, 3)
    vy = mv(1, 0) * mx + mv(1, 1) * my + mv(1, 2) * mz + mv(1, 3)
    vz = mv(2, 0) * mx + mv(2, 1) * my + mv(2, 2) * mz + mv(2, 3)
    pr = camera.proj
    clip_z = pr[2, 0] * vx + pr[2, 1] * vy + pr[2, 2] * vz + pr[2, 3]
    clip_x = pr[0, 0] * vx + pr[0, 1] * vy + pr[0, 2] * vz + pr[0, 3]
    clip_y = pr[1, 0] * vx + pr[1, 1] * vy + pr[1, 2] * vz + pr[1, 3]
    clip_w = pr[3, 0] * vx + pr[3, 1] * vy + pr[3, 2] * vz + pr[3, 3]
    lim = CLIP_FACTOR * clip_w
    visible = ((clip_z >= -lim) & (clip_x >= -lim) & (clip_x <= lim)
               & (clip_y >= -lim) & (clip_y <= lim))

    # L = R S columns 0/1, elementwise quaternion algebra
    q = splats.quats
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    qx, qy, qz, qw = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    s0, s1 = splats.scales[:, 0], splats.scales[:, 1]
    l0x = (1 - 2 * (qy * qy + qz * qz)) * s0
    l0y = (2 * (qx * qy + qw * qz)) * s0
    l0z = (2 * (qx * qz - qw * qy)) * s0
    l1x = (2 * (qx * qy - qw * qz)) * s1
    l1y = (1 - 2 * (qx * qx + qz * qz)) * s1
    l1z = (2 * (qy * qz + qw * qx)) * s1

    # t[i][j] = a_i . B[:, j]; rows of a: (l0,0), (l1,0), (mean,1)
    t_rows = []
    for (ax, ay, az, aw_) in ((l0x, l0y, l0z, None), (l1x, l1y, l1z, None),
                              (mx, my, mz, 1.0)):
        for j in range(3):
            v = ax * bb(0, j) + ay * bb(1, j) + az * bb(2, j)
            if aw_ is not None:
                v = v + bb(3, j)
            t_rows.append(v)
    (t00, t01, t02, t10, t11, t12, t20, t21, t22) = t_rows

    # screen AABB from the homography (SplatMaterial2D.js:165-187)
    distance = t02 * t02 + t12 * t12 - t22 * t22
    ok = jnp.abs(distance) >= 1e-5
    inv_d = 1.0 / jnp.where(ok, distance, 1.0)
    f0, f1, f2 = inv_d, inv_d, -inv_d
    cx = f0 * t00 * t02 + f1 * t10 * t12 + f2 * t20 * t22
    cy = f0 * t01 * t02 + f1 * t11 * t12 + f2 * t21 * t22
    tmp_x = f0 * t00 * t00 + f1 * t10 * t10 + f2 * t20 * t20
    tmp_y = f0 * t01 * t01 + f1 * t11 * t11 + f2 * t21 * t21
    ext_x = jnp.sqrt(jnp.maximum(1e-4, cx * cx - tmp_x))
    ext_y = jnp.sqrt(jnp.maximum(1e-4, cy * cy - tmp_y))
    s = cfg.splat_scale
    max_ext = float(cfg.max_screen_space_splat_size)
    rx = jnp.minimum(3.0 * ext_x * s, max_ext)
    ry = jnp.minimum(3.0 * ext_y * s, max_ext)
    # 1/16-px ceil quantization: exact in the u16 sort packing, lossless
    # for the hard cutoff (see projection._eval_covariance2d)
    rx = jnp.minimum(jnp.ceil(rx * 16.0) * (1.0 / 16.0), 4095.9375)
    ry = jnp.minimum(jnp.ceil(ry * 16.0) * (1.0 / 16.0), 4095.9375)

    color = eval_sh_color(splats.colors[:, :3], splats.sh, dirs,
                          cfg.sh_degree)
    opacity = splats.colors[:, 3]
    if scene_ids is not None and scene_opacities is not None:
        sc_op = scene_opacities[scene_ids]
        if scene_visibility is not None:
            sc_op = sc_op * scene_visibility[scene_ids].astype(sc_op.dtype)
        visible = visible & (sc_op > 0.01)
        opacity = opacity * sc_op

    mask = visible & ok & (opacity >= cfg.min_alpha)
    depth = jnp.where(mask, clip_z, jnp.inf)
    opacity = jnp.where(mask, opacity, 0.0)
    rx = jnp.where(mask, rx, 0.0)
    ry = jnp.where(mask, ry, 0.0)
    return SurfelProjection(
        t=(t00, t01, t02, t10, t11, t12, t20, t21, t22),
        mean2d=jnp.stack([cx, cy], axis=1),
        radius=jnp.stack([rx, ry], axis=1),
        color=color, opacity=opacity, depth=depth, mask=mask)


def bin_sort_surfels(sp: SurfelProjection, cfg: RenderConfig,
                     tile_range: tuple | None = None,
                     depth_bounds: tuple | None = None,
                     aux_capacity: int | None = None,
                     row_window: tuple | None = None):
    """Fused expand+sort for surfel records (the fields ride the sort).

    Returns (recs [S, 17] — or [S, 18] with cfg.return_depth's extra
    channel column — tile_starts, tile_counts, total, overflow) in the
    `rasterize_surfel` record-table layout.  ``row_window``: round-robin
    tile-row slab (binning.tile_bounds_strided; local tile ids).
    """
    from .binning import tile_bounds, tile_bounds_strided

    if row_window is not None:
        assert tile_range is None, "row_window replaces tile_range"
        row_start, row_stride, rows_per = row_window
        tile_lo = 0
        num_tiles = rows_per * cfg.tiles_x

        def bounds_fn(p):
            return tile_bounds_strided(p, cfg, row_start, row_stride,
                                       rows_per)
    else:
        if tile_range is None:
            tile_lo, num_tiles = 0, cfg.num_tiles
            ty_lo, ty_hi = 0, cfg.tiles_y
        else:
            tile_lo, num_tiles = tile_range
            ty_lo = tile_lo // cfg.tiles_x
            ty_hi = ty_lo + num_tiles // cfg.tiles_x

        def bounds_fn(p):
            return tile_bounds(p, cfg, ty_lo, ty_hi)

    n = sp.opacity.shape[0]
    if aux_capacity is None:
        _, aux_capacity, _ = slot_layout_for(cfg, n)
    tx0, tx1, ty0, ty1, counts = bounds_fn(sp)
    depth_q = quantize_depth(sp.depth, sp.mask, cfg.sort_bits, depth_bounds)
    wt = tx1 - tx0 + 1
    ht = ty1 - ty0 + 1

    si = jax.lax.stop_gradient
    prr = _pack_u16_pair(si(sp.radius[:, 0]), si(sp.radius[:, 1]))
    chan = [sp.color[:, 0], sp.color[:, 1], sp.color[:, 2]]
    if cfg.return_depth:
        # depth as a 4th channel column (alpha-weighted mean depth, the
        # same re-design as the 3D path); culled splats carry +inf -> 0.
        chan.append(jnp.where(sp.mask, sp.depth, 0.0))
    fields = sp.t + (sp.mean2d[:, 0], sp.mean2d[:, 1],
                     *chan, sp.opacity, prr)
    n_diff = 12 + len(chan)           # t(9) + center2d(2) + chan + opacity
    oi = 11 + len(chan)               # opacity field index
    if cfg.record_precision == "f32":
        plan = None
    else:
        # color/opacity ride as f16 pairs (same fidelity argument as the 3D
        # path: the reference's color texture is u8); the homography columns
        # stay exact — they define fragment geometry.
        plan = tuple(("raw", i) for i in range(11)) + (
            ("f16", 11, 12), ("f16", 13, oi)) + (
            (("raw", 14),) if len(chan) == 4 else ()) + (("raw", oi + 1),)
    out = _expand_sort(cfg, num_tiles, aux_capacity, n_diff, plan,
                       jnp.asarray(tile_lo, jnp.int32), depth_q,
                       tx0, ty0, wt, ht, counts, *fields)
    sorted_fields = out[:n_diff + 1]
    pair_valid, starts, tcounts, total, overflow = out[n_diff + 1:]
    rxs, rys = _unpack_u16_pair(sorted_fields[n_diff])
    opas = jnp.where(pair_valid, sorted_fields[n_diff - 1], 0.0)
    recs = jnp.stack(list(sorted_fields[:n_diff - 1]) + [opas, rxs, rys],
                     axis=1)
    return recs, starts, tcounts, total, overflow


def composite_surfels_sorted(cfg: RenderConfig, recs, starts, tcounts,
                             tile_base, num_tiles: int):
    """Backend dispatch for the surfel tile compositor (the 2D analogue of
    pipeline.composite_sorted).  ``tile_base``/``num_tiles`` follow the
    tile-sharded slab contract (tile ids are pixel-global)."""
    from .pipeline import resolve_backend

    if resolve_backend(cfg) == "pallas":
        from .pallas_surfel import (
            composite_surfel_tiles_pallas, pack_surfel_records)
        from .rasterize import tile_ids_from_base
        packed = pack_surfel_records(recs)
        tile_ids = tile_ids_from_base(num_tiles, tile_base)
        return composite_surfel_tiles_pallas(
            cfg, recs.shape[0], packed, starts, tcounts, tile_ids)
    from .rasterize_surfel import composite_surfel_tiles
    return composite_surfel_tiles(
        cfg, recs.shape[0], recs, starts, tcounts, tile_base)


def render_2d_tiled(splats: SplatData, camera: Camera, cfg: RenderConfig,
                    transforms: jnp.ndarray | None = None,
                    scene_indices: jnp.ndarray | None = None,
                    scene_opacities: jnp.ndarray | None = None,
                    scene_visibility: jnp.ndarray | None = None,
                    return_aux: bool = False):
    """Tiled 2DGS render — the scalable 2D-mode fast path."""
    from .pipeline import assemble_image, chans_from_colors_logt

    sp = project_surfels(splats, camera, cfg, transforms, scene_indices,
                         scene_opacities, scene_visibility)
    recs, starts, tcounts, total, overflow = bin_sort_surfels(sp, cfg)
    tile_colors, tile_logtrans = composite_surfels_sorted(
        cfg, recs, starts, tcounts, 0, cfg.num_tiles)
    out = assemble_image(chans_from_colors_logt(tile_colors, tile_logtrans),
                         cfg)
    if return_aux:
        out["num_pairs"] = total
        out["overflow"] = overflow
    return out
