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

This path composites globally depth-sorted splats over all pixels in
checkpointed chunks (like the oracle renderer) — correct and differentiable
end-to-end; a tiled Pallas variant can slot in behind the same interface.
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
_RHO_CUTOFF = 2.0 * jnp.log(255.0 * 0.99)   # alpha cutoff in rho units


def project_splats_2d(splats: SplatData, camera: Camera, cfg: RenderConfig,
                      transforms: jnp.ndarray | None = None,
                      scene_indices: jnp.ndarray | None = None,
                      scene_opacities: jnp.ndarray | None = None,
                      scene_visibility: jnp.ndarray | None = None):
    """Per-splat homography + screen bounds for the 2D mode.

    Returns dict of [N, ...] arrays: T (3x3 rows Tu/Tv/Tw), center2d,
    radius, color, opacity, depth, mask.
    """
    n = splats.num_splats
    w, h = cfg.width, cfg.height

    means = splats.means
    if transforms is not None:
        if scene_indices is None:
            scene_indices = jnp.zeros((n,), jnp.int32)
        per_tf = transforms[scene_indices]
        mv = camera.view[None] @ per_tf                      # [N, 4, 4]
        inv_tf = jnp.linalg.inv(per_tf)
        local_cam = jnp.einsum("nij,j->ni", inv_tf[:, :3, :3],
                               camera.cam_pos) + inv_tf[:, :3, 3]
        dirs = math3d.normalize(means - local_cam)
    else:
        mv = jnp.broadcast_to(camera.view[None], (n, 4, 4))
        dirs = math3d.normalize(means - camera.cam_pos)

    # clip-space cull + depth (same as the 3D path)
    view_center = jnp.einsum("nij,nj->ni", mv[:, :3, :3], means) \
        + mv[:, :3, 3]
    clip = view_center @ camera.proj[:3, :3].T + camera.proj[:3, 3]
    clip_w = view_center @ camera.proj[3, :3] + camera.proj[3, 3]
    lim = CLIP_FACTOR * clip_w
    visible = ((clip[:, 2] >= -lim) & (clip[:, 0] >= -lim)
               & (clip[:, 0] <= lim) & (clip[:, 1] >= -lim)
               & (clip[:, 1] <= lim))

    # L = R S; splat2world rows (L col0 | 0), (L col1 | 0), (center | 1)
    rot = math3d.quat_to_rotmat(splats.quats)
    ls = rot * splats.scales[:, None, :]                     # [N, 3, 3]
    a = jnp.zeros((n, 3, 4), jnp.float32)
    a = a.at[:, 0, :3].set(ls[:, :, 0])
    a = a.at[:, 1, :3].set(ls[:, :, 1])
    a = a.at[:, 2, :3].set(means)
    a = a.at[:, 2, 3].set(1.0)

    world2ndc = jnp.einsum("ij,njk->nik", camera.proj, mv)   # [N, 4, 4]
    ndc2pix = jnp.array([
        [w / 2.0, 0.0, 0.0],
        [0.0, h / 2.0, 0.0],
        [0.0, 0.0, 0.0],
        [w / 2.0, h / 2.0, 1.0]], jnp.float32)               # [4, 3]
    t_mat = jnp.einsum("nij,njk,kl->nil", a,
                       world2ndc.transpose(0, 2, 1), ndc2pix)  # [N, 3, 3]

    # GLSL T[i] is COLUMN i: Tu/Tv/Tw are the columns of the 3x3.
    t0, t1, t3 = t_mat[:, :, 0], t_mat[:, :, 1], t_mat[:, :, 2]
    sign = jnp.array([1.0, 1.0, -1.0], jnp.float32)
    distance = jnp.sum(t3 * t3 * sign, axis=1)
    ok = jnp.abs(distance) >= 1e-5
    f = sign[None, :] / jnp.where(ok, distance, 1.0)[:, None]
    center2d = jnp.stack([jnp.sum(f * t0 * t3, axis=1),
                          jnp.sum(f * t1 * t3, axis=1)], axis=1)
    temp = jnp.stack([jnp.sum(f * t0 * t0, axis=1),
                      jnp.sum(f * t1 * t1, axis=1)], axis=1)
    half_extend = center2d * center2d - temp
    extent = jnp.sqrt(jnp.maximum(1e-4, half_extend))
    radius = 3.0 * extent * cfg.splat_scale

    color = eval_sh_color(splats.colors[:, :3], splats.sh, dirs,
                          cfg.sh_degree)
    opacity = splats.colors[:, 3]
    if scene_indices is not None and scene_opacities is not None:
        sc_op = scene_opacities[scene_indices]
        if scene_visibility is not None:
            sc_op = sc_op * scene_visibility[scene_indices].astype(
                sc_op.dtype)
        visible = visible & (sc_op > 0.01)
        opacity = opacity * sc_op

    mask = visible & ok & (opacity >= cfg.min_alpha)
    depth = jnp.where(mask, clip[:, 2], jnp.inf)
    opacity = jnp.where(mask, opacity, 0.0)
    return {
        "t": t_mat, "center2d": center2d, "radius": radius,
        "color": color, "opacity": opacity, "depth": depth, "mask": mask,
    }


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
    """Full-image 2DGS render (globally sorted, chunk-checkpointed)."""
    proj = project_splats_2d(splats, camera, cfg, transforms, scene_indices,
                             scene_opacities, scene_visibility)
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

    init = (jnp.zeros((p, 3), jnp.float32), jnp.ones((p,), jnp.float32))
    (color_acc, trans), _ = jax.lax.scan(jax.checkpoint(body), init, chunks)

    bg = jnp.asarray(cfg.background, jnp.float32)
    color_img = color_acc + trans[:, None] * bg[None, :]
    return {
        "color": color_img.reshape(cfg.height, cfg.width, 3),
        "alpha": (1.0 - trans).reshape(cfg.height, cfg.width),
    }
