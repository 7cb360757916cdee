"""Splat projection: 3D Gaussian -> screen-space Gaussian (EWA approximation).

Re-implements, as a single fused vectorized JAX function, what the reference
does per-vertex in GLSL (/root/reference/src/splatmesh/SplatMaterial3D.js:80-214
and SplatMaterial.js:112-342):

1. model -> view -> clip transform with a 1.2*w clip-space cull
2. 3D covariance Sigma = (R S)(R S)^T (optionally transformed per scene)
3. EWA Jacobian J (perspective, SplatMaterial3D.js:121-127; or orthographic,
   :112-116); 2D covariance Sigma' = (J M) Sigma (J M)^T where M is the 3x3
   model-view block
4. 2D kernel dilation (+kernel2DSize on the diagonal) and the optional
   antialiasing opacity compensation sqrt(det_orig / det_blur)
   (SplatMaterial3D.js:137-151)
5. 2x2 eigen decomposition with the max(0.1, ...) discriminant guard, basis
   extents sqrt(8 * lambda) clamped to maxScreenSpaceSplatSize and scaled by
   splatScale (SplatMaterial3D.js:174-196)
6. spherical-harmonics view-dependent color (SplatMaterial.js:263-342)
7. depth key = third row of the model-view-projection times the center, the
   same quantity the WASM sorter uses (/root/reference/src/worker/sorter.cpp)

The rasterizer evaluates Gaussians with the *conic* (inverse 2D covariance)
instead of the reference's eigen-basis quad coordinates — mathematically the
same Gaussian exp(-0.5 * d^T Sigma'^-1 d) with the same cutoff at 8 = (sqrt(8)
sigma)^2.  `splat_scale` scales the splat spatially, which for the conic means
Sigma_eval = splat_scale^2 * Sigma_dilated.

Pixel coordinates are GL-oriented (origin bottom-left, y up); the compositor
flips rows when emitting the final image array.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..constants import (
    CLIP_FACTOR,
    EIGENVALUE_GUARD,
    POINT_CLOUD_EIGENVALUE,
    SQRT8,
)
from ..core import math3d
from ..core.covariance import covariance6_elements, quadratic_form6
from ..core.sh import eval_sh_color
from ..core.types import Camera, RenderConfig, SplatData, derive_focal


@jax.tree_util.register_dataclass
@dataclass
class ProjectedSplats:
    """Per-splat screen-space quantities (a JAX pytree).

    Every field is a FLAT [N] array: XLA:TPU lane-pads [N, k] arrays with
    k << 128 to full (8, 128) register tiles, so the stacked [N, 2]/[N, 3]
    form this replaced cost a measured ~30 ms/frame of pure layout-copy
    churn at 2M splats across the projection -> binning custom-vjp
    boundary.  The ``mean2d``/``conic``/``color``/``radius`` properties
    provide the stacked views for oracles/tests; hot paths consume the
    flat fields directly.

    Culled splats have ``opacity == 0`` and ``rx == ry == 0`` so they bin
    nowhere and contribute nothing.
    """

    xs: jnp.ndarray        # [N] pixel x (GL orientation, y up)
    ys: jnp.ndarray        # [N] pixel y
    conic_a: jnp.ndarray   # [N] G = a dx^2 + 2 b dx dy + c dy^2
    conic_b: jnp.ndarray   # [N]
    conic_c: jnp.ndarray   # [N]
    col_r: jnp.ndarray     # [N] view-dependent RGB
    col_g: jnp.ndarray     # [N]
    col_b: jnp.ndarray     # [N]
    opacity: jnp.ndarray   # [N]
    depth: jnp.ndarray     # [N] clip-space z (pre-divide), +inf when culled
    rx: jnp.ndarray        # [N] conservative pixel AABB half-extent x
    ry: jnp.ndarray        # [N]
    mask: jnp.ndarray      # [N] bool visibility

    @property
    def mean2d(self) -> jnp.ndarray:
        return jnp.stack([self.xs, self.ys], axis=1)

    @property
    def conic(self) -> jnp.ndarray:
        return jnp.stack([self.conic_a, self.conic_b, self.conic_c], axis=1)

    @property
    def color(self) -> jnp.ndarray:
        return jnp.stack([self.col_r, self.col_g, self.col_b], axis=1)

    @property
    def radius(self) -> jnp.ndarray:
        return jnp.stack([self.rx, self.ry], axis=1)


def _eval_covariance2d(a0, b0, c0, cfg: RenderConfig):
    """Dilate the 2x2 covariance and compute compensation + eigen extents.

    Takes and returns FLAT [N] triples (see the ProjectedSplats layout
    note).  Returns ((a, b, c) evaluated covariance incl. splat_scale^2,
    compensation, (ax, ay), valid) where (ax, ay) are the per-axis 1-sigma
    pixel extents sqrt(Sigma_xx), sqrt(Sigma_yy) of the *evaluated*
    covariance — :func:`project_splats` assembles the support box from
    them once the final opacity is known (opacity-tightened cutoff)."""
    det_orig = a0 * c0 - b0 * b0
    a = a0 + cfg.kernel_2d_size
    c = c0 + cfg.kernel_2d_size
    b = b0
    det_blur = a * c - b * b
    if cfg.antialiased:
        compensation = jnp.sqrt(jnp.maximum(det_orig / det_blur, 0.0))
    else:
        compensation = jnp.ones_like(det_orig)

    half_trace = 0.5 * (a + c)
    term2 = jnp.sqrt(jnp.maximum(EIGENVALUE_GUARD,
                                 half_trace * half_trace - det_blur))
    lam1 = half_trace + term2
    lam2 = half_trace - term2
    if cfg.point_cloud_mode:
        # Point-cloud mode overrides the eigenvalues *before* the lambda2
        # cull (SplatMaterial3D.js:184-188), so nothing is culled here.
        lam1 = jnp.full_like(lam1, POINT_CLOUD_EIGENVALUE)
        lam2_eval = jnp.full_like(lam2, POINT_CLOUD_EIGENVALUE)
        valid = jnp.ones_like(lam2, dtype=bool)
    else:
        lam2_eval = lam2
        valid = lam2 > 0.0

    del lam1  # the eigen pair is only needed for the lam2 > 0 cull
    s = cfg.splat_scale

    if cfg.point_cloud_mode:
        # Both eigenvalues forced to a constant => isotropic evaluation.
        pc = POINT_CLOUD_EIGENVALUE
        a_eval = jnp.full_like(a, pc)
        b_eval = jnp.zeros_like(b)
        c_eval = jnp.full_like(c, pc)
    else:
        a_eval, b_eval, c_eval = a, b, c
    s2 = s * s
    cov_eval = (a_eval * s2, b_eval * s2, c_eval * s2)

    ax = jnp.sqrt(jnp.maximum(a_eval, 0.0)) * s
    ay = jnp.sqrt(jnp.maximum(c_eval, 0.0)) * s
    return cov_eval, compensation, (ax, ay), valid


def support_radius(ax, ay, opacity, cfg: RenderConfig):
    """Flat [N] (rx, ry) support-box half-extents from 1-sigma extents +
    final opacity.

    The box is the AABB of the G = G_eff ellipse of the evaluated
    covariance, (sqrt(G_eff Sigma_xx), sqrt(G_eff Sigma_yy)), where
    G_eff = min(GAUSSIAN_CUTOFF, 2 ln(opacity / min_alpha)): beyond that
    contour the fragment alpha falls below min_alpha and every compositor
    path zeroes it anyway, so the OPACITY-TIGHTENED box is lossless while
    shrinking low-opacity splats' pair/fragment footprint (the reference
    sizes quads at sqrt(8) unconditionally, SplatMaterial3D.js:189-196 —
    its fragment discard achieves the same pixels, at fragment cost).

    The max-screen-size clamp truncates the support like the reference's
    clamped quad.  Quantized to 1/16 px rounding UP (a larger box only
    admits pixels the alpha cutoffs reject, and the value is exact in the
    u16 fixed point the sort pipeline packs).  Both binning and the
    compositors consume this same value, so the box contract stays exact.
    No gradient flows through the box (hard-cutoff contract): callers
    stop_gradient it, matching the reference's clamped-quad semantics.
    """
    from ..constants import GAUSSIAN_CUTOFF
    if cfg.min_alpha > 0.0:
        g_eff = jnp.clip(
            2.0 * jnp.log(jnp.maximum(opacity, cfg.min_alpha)
                          / cfg.min_alpha), 0.0, GAUSSIAN_CUTOFF)
        r_fac = jnp.sqrt(g_eff)
    else:
        r_fac = SQRT8
    max_ext = cfg.max_screen_space_splat_size * cfg.splat_scale
    rx = jnp.minimum(r_fac * ax, max_ext)
    ry = jnp.minimum(r_fac * ay, max_ext)
    rx = jnp.minimum(jnp.ceil(rx * 16.0) * (1.0 / 16.0), 4095.9375)
    ry = jnp.minimum(jnp.ceil(ry * 16.0) * (1.0 / 16.0), 4095.9375)
    return rx, ry


def conic_from_cov(a, b, c):
    """Invert symmetric 2x2 covariances given as flat (a, b, c) triples."""
    det = a * c - b * b
    inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
    return c * inv_det, -b * inv_det, a * inv_det


def project_splats(splats: SplatData, camera: Camera, cfg: RenderConfig,
                   transforms: jnp.ndarray | None = None,
                   scene_indices: jnp.ndarray | None = None,
                   scene_opacities: jnp.ndarray | None = None,
                   scene_visibility: jnp.ndarray | None = None,
                   fade_params: tuple | None = None,
                   ) -> ProjectedSplats:
    """Project all splats for one camera.

    Args:
      transforms: optional ``[S, 4, 4]`` per-scene model transforms
        (dynamic-mode parity with SplatMaterial.js:140-147).
      scene_indices: ``[N] int32`` mapping splats to scenes (required when
        `transforms` is given and S > 1).
      scene_opacities / scene_visibility: optional ``[S]`` per-scene opacity
        multiplier and visibility mask (enableOptionalEffects parity,
        SplatMaterial.js:129-138).
      fade_params: optional ``(scene_center [3], fade_start_radius [])``
        scene-reveal fade-in: opacity ramps to 0 over 0.75 world units past
        the fade radius, exactly the reference's fade shader
        (SplatMaterial.js:347-363); the radius animates host-side
        (viewer.fade.VisibleRegion).
    """
    n = splats.num_splats
    w, h = cfg.width, cfg.height
    focal = derive_focal(camera.proj, w, h) * cfg.focal_adjustment

    # NOTE on shapes: everything downstream stays in flat [N]/[N, 3]
    # vectors.  XLA pads small trailing dims ([N, 3, 3], [N, 4, 4]) to full
    # register tiles — a 32-57x HBM blowup that OOMs multi-million-splat
    # scenes — so per-scene 4x4 math happens on the tiny [S, 4, 4] arrays
    # and reaches the splats via row gathers.
    means = splats.means
    if transforms is not None:
        if scene_indices is None:
            scene_ids = jnp.zeros((n,), jnp.int32)
        else:
            scene_ids = scene_indices
        tfs = transforms.reshape(-1, 4, 4)
        mv_s = camera.view[None] @ tfs                   # [S, 4, 4] (tiny)

        def mv(i, j):
            # one model-view entry, gathered per splat: [N] from [S]
            return mv_s[:, i, j][scene_ids]

        mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
        vx = mv(0, 0) * mx + mv(0, 1) * my + mv(0, 2) * mz + mv(0, 3)
        vy = mv(1, 0) * mx + mv(1, 1) * my + mv(1, 2) * mz + mv(1, 3)
        vz = mv(2, 0) * mx + mv(2, 1) * my + mv(2, 2) * mz + mv(2, 3)
        # SH view directions are evaluated in model-local space:
        # normalize(center - inverse(transform) * cameraPosition)
        # (SplatMaterial.js:179-187) — inverses on the [S] scene axis.
        inv_tf_s = jnp.linalg.inv(tfs)                   # [S, 4, 4] (tiny)
        local_cam_s = (inv_tf_s[:, :3, :3] @ camera.cam_pos
                       + inv_tf_s[:, :3, 3])             # [S, 3]
        dirs = math3d.normalize(means - local_cam_s[scene_ids])
        m3e = [[mv(i, j) for j in range(3)] for i in range(3)]
    else:
        scene_ids = None
        m3 = camera.view[:3, :3]
        m3e = [[m3[i, j] for j in range(3)] for i in range(3)]
        # Elementwise [N] transform — NOT a [N,3]@[3,3] matmul: XLA lowers
        # f32 MXU dots to bf16 passes by default on TPU, which costs ~0.5 px
        # of mean2d accuracy and makes two compilations of this function
        # disagree with each other (fusion-dependent rounding).
        mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
        vx = (m3e[0][0] * mx + m3e[0][1] * my + m3e[0][2] * mz
              + camera.view[0, 3])
        vy = (m3e[1][0] * mx + m3e[1][1] * my + m3e[1][2] * mz
              + camera.view[1, 3])
        vz = (m3e[2][0] * mx + m3e[2][1] * my + m3e[2][2] * mz
              + camera.view[2, 3])
        dirs = math3d.normalize(means - camera.cam_pos)

    # Same elementwise rule for the projection transform (see note above).
    pr = camera.proj
    clip_x = pr[0, 0] * vx + pr[0, 1] * vy + pr[0, 2] * vz + pr[0, 3]
    clip_y = pr[1, 0] * vx + pr[1, 1] * vy + pr[1, 2] * vz + pr[1, 3]
    clip_z = pr[2, 0] * vx + pr[2, 1] * vy + pr[2, 2] * vz + pr[2, 3]
    clip_w = pr[3, 0] * vx + pr[3, 1] * vy + pr[3, 2] * vz + pr[3, 3]
    lim = CLIP_FACTOR * clip_w
    visible = ((clip_z >= -lim) & (clip_x >= -lim) & (clip_x <= lim)
               & (clip_y >= -lim) & (clip_y <= lim))

    safe_w = jnp.where(jnp.abs(clip_w) < 1e-9, 1e-9, clip_w)
    xs = (clip_x / safe_w + 1.0) * (0.5 * w)
    ys = (clip_y / safe_w + 1.0) * (0.5 * h)

    # --- EWA 2D covariance --- (flat elementwise; no [N, 3, 3] tensors)
    cov6 = covariance6_elements(splats.scales, splats.quats)
    if cfg.orthographic:
        # J = diag(fx, fy): pixels per world unit (SplatMaterial3D.js:112-116).
        u = tuple(focal[0] * m3e[0][j] for j in range(3))
        v = tuple(focal[1] * m3e[1][j] for j in range(3))
    else:
        z = jnp.where(jnp.abs(vz) < 1e-6, 1e-6, vz)
        inv_z = 1.0 / z
        x, y = vx, vy
        # Rows of J (first two; third row is zero and drops out):
        # [fx/z, 0, -fx x / z^2], [0, fy/z, -fy y / z^2]
        j00 = focal[0] * inv_z
        j02 = -focal[0] * x * inv_z * inv_z
        j11 = focal[1] * inv_z
        j12 = -focal[1] * y * inv_z * inv_z
        # rows of J[:2] @ M3, each component a flat [N] array
        u = tuple(j00 * m3e[0][j] + j02 * m3e[2][j] for j in range(3))
        v = tuple(j11 * m3e[1][j] + j12 * m3e[2][j] for j in range(3))

    cov_eval, compensation, (ax, ay), eig_valid = _eval_covariance2d(
        quadratic_form6(cov6, u, u), quadratic_form6(cov6, u, v),
        quadratic_form6(cov6, v, v), cfg)
    conic_a, conic_b, conic_c = conic_from_cov(*cov_eval)

    color = eval_sh_color(splats.colors[:, :3], splats.sh, dirs, cfg.sh_degree)
    opacity = splats.colors[:, 3] * compensation
    if fade_params is not None:
        # distanceLoadFadeInFactor (SplatMaterial.js:352-358): full opacity
        # inside the fade radius, linear ramp to 0 over FADE_DISTANCE past it.
        fade_center, fade_radius = fade_params
        center_dist = jnp.linalg.norm(
            splats.means - jnp.asarray(fade_center, jnp.float32)[None, :],
            axis=-1)
        ramp = 1.0 - jnp.clip((center_dist - fade_radius) / 0.75, 0.0, 1.0)
        opacity = opacity * jnp.where(center_dist < fade_radius, 1.0, ramp)
    if scene_ids is not None and scene_opacities is not None:
        sc_op = scene_opacities[scene_ids]
        if scene_visibility is not None:
            sc_op = sc_op * scene_visibility[scene_ids].astype(sc_op.dtype)
        visible = visible & (sc_op > 0.01)
        opacity = opacity * sc_op
    if cfg.antialiased:
        visible = visible & (opacity >= cfg.min_alpha)
    visible = visible & eig_valid & (opacity >= cfg.min_alpha)

    depth = jnp.where(visible, clip_z, jnp.inf)
    opacity = jnp.where(visible, opacity, 0.0)
    # Support box from the FINAL opacity (hard cutoff, gradient-free).
    rx, ry = support_radius(ax, ay, jax.lax.stop_gradient(opacity), cfg)
    rx = jnp.where(visible, rx, 0.0)
    ry = jnp.where(visible, ry, 0.0)

    return ProjectedSplats(xs=xs, ys=ys,
                           conic_a=conic_a, conic_b=conic_b, conic_c=conic_c,
                           col_r=color[:, 0], col_g=color[:, 1],
                           col_b=color[:, 2],
                           opacity=opacity, depth=depth, rx=rx, ry=ry,
                           mask=visible)


def quantize_depth(depth: jnp.ndarray, mask: jnp.ndarray,
                   bits: int, bounds: tuple | None = None) -> jnp.ndarray:
    """Map depths to integer buckets exactly like the WASM sorter's range map
    (sorter.cpp:142-149): bucket = (d - min) * (2^bits - 1) / (max - min).

    Invisible splats get the maximum bucket so they sort last.
    ``bounds`` overrides the (min, max) range — sharded callers pass
    globally-reduced bounds so every shard buckets identically.
    """
    if bounds is not None:
        dmin, dmax = bounds
    else:
        big = jnp.float32(3.0e38)
        dmin = jnp.min(jnp.where(mask, depth, big))
        dmax = jnp.max(jnp.where(mask, depth, -big))
    span = jnp.maximum(dmax - dmin, 1e-20)
    nbuckets = (1 << bits) - 1
    q = jnp.floor((depth - dmin) * (nbuckets / span)).astype(jnp.int32)
    q = jnp.clip(q, 0, nbuckets)
    return jnp.where(mask, q, nbuckets)
