"""Independent NumPy re-implementation of the reference render loop.

This is a deliberate 1:1 port of the reference's GLSL vertex/fragment math
and WASM sort semantics, written directly from the shader source with NO
code shared with ``gaussiansplats3d_tpu`` (SURVEY.md §4's "CPU reference
re-implementation" oracle; VERDICT round-1 item 2).  Any bug in the
package's projection (Jacobian orientation, focal derivation, antialias
compensation, SH evaluation, y-flip) shows up as a mismatch against this
file rather than cancelling out.

Ported semantics, with citations:

- clip cull at 1.2 * w             /root/reference/src/splatmesh/SplatMaterial.js:160-164
- covariance Sigma = R S (R S)^T   /root/reference/src/loaders/SplatBuffer.js:440-486
- EWA Jacobian + cov2D             /root/reference/src/splatmesh/SplatMaterial3D.js:111-135
- kernel2D dilation + antialias    /root/reference/src/splatmesh/SplatMaterial3D.js:137-151
- 2x2 eigen basis, sqrt8, clamp    /root/reference/src/splatmesh/SplatMaterial3D.js:152-196
- quad rasterize + falloff         /root/reference/src/splatmesh/SplatMaterial3D.js:198-252
- SH degree 1/2 evaluation         /root/reference/src/splatmesh/SplatMaterial.js:263-342
- depth distance-map sort          /root/reference/src/worker/sorter.cpp:128-167
- NormalBlending back-to-front     /root/reference/src/splatmesh/SplatMaterial3D.js:65-75

Pixel convention: GL viewport (y up, pixel centers at +0.5); the returned
image array has row 0 at the TOP (flipped at the end), matching the
package's output convention.
"""

from __future__ import annotations

import numpy as np

SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)


def _quat_rot_xyzw(q):
    """Rotation matrices [N, 3, 3] from (x, y, z, w) quaternions.

    Standard Hamilton convention (three.js Quaternion -> Matrix4 semantics,
    the rotation the reference bakes into its covariance at
    SplatBuffer.js:440-486 via THREE.Matrix4().makeRotationFromQuaternion).
    """
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = np.empty((q.shape[0], 3, 3), np.float64)
    r[:, 0, 0] = 1 - 2 * (y * y + z * z)
    r[:, 0, 1] = 2 * (x * y - w * z)
    r[:, 0, 2] = 2 * (x * z + w * y)
    r[:, 1, 0] = 2 * (x * y + w * z)
    r[:, 1, 1] = 1 - 2 * (x * x + z * z)
    r[:, 1, 2] = 2 * (y * z - w * x)
    r[:, 2, 0] = 2 * (x * z - w * y)
    r[:, 2, 1] = 2 * (y * z + w * x)
    r[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return r


def _eval_sh(base_rgb, sh, dirs, degree):
    """vColor.rgb += SH bands, then clamp — SplatMaterial.js:263-342.

    ``sh`` is [N, K, 3] coefficient-major (sh1..sh8 triplets); ``dirs`` is
    the normalized worldViewDir.
    """
    rgb = base_rgb.astype(np.float64).copy()
    if degree >= 1 and sh.shape[1] >= 3:
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        sh1, sh2, sh3 = sh[:, 0], sh[:, 1], sh[:, 2]
        rgb += SH_C1 * (-sh1 * y + sh2 * z - sh3 * x)
        if degree >= 2 and sh.shape[1] >= 8:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            sh4, sh5, sh6, sh7, sh8 = (sh[:, 3], sh[:, 4], sh[:, 5],
                                       sh[:, 6], sh[:, 7])
            rgb += (SH_C2[0] * xy * sh4 + SH_C2[1] * yz * sh5
                    + SH_C2[2] * (2.0 * zz - xx - yy) * sh6
                    + SH_C2[3] * xz * sh7 + SH_C2[4] * (xx - yy) * sh8)
        rgb = np.clip(rgb, 0.0, 1.0)
    return rgb


def render_reference_numpy(means, scales, quats_xyzw, colors_rgba, sh,
                           view, proj, cam_pos, width, height,
                           sh_degree=0, kernel_2d_size=0.3,
                           antialiased=False, splat_scale=1.0,
                           max_screen_space_splat_size=1024.0,
                           sort_bits=16, min_alpha=1.0 / 255.0,
                           background=(0.0, 0.0, 0.0), exact_eigen=True):
    """Render one view.  Returns dict with color [H, W, 3], alpha [H, W]."""
    means = np.asarray(means, np.float64)
    scales = np.asarray(scales, np.float64)
    quats_xyzw = np.asarray(quats_xyzw, np.float64)
    colors_rgba = np.asarray(colors_rgba, np.float64)
    sh = np.asarray(sh, np.float64)
    view = np.asarray(view, np.float64)
    proj = np.asarray(proj, np.float64)
    cam_pos = np.asarray(cam_pos, np.float64)
    n = means.shape[0]

    # --- vertex-shader preamble: clip cull (SplatMaterial.js:156-167) ----
    mv = view  # static single scene: transformModelViewMatrix = modelView
    view_center = means @ mv[:3, :3].T + mv[:3, 3]
    clip = view_center @ proj[:3, :3].T + proj[:3, 3]
    clip_w = view_center @ proj[3, :3] + proj[3, 3]
    lim = 1.2 * clip_w
    visible = ((clip[:, 2] >= -lim) & (clip[:, 0] >= -lim)
               & (clip[:, 0] <= lim) & (clip[:, 1] >= -lim)
               & (clip[:, 1] <= lim))
    ndc = clip[:, :2] / clip_w[:, None]

    # --- SH color (worldViewDir in world space, static scene) ------------
    dirs = means - cam_pos[None, :]
    dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-12)
    rgb = _eval_sh(colors_rgba[:, :3], sh, dirs, sh_degree)
    alpha_v = colors_rgba[:, 3].copy()

    # --- Vrk = (R S)(R S)^T (SplatBuffer.js computeCovariance) -----------
    rs = _quat_rot_xyzw(quats_xyzw) * scales[:, None, :]
    vrk = rs @ rs.transpose(0, 2, 1)

    # --- Jacobian & cov2D (SplatMaterial3D.js:111-135) -------------------
    # Viewer.js:651-677: focal = 0.5 * H * proj[1][1] (and W for x).
    fx = 0.5 * width * proj[0, 0]
    fy = 0.5 * height * proj[1, 1]
    z = view_center[:, 2]
    s = 1.0 / (z * z)
    # GLSL: J = mat3(fx/z, 0, -(fx*x)*s,  0, fy/z, -(fy*y)*s,  0, 0, 0)
    # (column-major constructor: those triples are COLUMNS of J).
    j = np.zeros((n, 3, 3), np.float64)
    j[:, 0, 0] = fx / z
    j[:, 2, 0] = -(fx * view_center[:, 0]) * s
    j[:, 1, 1] = fy / z
    j[:, 2, 1] = -(fy * view_center[:, 1]) * s
    # GLSL: W = transpose(mat3(MV)); T = W * J; cov2D = T^T Vrk T.
    w_m = mv[:3, :3].T
    t_m = w_m[None] @ j
    cov2d = t_m.transpose(0, 2, 1) @ vrk @ t_m

    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    d = cov2d[:, 1, 1]
    if antialiased:
        det_orig = a * d - b * b
        a = a + kernel_2d_size
        d = d + kernel_2d_size
        det_blur = a * d - b * b
        alpha_v *= np.sqrt(np.maximum(det_orig / det_blur, 0.0))
        visible &= alpha_v >= min_alpha
    else:
        a = a + kernel_2d_size
        d = d + kernel_2d_size

    # --- eigen decomposition & basis vectors (:152-196) ------------------
    # The reference clamps the discriminant to >= 0.1 (SplatMaterial3D.js:
    # 180) and evaluates the Gaussian through the CLAMPED eigen basis, which
    # distorts small near-round splats into slivers (discriminant =
    # ((a-d)/2)^2 + b^2 < 0.1).  The package instead evaluates the exact
    # conic and uses the clamp only as the reference does for CULLING.
    # ``exact_eigen=True`` mirrors the package (exact basis, reference
    # cull); False is the literal shader behavior.
    det = a * d - b * b
    trace_over2 = 0.5 * (a + d)
    disc = trace_over2 * trace_over2 - det
    term2_guarded = np.sqrt(np.maximum(0.1, disc))
    visible &= (trace_over2 - term2_guarded) > 0.0
    if exact_eigen:
        term2 = np.sqrt(np.maximum(0.0, disc))
    else:
        term2 = term2_guarded
    eigen1 = trace_over2 + term2
    eigen2 = trace_over2 - term2
    visible &= eigen2 > 0.0

    ev1 = np.stack([b, eigen1 - a], axis=1)
    nrm = np.linalg.norm(ev1, axis=1, keepdims=True)
    # (b, eigen1 - a) degenerates to 0 for exactly axis-aligned splats
    # (GLSL normalize(vec2(0)) is undefined); the x axis IS the eigenvector.
    ev1 = np.where(nrm < 1e-12, np.array([1.0, 0.0]), ev1 / np.maximum(
        nrm, 1e-12))
    ev2 = np.stack([ev1[:, 1], -ev1[:, 0]], axis=1)
    bv1 = ev1 * splat_scale * np.minimum(
        np.sqrt(8.0) * np.sqrt(eigen1), max_screen_space_splat_size)[:, None]
    bv2 = ev2 * splat_scale * np.minimum(
        np.sqrt(8.0) * np.sqrt(eigen2), max_screen_space_splat_size)[:, None]

    # --- depth sort (sorter.cpp float path :128-149) ---------------------
    # distance = 3rd row of MVP . center; map to 2^bits buckets; stable
    # counting sort scattering back-to-front.
    mvp = proj @ mv
    dist = means @ mvp[2, :3] + mvp[2, 3]
    vis_idx = np.nonzero(visible)[0]
    if vis_idx.size:
        dv = dist[vis_idx]
        dmin, dmax = dv.min(), dv.max()
        nbuckets = (1 << sort_bits) - 1
        buckets = ((dv - dmin) * (nbuckets / max(dmax - dmin, 1e-20))
                   ).astype(np.int64)
        buckets = np.clip(buckets, 0, nbuckets)
        # sorter.cpp:158-167 iterates splats in DESCENDING index order and
        # scatters so drawing goes far-to-near with descending index within
        # equal buckets — i.e. the back-to-front draw order is exactly the
        # reverse of a stable ascending bucket sort.
        order = vis_idx[np.argsort(buckets, kind="stable")[::-1]]
    else:
        order = vis_idx

    # --- rasterize quads back-to-front (NormalBlending) ------------------
    # Fragment: vPosition in [-1,1]^2 across the quad, scaled by sqrt8;
    # A = dot(vPos, vPos) > 8 -> discard; opacity = exp(-0.5 A) * vColor.a;
    # NormalBlending: dst = src.a * src.rgb + (1 - src.a) * dst.
    img = np.zeros((height, width, 3), np.float64)
    img += np.asarray(background, np.float64)[None, None, :]
    acc_alpha = np.zeros((height, width), np.float64)

    # pixel centers in GL orientation (row 0 = bottom)
    half_wh = np.array([width * 0.5, height * 0.5])
    center_px = (ndc + 1.0) * half_wh[None, :]

    for i in order:
        bb1, bb2 = bv1[i], bv2[i]
        ext = np.abs(bb1) + np.abs(bb2)        # quad AABB half-extent (px)
        if not np.all(np.isfinite(ext)):
            continue
        cx, cy = center_px[i]
        x0 = max(int(np.floor(cx - ext[0] - 0.5)), 0)
        x1 = min(int(np.ceil(cx + ext[0] - 0.5)), width - 1)
        y0 = max(int(np.floor(cy - ext[1] - 0.5)), 0)
        y1 = min(int(np.ceil(cy + ext[1] - 0.5)), height - 1)
        if x1 < x0 or y1 < y0:
            continue
        xs = np.arange(x0, x1 + 1) + 0.5
        ys = np.arange(y0, y1 + 1) + 0.5
        dx = xs[None, :] - cx
        dy = ys[:, None] - cy
        # invert [bv1 bv2] to recover quad coords (a, b) = vPosition.xy
        det_b = bb1[0] * bb2[1] - bb1[1] * bb2[0]
        if abs(det_b) < 1e-12:
            continue
        qa = (bb2[1] * dx - bb2[0] * dy) / det_b
        qb = (-bb1[1] * dx + bb1[0] * dy) / det_b
        inside = (np.abs(qa) <= 1.0) & (np.abs(qb) <= 1.0)
        a_quad = 8.0 * (qa * qa + qb * qb)      # |sqrt8 * vPosition|^2
        inside &= a_quad <= 8.0
        frag_a = np.where(inside, np.exp(-0.5 * a_quad) * alpha_v[i], 0.0)
        # Two deliberate epsilon deviations from raw GL blending, matching
        # the package compositor so tolerances stay tight: fragments below
        # min_alpha are dropped (the reference drops whole splats below the
        # load-time alpha threshold instead), and alpha is clamped to 0.999
        # (the package keeps 1 - alpha > 0 for its log-space backward).
        frag_a = np.where(frag_a < min_alpha, 0.0, np.minimum(frag_a, 0.999))
        # GL row y -> image row height-1-y (output row 0 at top)
        rows = slice(height - 1 - y1, height - y0)
        sub = img[rows, x0:x1 + 1]
        fa = frag_a[::-1, :, None]
        img[rows, x0:x1 + 1] = fa[..., 0][..., None] * rgb[i][None, None, :] \
            + (1.0 - fa[..., 0][..., None]) * sub
        acc_alpha[rows, x0:x1 + 1] = frag_a[::-1] \
            + (1.0 - frag_a[::-1]) * acc_alpha[rows, x0:x1 + 1]

    return {"color": img.astype(np.float32),
            "alpha": acc_alpha.astype(np.float32)}


def render_reference_numpy_2d(means, scales, quats_xyzw, colors_rgba, sh,
                              view, proj, cam_pos, width, height,
                              sh_degree=0, splat_scale=1.0,
                              max_screen_space_splat_size=1024.0,
                              sort_bits=16, min_alpha=1.0 / 255.0,
                              background=(0.0, 0.0, 0.0)):
    """2DGS surfel render — 1:1 port of SplatMaterial2D.js, sharing no code
    with the package's ``render/surfel.py``.

    Ported semantics, with citations (/root/reference/src/splatmesh/
    SplatMaterial2D.js):

    - ``T = transpose(splat2World) * world2ndc * ndc2pix`` with
      ``world2ndc = transpose(P * MV)`` and L = R S columns 0/1   :94-127
    - screen AABB: distance = T3.T3.(1,1,-1), f = tempPoint/distance,
      pointImage, halfExtend = pointImage^2 - temp, extent =
      sqrt(max(1e-4, .)), reject |distance| < 1e-5                :163-186
    - quad half-extent = 3 * extent (``radius * 3.0``)            :187
    - fragment: k = px*Tw - Tu, l = py*Tw - Tv, p = k x l, s = p.xy/p.z,
      rho = min(rho3d, FilterInvSquare*|pix - center|^2), ray-plane
      depth >= near_n = 0.2, alpha = min(0.99, opa * exp(-rho/2)),
      discard below 1/255                                          :289-344
    - clip cull at 1.2w (shared preamble, SplatMaterial.js:156-167) and
      the same sorter.cpp distance-map draw order as the 3D oracle.

    Two deliberate package-contract deviations (both documented in
    ``render/surfel.py``): ndc2pix uses W/2 rather than (W-1)/2 so pixel
    centers match the package's GL convention, and the support box is the
    PER-AXIS 3-sigma extent (ceil-quantized to 1/16 px) rather than the
    reference quad's square max-extent — the box is a hard cutoff contract
    shared by every compositor path.
    """
    means = np.asarray(means, np.float64)
    scales = np.asarray(scales, np.float64)
    quats_xyzw = np.asarray(quats_xyzw, np.float64)
    colors_rgba = np.asarray(colors_rgba, np.float64)
    sh = np.asarray(sh, np.float64)
    view = np.asarray(view, np.float64)
    proj = np.asarray(proj, np.float64)
    cam_pos = np.asarray(cam_pos, np.float64)
    n = means.shape[0]

    mv = view
    m = proj @ mv

    # clip cull (SplatMaterial.js:156-167)
    clip = means @ m[:3, :3].T + m[:3, 3]
    clip_w = means @ m[3, :3] + m[3, 3]
    lim = 1.2 * clip_w
    visible = ((clip[:, 2] >= -lim) & (clip[:, 0] >= -lim)
               & (clip[:, 0] <= lim) & (clip[:, 1] >= -lim)
               & (clip[:, 1] <= lim))

    # SH color
    dirs = means - cam_pos[None, :]
    dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-12)
    rgb = _eval_sh(colors_rgba[:, :3], sh, dirs, sh_degree)
    alpha_v = colors_rgba[:, 3].copy()
    visible &= alpha_v >= min_alpha

    # T rows: a0 = (L col0, 0), a1 = (L col1, 0), a2 = (center, 1)
    rot = _quat_rot_xyzw(quats_xyzw)                    # [N, 3, 3]
    l0 = rot[:, :, 0] * scales[:, 0:1]
    l1 = rot[:, :, 1] * scales[:, 1:2]
    ndc2pix = np.array([
        [width / 2.0, 0.0, 0.0],
        [0.0, height / 2.0, 0.0],
        [0.0, 0.0, 0.0],
        [width / 2.0, height / 2.0, 1.0]], np.float64)  # [4, 3]

    def t_row(vec3, w_comp):
        a = np.concatenate([vec3, np.full((n, 1), w_comp)], axis=1)  # [N,4]
        row4 = a @ m.T                                   # (M @ a_i) [N, 4]
        return row4 @ ndc2pix                            # [N, 3]

    r0 = t_row(l0, 0.0)        # T row 0: (t00, t01, t02)
    r1 = t_row(l1, 0.0)        # T row 1
    r2 = t_row(means, 1.0)     # T row 2

    # GLSL mat3 indexing is COLUMN-major: the shader's T0/T1/T3 (AABB) and
    # Tu/Tv/Tw (fragment) are the COLUMNS of the mathematical T.
    #   T0 = (t00, t10, t20), T1 = (t01, t11, t21), T3 = (t02, t12, t22)
    col0 = np.stack([r0[:, 0], r1[:, 0], r2[:, 0]], axis=1)   # Tu / T0
    col1 = np.stack([r0[:, 1], r1[:, 1], r2[:, 1]], axis=1)   # Tv / T1
    col2 = np.stack([r0[:, 2], r1[:, 2], r2[:, 2]], axis=1)   # Tw / T3

    # screen AABB (SplatMaterial2D.js:163-186): f = (1,1,-1)/distance
    distance = col2[:, 0] ** 2 + col2[:, 1] ** 2 - col2[:, 2] ** 2
    ok = np.abs(distance) >= 1e-5
    inv = np.where(ok, 1.0 / np.where(ok, distance, 1.0), 0.0)
    f0, f1, f2 = inv, inv, -inv
    cx = f0 * col0[:, 0] * col2[:, 0] + f1 * col0[:, 1] * col2[:, 1] \
        + f2 * col0[:, 2] * col2[:, 2]
    cy = f0 * col1[:, 0] * col2[:, 0] + f1 * col1[:, 1] * col2[:, 1] \
        + f2 * col1[:, 2] * col2[:, 2]
    tmp_x = f0 * col0[:, 0] ** 2 + f1 * col0[:, 1] ** 2 \
        + f2 * col0[:, 2] ** 2
    tmp_y = f0 * col1[:, 0] ** 2 + f1 * col1[:, 1] ** 2 \
        + f2 * col1[:, 2] ** 2
    ext_x = np.sqrt(np.maximum(1e-4, cx * cx - tmp_x))
    ext_y = np.sqrt(np.maximum(1e-4, cy * cy - tmp_y))
    # package support-box contract: per-axis 3-sigma, 1/16-px ceil
    rx = np.minimum(3.0 * ext_x * splat_scale, max_screen_space_splat_size)
    ry = np.minimum(3.0 * ext_y * splat_scale, max_screen_space_splat_size)
    rx = np.minimum(np.ceil(rx * 16.0) / 16.0, 4095.9375)
    ry = np.minimum(np.ceil(ry * 16.0) / 16.0, 4095.9375)
    visible &= ok

    # sorter.cpp distance-map back-to-front order (same as the 3D oracle)
    dist = means @ m[2, :3] + m[2, 3]
    vis_idx = np.nonzero(visible)[0]
    if vis_idx.size:
        dv = dist[vis_idx]
        dmin, dmax = dv.min(), dv.max()
        nbuckets = (1 << sort_bits) - 1
        buckets = ((dv - dmin) * (nbuckets / max(dmax - dmin, 1e-20))
                   ).astype(np.int64)
        buckets = np.clip(buckets, 0, nbuckets)
        order = vis_idx[np.argsort(buckets, kind="stable")[::-1]]
    else:
        order = vis_idx

    img = np.zeros((height, width, 3), np.float64)
    img += np.asarray(background, np.float64)[None, None, :]
    acc_alpha = np.zeros((height, width), np.float64)

    for i in order:
        if not (np.isfinite(rx[i]) and np.isfinite(ry[i])):
            continue
        x0 = max(int(np.floor(cx[i] - rx[i] - 0.5)), 0)
        x1 = min(int(np.ceil(cx[i] + rx[i] - 0.5)), width - 1)
        y0 = max(int(np.floor(cy[i] - ry[i] - 0.5)), 0)
        y1 = min(int(np.ceil(cy[i] + ry[i] - 0.5)), height - 1)
        if x1 < x0 or y1 < y0:
            continue
        xs = np.arange(x0, x1 + 1) + 0.5                 # [W']
        ys = np.arange(y0, y1 + 1) + 0.5                 # [H']
        px = xs[None, :]
        py = ys[:, None]
        tu, tv, tw = col0[i], col1[i], col2[i]           # GLSL Tu/Tv/Tw
        k = [px * tw[c] - tu[c] for c in range(3)]
        l_ = [py * tw[c] - tv[c] for c in range(3)]
        p0 = k[1] * l_[2] - k[2] * l_[1]
        p1 = k[2] * l_[0] - k[0] * l_[2]
        p2 = k[0] * l_[1] - k[1] * l_[0]
        tiny = np.abs(p2) < 1e-12
        sp2 = np.where(tiny, 1e-12, p2)
        su = p0 / sp2
        sv = p1 / sp2
        rho3d = su * su + sv * sv
        dx = px - cx[i]
        dy = py - cy[i]
        rho2d = 2.0 * (dx * dx + dy * dy)                # FilterInvSquare=2
        rho = np.minimum(rho3d, rho2d)
        depth = np.where(rho3d <= rho2d, su * tw[0] + sv * tw[1] + tw[2],
                         tw[2])
        frag_a = np.minimum(alpha_v[i] * np.exp(-0.5 * rho), 0.99)
        bad = (tiny | (depth < 0.2) | (frag_a < min_alpha)
               | (np.abs(dx) > rx[i]) | (np.abs(dy) > ry[i]))
        frag_a = np.where(bad, 0.0, frag_a)
        rows = slice(height - 1 - y1, height - y0)
        fa = frag_a[::-1, :, None]
        img[rows, x0:x1 + 1] = fa * rgb[i][None, None, :] \
            + (1.0 - fa) * img[rows, x0:x1 + 1]
        acc_alpha[rows, x0:x1 + 1] = frag_a[::-1] \
            + (1.0 - frag_a[::-1]) * acc_alpha[rows, x0:x1 + 1]

    return {"color": img.astype(np.float32),
            "alpha": acc_alpha.astype(np.float32)}
