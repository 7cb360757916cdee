"""PlayCanvas-compressed and INRIA V2 codebook PLY variants.

Synthetic buffers are built here following the formats the reference
parsers define (PlayCanvasCompressedPlyParser.js / INRIAV2PlyParser.js);
encode -> parse must recover the original attributes within quantization.
"""

import numpy as np
import jax
import pytest

import gaussiansplats3d_tpu as gs
from gaussiansplats3d_tpu.io.ply import detect_ply_variant, parse_ply


def pack_unorm(v, bits):
    return np.clip(np.round(v * ((1 << bits) - 1)), 0,
                   (1 << bits) - 1).astype(np.uint64)


def build_playcanvas_ply(means, log_scales, quats_xyzw, rgba, sh=None):
    n = means.shape[0]
    n_chunks = -(-n // 256)
    pad = n_chunks * 256 - n

    def chunked(x):
        x = np.concatenate([x, np.repeat(x[-1:], pad, 0)]) if pad else x
        return x.reshape(n_chunks, 256, -1)

    cm = chunked(means)
    cs = chunked(log_scales)
    mins_p = cm.min(1)
    maxs_p = cm.max(1) + 1e-9
    mins_s = cs.min(1)
    maxs_s = cs.max(1) + 1e-9

    chunk_of = np.arange(n) // 256
    rel_p = (means - mins_p[chunk_of]) / (maxs_p - mins_p)[chunk_of]
    rel_s = (log_scales - mins_s[chunk_of]) / (maxs_s - mins_s)[chunk_of]

    def p111011(rel):
        return (pack_unorm(rel[:, 0], 11) << 21 | pack_unorm(rel[:, 1], 10)
                << 11 | pack_unorm(rel[:, 2], 11)).astype("<u4")

    packed_pos = p111011(rel_p)
    packed_scale = p111011(rel_s)

    # rotation: scalar-first (w,x,y,z); drop the largest component
    wxyz = quats_xyzw[:, [3, 0, 1, 2]]
    sign = np.where(np.take_along_axis(
        wxyz, np.abs(wxyz).argmax(1, keepdims=True), 1) < 0, -1.0, 1.0)
    wxyz = wxyz * sign
    largest = np.abs(wxyz).argmax(1)
    packed_rot = np.zeros(n, np.uint64)
    for i in range(n):
        rest = [wxyz[i, j] for j in range(4) if j != largest[i]]
        u = [pack_unorm(np.float64(r) / np.sqrt(2) + 0.5, 10) for r in rest]
        packed_rot[i] = (np.uint64(largest[i]) << 30 | u[0] << 20
                         | u[1] << 10 | u[2])
    packed_rot = packed_rot.astype("<u4")

    packed_col = (pack_unorm(rgba[:, 0], 8) << 24
                  | pack_unorm(rgba[:, 1], 8) << 16
                  | pack_unorm(rgba[:, 2], 8) << 8
                  | pack_unorm(rgba[:, 3], 8)).astype("<u4")

    chunk_props = ["min_x", "min_y", "min_z", "max_x", "max_y", "max_z",
                   "min_scale_x", "min_scale_y", "min_scale_z",
                   "max_scale_x", "max_scale_y", "max_scale_z"]
    header = ["ply", "format binary_little_endian 1.0",
              f"element chunk {n_chunks}"]
    header += [f"property float {p}" for p in chunk_props]
    header += [f"element vertex {n}"]
    header += [f"property uint packed_{p}"
               for p in ("position", "rotation", "scale", "color")]
    sh_bytes = b""
    if sh is not None:
        k = sh.shape[1]
        header += [f"element sh {n}"]
        header += [f"property uchar f_rest_{i}" for i in range(3 * k)]
        flat = np.zeros((n, 3 * k), np.uint8)
        for ch in range(3):
            for i in range(k):
                flat[:, ch * k + i] = np.clip(
                    np.round((sh[:, i, ch] + 4.0) * 255.0 / 8.0), 0, 255)
        sh_bytes = flat.tobytes()
    header += ["end_header", ""]

    chunk_table = np.concatenate(
        [mins_p, maxs_p, mins_s, maxs_s], axis=1).astype("<f4")
    # order per header: min_xyz, max_xyz, min_scale, max_scale
    chunk_table = np.concatenate(
        [mins_p, maxs_p, mins_s, maxs_s], axis=1).astype("<f4")
    verts = np.stack([packed_pos, packed_rot, packed_scale, packed_col],
                     axis=1).astype("<u4")
    return ("\n".join(header).encode() + chunk_table.tobytes()
            + verts.tobytes() + sh_bytes)


def test_playcanvas_roundtrip():
    rng = np.random.default_rng(0)
    n = 300
    means = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    log_scales = rng.uniform(-5, -2, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    rgba = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    sh = rng.uniform(-1, 1, (n, 3, 3)).astype(np.float32)

    buf = build_playcanvas_ply(means, log_scales, q, rgba, sh)
    assert detect_ply_variant(buf) == "playcanvas"
    out = parse_ply(buf)
    assert out.num_splats == n
    assert np.allclose(out.means, means, atol=4.0 / 1023)
    assert np.allclose(np.log(np.asarray(out.scales)), log_scales,
                       atol=3.0 / 1023 * 3)
    dots = np.abs(np.sum(np.asarray(out.quats) * q, axis=1))
    assert (dots > 0.99).all()
    assert np.allclose(np.asarray(out.colors), rgba, atol=2 / 255)
    assert np.allclose(np.asarray(out.sh), sh, atol=8 / 255 + 1e-6)


def build_inria_v2_ply(means, scales, quats_xyzw, rgb_dc, opacity_logit, sh):
    """Codebook PLY: one vertex section + codebook_centers section."""
    n = means.shape[0]
    book = 256

    def f16(x):
        return np.asarray(x, np.float16).view("<u2")

    # build codebook pages by uniform quantization of each value range
    def page_of(values):
        lo, hi = float(values.min()), float(values.max()) + 1e-6
        centers = np.linspace(lo, hi, book).astype(np.float32)
        idx = np.clip(np.round((values - lo) / (hi - lo) * (book - 1)),
                      0, book - 1).astype(np.int32)
        return centers, idx

    pages = {}
    idxs = {}
    pages["features_dc"], dc_idx = page_of(rgb_dc.ravel())
    pages["opacity"], op_idx = page_of(opacity_logit)
    pages["scaling"], sc_idx = page_of(np.log(scales).ravel())
    wxyz = quats_xyzw[:, [3, 0, 1, 2]]
    pages["rotation_re"], re_idx = page_of(wxyz[:, 0])
    pages["rotation_im"], im_idx = page_of(wxyz[:, 1:].ravel())
    k = sh.shape[1]           # 3 coeffs -> degree 1
    rest_idx = np.zeros((n, 3 * k), np.int32)
    rest_pages = []
    for i in range(15):
        if i < 3:
            vals = sh[:, i % 3, :]  # roughly matching page spread
            centers, _ = page_of(vals.ravel())
        else:
            centers = np.linspace(-1, 1, book).astype(np.float32)
        rest_pages.append(centers)
    # encode deg-1: FRC channel-major, page i % 3
    for ch in range(3):
        for i in range(k):
            centers = rest_pages[i % 3]
            v = sh[:, i, ch]
            rest_idx[:, ch * k + i] = np.clip(
                np.round((v - centers[0]) / (centers[-1] - centers[0] + 1e-9)
                         * (book - 1)), 0, book - 1)

    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    props = (["x", "y", "z"]
             + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)]
             + [f"f_dc_{i}" for i in range(3)] + ["opacity"]
             + [f"f_rest_{i}" for i in range(3 * k)])
    header += [f"property {'ushort' if p in ('x', 'y', 'z') else 'int'} {p}"
               for p in props]
    header += [f"element codebook_centers {book}"]
    cb_names = (["features_dc"] + [f"features_rest_{i}" for i in range(15)]
                + ["opacity", "scaling", "rotation_re", "rotation_im"])
    header += [f"property ushort {p}" for p in cb_names]
    header += ["end_header", ""]

    vert_cols = []
    vert_cols += [f16(means[:, i]) for i in range(3)]
    sc_idx = sc_idx.reshape(n, 3)
    dc_idx = dc_idx.reshape(n, 3)
    im_idx = im_idx.reshape(n, 3)
    vert_cols += [sc_idx[:, i].astype("<i4") for i in range(3)]
    vert_cols += [re_idx.astype("<i4")]
    vert_cols += [im_idx[:, i].astype("<i4") for i in range(3)]
    vert_cols += [dc_idx[:, i].astype("<i4") for i in range(3)]
    vert_cols += [op_idx.astype("<i4")]
    vert_cols += [rest_idx[:, i].astype("<i4") for i in range(3 * k)]

    vert_bytes = b""
    dt = np.dtype([(f"c{i}", c.dtype) for i, c in enumerate(vert_cols)])
    rec = np.zeros(n, dt)
    for i, c in enumerate(vert_cols):
        rec[f"c{i}"] = c
    vert_bytes = rec.tobytes()

    cb_cols = [f16(pages["features_dc"])]
    cb_cols += [f16(rest_pages[i]) for i in range(15)]
    cb_cols += [f16(pages["opacity"]), f16(pages["scaling"]),
                f16(pages["rotation_re"]), f16(pages["rotation_im"])]
    dt2 = np.dtype([(f"c{i}", "<u2") for i in range(len(cb_cols))])
    rec2 = np.zeros(book, dt2)
    for i, c in enumerate(cb_cols):
        rec2[f"c{i}"] = c
    return "\n".join(header).encode() + vert_bytes + rec2.tobytes()


def test_inria_v2_roundtrip():
    rng = np.random.default_rng(1)
    n = 200
    means = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-5, -2, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    rgb_dc = rng.uniform(-1, 1, (n, 3)).astype(np.float32)   # f_dc values
    op_logit = rng.uniform(-3, 3, n).astype(np.float32)
    sh = rng.uniform(-0.5, 0.5, (n, 3, 3)).astype(np.float32)

    buf = build_inria_v2_ply(means, scales, q, rgb_dc, op_logit, sh)
    assert detect_ply_variant(buf) == "inria_v2"
    out = parse_ply(buf)
    assert out.num_splats == n
    assert np.allclose(out.means, means, atol=2e-3)   # f16 positions
    assert np.allclose(np.log(np.asarray(out.scales)),
                       np.log(scales), atol=0.05)
    from gaussiansplats3d_tpu.constants import SH_C0
    want_rgb = np.clip(np.floor(
        np.clip(0.5 + SH_C0 * rgb_dc, 0, None) * 255), 0, 255) / 255
    assert np.allclose(np.asarray(out.colors[:, :3]), want_rgb, atol=0.03)
    want_op = 1.0 / (1.0 + np.exp(-op_logit))
    assert np.allclose(np.asarray(out.colors[:, 3]), want_op, atol=0.05)
    assert np.allclose(np.asarray(out.sh), sh, atol=0.05)
