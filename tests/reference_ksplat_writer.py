"""Independent .ksplat writer: a 1:1 Python transcription of the REFERENCE's
writer (/root/reference/src/loaders/SplatBuffer.js:1050-1326 and the header
writers :856-963), sharing NO code with gaussiansplats3d_tpu.io.ksplat.

Purpose (VERDICT round-1 item 7): cross-implementation format fixtures.  The
reference's writer defines the format; node is unavailable in this
environment, so this module transcribes its byte-level behavior exactly —
same bucketing walk order, same fixed-point position compression, same
half-float/uint8 SH quantization — to generate fixtures our reader must
decode and to validate our writer's output under the reference's header
semantics (parseHeader :819-848, writeSectionHeaderToBuffer :944-963).

Input convention matches UncompressedSplatArray.js:7-46: one flat list per
splat ``[x, y, z, s0, s1, s2, q0(w), q1(x), q2(y), q3(z), r, g, b, opacity,
FRC0..FRC23]`` with colors/opacity in 0-255.
"""

from __future__ import annotations

import numpy as np

HEADER_SIZE = 4096
SECTION_HEADER_SIZE = 1024
BUCKET_STORAGE_BYTES = 12
DEFAULT_BLOCK_SIZE = 5.0
DEFAULT_BUCKET_SIZE = 256
SH_8BIT_RANGE = 3.0                      # Constants.js:10
SH_8BIT_HALF = SH_8BIT_RANGE / 2.0

# CompressionLevels table, SplatBuffer.js:108-163
_LEVELS = {
    0: dict(bytes_center=12, bytes_scale=12, bytes_rot=16, bytes_color=4,
            bytes_sh_comp=4, scale_range=1),
    1: dict(bytes_center=6, bytes_scale=6, bytes_rot=8, bytes_color=4,
            bytes_sh_comp=2, scale_range=32767),
    2: dict(bytes_center=6, bytes_scale=6, bytes_rot=8, bytes_color=4,
            bytes_sh_comp=1, scale_range=32767),
}

_SH_COMPONENTS = {0: 0, 1: 9, 2: 24, 3: 45}


def _to_half(v):
    return np.float16(v).view(np.uint16)


def _to_uint8(v, lo, hi):
    v = min(max(v, lo), hi)
    return int(min(max(np.floor((v - lo) / (hi - lo) * 255), 0), 255))


def bytes_per_splat(level, sh_degree):
    lv = _LEVELS[level]
    return (lv["bytes_center"] + lv["bytes_scale"] + lv["bytes_rot"]
            + lv["bytes_color"] + lv["bytes_sh_comp"]
            * _SH_COMPONENTS[sh_degree])


def _compute_buckets(splats, block_size, bucket_size):
    """computeBucketsForUncompressedSplatArray (SplatBuffer.js:1328-1399):
    spatial blocks in x-major (y, z minor) id order; a bucket moves to the
    'full' list the moment it reaches bucket_size splats."""
    centers = np.array([[s[0], s[1], s[2]] for s in splats], np.float32)
    mn = centers.min(axis=0)
    mx = centers.max(axis=0)
    dims = mx - mn
    y_blocks = int(np.ceil(dims[1] / block_size))
    z_blocks = int(np.ceil(dims[2] / block_size))
    half = block_size / 2.0

    full, partial, order = [], {}, []
    for i, c in enumerate(centers):
        xb = int(np.floor((c[0] - mn[0]) / block_size))
        yb = int(np.floor((c[1] - mn[1]) / block_size))
        zb = int(np.floor((c[2] - mn[2]) / block_size))
        center = (xb * block_size + mn[0] + half,
                  yb * block_size + mn[1] + half,
                  zb * block_size + mn[2] + half)
        bucket_id = xb * (max(y_blocks, 0) * max(z_blocks, 0)) \
            + yb * max(z_blocks, 0) + zb
        b = partial.get(bucket_id)
        if b is None:
            b = {"splats": [], "center": center}
            partial[bucket_id] = b
            order.append(bucket_id)
        b["splats"].append(i)
        if len(b["splats"]) >= bucket_size:
            full.append(b)
            partial[bucket_id] = None
    # JS object iteration over integer-like keys is ASCENDING-numeric
    # (SplatBuffer.js:1386-1393 iterates `for bucketId in ...`), not
    # insertion order.
    partial_list = [partial[k] for k in sorted(partial)
                    if partial.get(k) is not None]
    return full, partial_list


def write_ksplat(splat_arrays, minimum_alpha=1, compression_level=0,
                 scene_center=(0.0, 0.0, 0.0), block_size=None,
                 bucket_size=None) -> bytes:
    """generateFromUncompressedSplatArrays (SplatBuffer.js:1177-1326)."""
    sh_degree = 0
    for arr in splat_arrays:
        n_frc = max(len(s) - 14 for s in arr) if arr else 0
        if n_frc >= 24:
            sh_degree = max(sh_degree, 2)
        elif n_frc >= 9:
            sh_degree = max(sh_degree, 1)

    # global SH coefficient range (SplatBuffer.js:1189-1205)
    mn_sh = mx_sh = None
    for arr in splat_arrays:
        for s in arr:
            for v in s[14:14 + 23]:
                if mn_sh is None or v < mn_sh:
                    mn_sh = v
                if mx_sh is None or v > mx_sh:
                    mx_sh = v
    mn_sh = mn_sh if mn_sh else -SH_8BIT_HALF
    mx_sh = mx_sh if mx_sh else SH_8BIT_HALF

    lv = _LEVELS[compression_level]
    bps = bytes_per_splat(compression_level, sh_degree)
    scale_range = lv["scale_range"]
    block_size = block_size or DEFAULT_BLOCK_SIZE
    bucket_size = bucket_size or DEFAULT_BUCKET_SIZE

    section_buffers, section_headers = [], []
    total = 0
    for arr in splat_arrays:
        valid = [s for s in arr
                 if (s[13] if len(s) > 13 else 0) >= minimum_alpha]
        full, partial = _compute_buckets(valid, block_size, bucket_size)
        buckets = full + partial
        partial_lens = [len(b["splats"]) for b in partial]

        data_bytes = len(valid) * bps
        meta_bytes = len(partial_lens) * 4
        bucket_bytes = (len(buckets) * BUCKET_STORAGE_BYTES + meta_bytes
                        if compression_level >= 1 else 0)
        buf = bytearray(data_bytes + bucket_bytes)
        factor = scale_range / (block_size * 0.5)

        out = 0
        for b in buckets:
            for row in b["splats"]:
                s = valid[row]
                off = bucket_bytes + out * bps
                _write_splat(buf, off, s, compression_level, sh_degree,
                             b["center"], factor, scale_range, mn_sh, mx_sh)
                out += 1
        total += out

        if compression_level >= 1:
            for i, ln in enumerate(partial_lens):
                buf[i * 4:(i + 1) * 4] = np.uint32(ln).tobytes()
            for i, b in enumerate(buckets):
                base = meta_bytes + i * BUCKET_STORAGE_BYTES
                buf[base:base + 12] = np.asarray(b["center"],
                                                 np.float32).tobytes()
        section_buffers.append(bytes(buf))

        sh = bytearray(SECTION_HEADER_SIZE)
        u32 = lambda i, v: sh.__setitem__(  # noqa: E731
            slice(i * 4, i * 4 + 4), np.uint32(v).tobytes())
        f32 = lambda i, v: sh.__setitem__(  # noqa: E731
            slice(i * 4, i * 4 + 4), np.float32(v).tobytes())
        u16 = lambda i, v: sh.__setitem__(  # noqa: E731
            slice(i * 2, i * 2 + 2), np.uint16(v).tobytes())
        cl = compression_level
        u32(0, out)
        u32(1, out)
        u32(2, bucket_size if cl >= 1 else 0)
        u32(3, len(buckets) if cl >= 1 else 0)
        f32(4, block_size if cl >= 1 else 0.0)
        u16(10, BUCKET_STORAGE_BYTES if cl >= 1 else 0)
        u32(6, scale_range if cl >= 1 else 0)
        u32(7, len(buf))
        u32(8, len(full) if cl >= 1 else 0)
        u32(9, len(partial) if cl >= 1 else 0)
        u16(20, sh_degree)
        section_headers.append(bytes(sh))

    header = bytearray(HEADER_SIZE)
    header[0] = 0          # versionMajor
    header[1] = 1          # versionMinor
    hu32 = lambda i, v: header.__setitem__(  # noqa: E731
        slice(i * 4, i * 4 + 4), np.uint32(v).tobytes())
    hf32 = lambda i, v: header.__setitem__(  # noqa: E731
        slice(i * 4, i * 4 + 4), np.float32(v).tobytes())
    hu32(1, len(section_buffers))
    hu32(2, len(section_buffers))
    hu32(3, total)
    hu32(4, total)
    header[20:22] = np.uint16(compression_level).tobytes()
    hf32(6, scene_center[0])
    hf32(7, scene_center[1])
    hf32(8, scene_center[2])
    hf32(9, mn_sh if mn_sh else -SH_8BIT_HALF)
    hf32(10, mx_sh if mx_sh else SH_8BIT_HALF)

    return bytes(header) + b"".join(section_headers) \
        + b"".join(section_buffers)


def _write_splat(buf, off, s, level, sh_degree, bucket_center, factor,
                 scale_range, mn_sh, mx_sh):
    """writeSplatDataToSectionBuffer (SplatBuffer.js:1050-1175)."""
    lv = _LEVELS[level]
    center_base = off
    scale_base = center_base + lv["bytes_center"]
    rot_base = scale_base + lv["bytes_scale"]
    color_base = rot_base + lv["bytes_rot"]
    sh_base = color_base + lv["bytes_color"]

    q = np.asarray(s[6:10], np.float64)     # (w, x, y, z) scalar-first
    nrm = np.linalg.norm(q)
    q = q / nrm if nrm > 0 else np.array([1.0, 0, 0, 0])
    qw, qx, qy, qz = q
    sc = np.asarray(s[3:6], np.float32)

    n_comp = _SH_COMPONENTS[sh_degree]
    frc = [s[14 + i] if len(s) > 14 + i else 0.0 for i in range(n_comp)]

    if level == 0:
        buf[center_base:center_base + 12] = \
            np.asarray(s[0:3], np.float32).tobytes()
        buf[scale_base:scale_base + 12] = sc.astype(np.float32).tobytes()
        # rot stored (x, y, z, w)? NO — reference stores tempRot.x.. where
        # tempRot was .set(ROT0..ROT3) = (w, x, y, z) named x/y/z/w, i.e.
        # the FILE stores the scalar-first tuple verbatim.
        buf[rot_base:rot_base + 16] = \
            np.asarray([qw, qx, qy, qz], np.float32).tobytes()
        if sh_degree > 0:
            buf[sh_base:sh_base + 4 * n_comp] = \
                np.asarray(frc, np.float32).tobytes()
    else:
        dcsr = scale_range * 2 + 1
        ctr = []
        for k in range(3):
            v = np.round((s[k] - bucket_center[k]) * factor) + scale_range
            ctr.append(int(min(max(v, 0), dcsr)))
        buf[center_base:center_base + 6] = \
            np.asarray(ctr, np.uint16).tobytes()
        buf[scale_base:scale_base + 6] = \
            np.asarray([_to_half(v) for v in sc], np.uint16).tobytes()
        buf[rot_base:rot_base + 8] = np.asarray(
            [_to_half(v) for v in (qw, qx, qy, qz)], np.uint16).tobytes()
        if sh_degree > 0:
            if level == 1:
                buf[sh_base:sh_base + 2 * n_comp] = np.asarray(
                    [_to_half(v) for v in frc], np.uint16).tobytes()
            else:
                buf[sh_base:sh_base + n_comp] = bytes(
                    _to_uint8(v, mn_sh, mx_sh) for v in frc)

    rgba = [int(min(max(round(v), 0), 255))
            for v in (s[10], s[11], s[12], s[13])]
    buf[color_base:color_base + 4] = bytes(rgba)


def reference_parse_header(data: bytes) -> dict:
    """parseHeader (SplatBuffer.js:819-848) — validation side."""
    u8 = np.frombuffer(data, np.uint8, HEADER_SIZE)
    u16 = np.frombuffer(data, "<u2", HEADER_SIZE // 2)
    u32 = np.frombuffer(data, "<u4", HEADER_SIZE // 4)
    f32 = np.frombuffer(data, "<f4", HEADER_SIZE // 4)
    return dict(
        version_major=int(u8[0]), version_minor=int(u8[1]),
        max_section_count=int(u32[1]), section_count=int(u32[2]),
        max_splat_count=int(u32[3]), splat_count=int(u32[4]),
        compression_level=int(u16[10]),
        scene_center=tuple(float(v) for v in f32[6:9]),
        min_sh=float(f32[9]) or -SH_8BIT_HALF,
        max_sh=float(f32[10]) or SH_8BIT_HALF)


def reference_parse_section_headers(data: bytes, header: dict) -> list:
    """parseSectionHeaders (SplatBuffer.js:877-941) — validation side."""
    out = []
    base = HEADER_SIZE
    section_base = HEADER_SIZE \
        + header["max_section_count"] * SECTION_HEADER_SIZE
    for _ in range(header["max_section_count"]):
        u16 = np.frombuffer(data, "<u2", SECTION_HEADER_SIZE // 2, base)
        u32 = np.frombuffer(data, "<u4", SECTION_HEADER_SIZE // 4, base)
        f32 = np.frombuffer(data, "<f4", SECTION_HEADER_SIZE // 4, base)
        level = header["compression_level"]
        max_splats = int(u32[1])
        bucket_count = int(u32[3])
        partial = int(u32[9])
        sh_degree = int(u16[20])
        bucket_storage = int(u16[10])
        buckets_meta = partial * 4
        buckets_storage = (bucket_storage * bucket_count + buckets_meta
                           if level >= 1 else 0)
        bps = bytes_per_splat(level, sh_degree)
        storage = bps * max_splats + buckets_storage
        out.append(dict(
            splat_count=int(u32[0]), max_splat_count=max_splats,
            bucket_size=int(u32[2]), bucket_count=bucket_count,
            bucket_block_size=float(f32[4]),
            compression_scale_range=int(u32[6]),
            storage_size_bytes=int(u32[7]),
            declared_storage=storage,
            full_bucket_count=int(u32[8]),
            partially_filled_bucket_count=partial,
            sh_degree=sh_degree, base=section_base,
            data_base=section_base + buckets_storage))
        section_base += int(u32[7]) or storage
        base += SECTION_HEADER_SIZE
    return out


# ===========================================================================
# Independent .splat and .spz encoders (same cross-validation purpose)
# ===========================================================================

SH_C0 = 0.28209479177387814
SPZ_MAGIC = 1347635022
SPZ_COLOR_SCALE = 0.15


def write_splat(rows) -> bytes:
    """antimatter15 .splat rows (SplatParser.js:77-105): f32 xyz, f32 scale,
    u8 RGBA, u8 quat with (r0,r1,r2,r3) = 128 + 128*(w,x,y,z)."""
    out = bytearray()
    for s in rows:
        out += np.asarray(s[0:3], np.float32).tobytes()
        out += np.asarray(s[3:6], np.float32).tobytes()
        out += bytes(int(min(max(round(v), 0), 255)) for v in s[10:14])
        q = np.asarray(s[6:10], np.float64)     # (w, x, y, z)
        q = q / np.linalg.norm(q)
        out += bytes(int(min(max(round(v * 128 + 128), 0), 255)) for v in q)
    return bytes(out)


def write_spz(rows, sh_degree=0, fractional_bits=12, antialiased=False
              ) -> bytes:
    """Niantic .spz v2 (SpzLoader.js:160-342 decode semantics inverted):
    gzip of header + 24-bit fixed positions + u8 alpha + SH_C0-transformed
    u8 colors + log-scale u8 scales + smallest-three u8 rotations + u8 SH.

    Rows use the UncompressedSplatArray convention of this module; SH input
    values are raw coefficients in [-1, 1).
    """
    import gzip
    import struct

    sh_dim = {0: 0, 1: 3, 2: 8, 3: 15}[sh_degree]
    n = len(rows)
    head = struct.pack("<IIIBBBB", SPZ_MAGIC, 2, n, sh_degree,
                       fractional_bits, 1 if antialiased else 0, 0)
    pos = bytearray()
    alpha = bytearray()
    color = bytearray()
    scale = bytearray()
    rot = bytearray()
    sh = bytearray()
    fscale = float(1 << fractional_bits)
    for s in rows:
        for j in range(3):
            fixed = int(round(s[j] * fscale)) & 0xFFFFFF
            pos += bytes((fixed & 0xFF, (fixed >> 8) & 0xFF,
                          (fixed >> 16) & 0xFF))
        alpha.append(int(min(max(round(s[13]), 0), 255)))
        for j in range(3):
            # decoder: c255 = floor((((u/255 - .5)/COLOR_SCALE)*SH_C0 + .5)*255)
            v = ((s[10 + j] / 255.0 - 0.5) / SH_C0 * SPZ_COLOR_SCALE
                 + 0.5) * 255.0
            color.append(int(min(max(round(v), 0), 255)))
        for j in range(3):
            # decoder: scale = exp(u/16 - 10)
            u = (np.log(max(s[3 + j], 1e-12)) + 10.0) * 16.0
            scale.append(int(min(max(round(u), 0), 255)))
        q = np.asarray(s[6:10], np.float64)     # (w, x, y, z)
        q = q / np.linalg.norm(q)
        if q[0] < 0:
            q = -q                              # w >= 0: smallest-three
        for v in q[1:4]:
            rot.append(int(min(max(round((v + 1.0) * 127.5), 0), 255)))
        frc = s[14:]
        for k in range(sh_dim):
            for j in range(3):
                # file index: sh[shDim*3*i + k*3 + j]; FRC is channel-major
                # per band: channel j's k-th coeff = frc[j*shDim + k]
                v = frc[j * sh_dim + k] if j * sh_dim + k < len(frc) else 0.0
                sh.append(int(min(max(round(v * 128.0 + 128.0), 0), 255)))
    raw = head + bytes(pos) + bytes(alpha) + bytes(color) + bytes(scale) \
        + bytes(rot) + bytes(sh)
    return gzip.compress(raw)
