"""antimatter15 ``.splat`` format: 32 bytes per splat, no header.

Row layout (reference: /root/reference/src/loaders/splat/SplatParser.js:13-56):

    3 x f32  position
    3 x f32  scale (linear, already exp'd)
    4 x u8   RGBA color (opacity already sigmoid'd)
    4 x u8   rotation quaternion, scalar-FIRST (w, x, y, z), each
             encoded as round(q * 128 + 128)

The quaternion is re-normalized after decode, matching the reference.
"""

from __future__ import annotations

import numpy as np

from ..core.types import SplatData


def _to_splatdata(means, scales, quats_xyzw, colors01):
    import jax.numpy as jnp
    return SplatData(
        means=jnp.asarray(means, jnp.float32),
        scales=jnp.asarray(scales, jnp.float32),
        quats=jnp.asarray(quats_xyzw, jnp.float32),
        colors=jnp.asarray(colors01, jnp.float32),
        sh=jnp.zeros((means.shape[0], 0, 3), jnp.float32),
    )


def parse_splat(data: bytes) -> SplatData:
    """Decode a raw ``.splat`` byte buffer."""
    if len(data) % 32 != 0:
        raise ValueError(f".splat byte length {len(data)} is not a multiple "
                         "of the 32-byte row size")
    n = len(data) // 32
    from .native import parse_splat_native
    native = parse_splat_native(data)
    if native is not None:
        return _to_splatdata(*native)
    rows = np.frombuffer(data, dtype=np.uint8).reshape(n, 32)
    f32 = rows[:, :24].copy().view("<f4")
    means = f32[:, 0:3]
    scales = f32[:, 3:6]
    colors = rows[:, 24:28].astype(np.float32) / 255.0
    q = (rows[:, 28:32].astype(np.float32) - 128.0) / 128.0   # (w, x, y, z)
    norm = np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    q = q / norm
    quats_xyzw = q[:, [1, 2, 3, 0]]
    return _to_splatdata(means, scales, quats_xyzw, colors)


def load_splat(path: str) -> SplatData:
    with open(path, "rb") as f:
        return parse_splat(f.read())


def serialize_splat(splats: SplatData) -> bytes:
    """Encode to the 32-byte-row format (drops SH — the format has none)."""
    # ascontiguousarray: np.asarray of a device array (or a strided host
    # view) can carry non-contiguous strides, and .view(np.uint8)
    # requires a contiguous last axis.
    means = np.ascontiguousarray(splats.means, np.float32)
    scales = np.ascontiguousarray(splats.scales, np.float32)
    colors = np.ascontiguousarray(splats.colors, np.float32)
    quats = np.ascontiguousarray(splats.quats, np.float32)
    n = means.shape[0]
    rows = np.empty((n, 32), np.uint8)
    rows[:, 0:12] = means.astype("<f4").view(np.uint8)
    rows[:, 12:24] = scales.astype("<f4").view(np.uint8)
    rows[:, 24:28] = np.clip(np.rint(colors * 255.0), 0, 255).astype(np.uint8)
    norm = np.maximum(np.linalg.norm(quats, axis=1, keepdims=True), 1e-12)
    q = quats / norm
    wxyz = q[:, [3, 0, 1, 2]]
    rows[:, 28:32] = np.clip(np.rint(wxyz * 128.0 + 128.0), 0, 255
                             ).astype(np.uint8)
    return rows.tobytes()


def save_splat(splats: SplatData, path: str) -> None:
    with open(path, "wb") as f:
        f.write(serialize_splat(splats))
