"""Pure-JAX 3D math primitives shared by the renderer, loaders and viewer.

Conventions
-----------
- Matrices are ``[r, c]`` row/column indexed and act on column vectors:
  ``v' = M @ v``.  (GL/three.js store matrices column-major in flat memory;
  loaders that read such data reshape with ``order='F'``.)
- Quaternions are stored ``(x, y, z, w)`` (three.js order).  The quaternion →
  rotation-matrix formula matches the reference vertex shader
  (/root/reference/src/splatmesh/SplatMaterial.js:64-78) including its
  normalization by 1/sqrt(|q|^2).
- Cameras look down -Z in view space (GL convention).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternions ``[..., 4]`` in (x, y, z, w) order to ``[..., 3, 3]``.

    Normalizes internally (like the reference shader's 1/sqrt(w^2+x^2+y^2+z^2)
    scale), so unnormalized quaternions are accepted.
    """
    q = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``[3, 3]`` to quaternion (x, y, z, w). Not batched."""
    t = jnp.trace(m)
    # Branch-free Shepperd-style construction.
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + t)) / 2.0
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m[0, 0] - m[1, 1] - m[2, 2])) / 2.0
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m[0, 0] + m[1, 1] - m[2, 2])) / 2.0
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m[0, 0] - m[1, 1] + m[2, 2])) / 2.0
    qx = jnp.copysign(qx, m[2, 1] - m[1, 2])
    qy = jnp.copysign(qy, m[0, 2] - m[2, 0])
    qz = jnp.copysign(qz, m[1, 0] - m[0, 1])
    q = jnp.stack([qx, qy, qz, qw])
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions in (x, y, z, w) order, batched."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def compose_transform(position=None, quaternion=None, scale=None) -> jnp.ndarray:
    """Build a 4x4 affine transform from TRS components (three.js `compose`)."""
    r = quat_to_rotmat(jnp.asarray(quaternion, jnp.float32)) if quaternion is not None \
        else jnp.eye(3, dtype=jnp.float32)
    s = jnp.asarray(scale, jnp.float32) if scale is not None else jnp.ones(3, jnp.float32)
    t = jnp.asarray(position, jnp.float32) if position is not None else jnp.zeros(3, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(r * s[None, :])
    m = m.at[:3, 3].set(t)
    return m


def transform_points(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 affine transform to points ``[..., 3]``."""
    return pts @ m[:3, :3].T + m[:3, 3]


def look_at_view_matrix(eye, target, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """World -> camera (view) matrix for a camera at `eye` looking at `target`.

    GL convention: the camera looks down its local -Z axis.
    """
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    z = normalize(eye - target)          # camera +Z points away from target
    x = normalize(jnp.cross(up, z))
    y = jnp.cross(z, x)
    r = jnp.stack([x, y, z])             # rows: camera axes in world frame
    view = jnp.eye(4, dtype=jnp.float32)
    view = view.at[:3, :3].set(r)
    view = view.at[:3, 3].set(-r @ eye)
    return view


def perspective_projection(fov_y_deg: float, aspect: float, near: float,
                           far: float) -> jnp.ndarray:
    """Standard GL perspective projection matrix (three.js PerspectiveCamera)."""
    f = 1.0 / jnp.tan(jnp.deg2rad(jnp.asarray(fov_y_deg, jnp.float32)) / 2.0)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set((far + near) / (near - far))
    m = m.at[2, 3].set(2.0 * far * near / (near - far))
    m = m.at[3, 2].set(-1.0)
    return m


def orthographic_projection(left: float, right: float, bottom: float, top: float,
                            near: float, far: float) -> jnp.ndarray:
    """Standard GL orthographic projection matrix (three.js OrthographicCamera)."""
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(2.0 / (right - left))
    m = m.at[1, 1].set(2.0 / (top - bottom))
    m = m.at[2, 2].set(-2.0 / (far - near))
    m = m.at[0, 3].set(-(right + left) / (right - left))
    m = m.at[1, 3].set(-(top + bottom) / (top - bottom))
    m = m.at[2, 3].set(-(far + near) / (far - near))
    m = m.at[3, 3].set(1.0)
    return m
