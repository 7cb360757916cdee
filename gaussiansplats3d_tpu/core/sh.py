"""Spherical-harmonics color evaluation (degrees 0-3) and SH rotation.

Evaluation matches the reference vertex shader exactly
(/root/reference/src/splatmesh/SplatMaterial.js:263-342):

    color  = base_rgb                                  (DC band pre-baked)
    deg>=1: color += SH_C1 * (-sh0*y + sh1*z - sh2*x)
    deg>=2: color += SH_C2[0]*xy*sh3 + SH_C2[1]*yz*sh4
                   + SH_C2[2]*(2zz-xx-yy)*sh5 + SH_C2[3]*xz*sh6
                   + SH_C2[4]*(xx-yy)*sh7
    clamp to [0, 1]

where (x, y, z) is the normalized direction from the camera to the splat
center.  Degree 3 follows the standard 3DGS band (the reference loads degree-3
data from .spz but renders at most degree 2; we evaluate it when asked).

SH rotation under scene transforms mirrors SplatBuffer.js:766-817 (degree-1
permuted-basis rotation and the degree-2 recurrence).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import SH_C1, SH_C2, SH_C3


def eval_sh_color(base_rgb: jnp.ndarray, sh: jnp.ndarray, dirs: jnp.ndarray,
                  degree: int) -> jnp.ndarray:
    """Evaluate view-dependent color.

    Args:
      base_rgb: ``[N, 3]`` base color (DC baked in, [0, 1] range).
      sh: ``[N, K, 3]`` higher-order coefficients (K >= coeffs for `degree`).
      dirs: ``[N, 3]`` normalized world-space view directions (splat - camera).
      degree: SH degree to evaluate (0-3).

    Returns ``[N, 3]`` colors; clamped to [0, 1] when degree >= 1 (the
    reference only clamps inside the `sphericalHarmonicsDegree >= 1` branch).
    """
    if degree == 0:
        return base_rgb
    x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
    color = base_rgb + SH_C1 * (-sh[:, 0] * y + sh[:, 1] * z - sh[:, 2] * x)
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        color = color + ((SH_C2[0] * xy) * sh[:, 3] +
                         (SH_C2[1] * yz) * sh[:, 4] +
                         (SH_C2[2] * (2.0 * zz - xx - yy)) * sh[:, 5] +
                         (SH_C2[3] * xz) * sh[:, 6] +
                         (SH_C2[4] * (xx - yy)) * sh[:, 7])
    if degree >= 3:
        color = color + ((SH_C3[0] * y * (3.0 * xx - yy)) * sh[:, 8] +
                         (SH_C3[1] * xy * z) * sh[:, 9] +
                         (SH_C3[2] * y * (4.0 * zz - xx - yy)) * sh[:, 10] +
                         (SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy)) * sh[:, 11] +
                         (SH_C3[4] * x * (4.0 * zz - xx - yy)) * sh[:, 12] +
                         (SH_C3[5] * z * (xx - yy)) * sh[:, 13] +
                         (SH_C3[6] * x * (xx - 3.0 * yy)) * sh[:, 14])
    return jnp.clip(color, 0.0, 1.0)


# --- SH rotation under rigid scene transforms --------------------------------
#
# When a scene is composed with a rotation R, the degree-1 band rotates in the
# permuted (y, z, x) basis and degree-2 rotates via the standard real-SH
# Wigner construction.  The reference implements the same thing numerically at
# SplatBuffer.js:634-636, 766-817.

# The degree-1 basis functions are (up to SH_C1) (-y, z, -x).  Writing the
# coefficient vector as a 3-vector v via v = A sh with A = [[0,0,-1],
# [-1,0,0],[0,1,0]], rotated coefficients are sh' = A^-1 R A sh, which works
# out to M[i, j] = s_i s_j R[p_i, p_j] with p = (1, 2, 0), s = (-1, 1, -1).
_SH1_PERM = np.array([1, 2, 0])
_SH1_SIGN = np.array([-1.0, 1.0, -1.0], dtype=np.float32)


def rotate_sh1(sh1: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Rotate degree-1 SH triplets ``[N, 3, 3]`` (coeff, rgb) by ``rot [3,3]``."""
    m = rot[np.ix_(_SH1_PERM, _SH1_PERM)] * jnp.asarray(
        np.outer(_SH1_SIGN, _SH1_SIGN))
    return jnp.einsum("ij,njc->nic", m, sh1)


def _sh2_basis(d: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized real degree-2 SH basis evaluated at direction d [3]."""
    x, y, z = d[0], d[1], d[2]
    return jnp.stack([x * y, y * z, 3.0 * z * z - 1.0, x * z, x * x - y * y])


# Sample directions whose degree-2 SH evaluations form an invertible 5x5.
_SH2_DIRS = np.array(
    [
        [1.0, 1.0, 0.0],
        [0.0, 1.0, 1.0],
        [1.0, 0.0, 1.0],
        [1.0, -1.0, 0.0],
        [0.0, 1.0, -1.0],
    ],
    dtype=np.float64,
)
_SH2_DIRS /= np.linalg.norm(_SH2_DIRS, axis=1, keepdims=True)


def _sh2_matrix(dirs: np.ndarray) -> np.ndarray:
    out = np.zeros((5, 5))
    for i, d in enumerate(dirs):
        x, y, z = d
        out[i] = [x * y, y * z, 3.0 * z * z - 1.0, x * z, x * x - y * y]
    return out


_SH2_A_INV = np.linalg.inv(_sh2_matrix(_SH2_DIRS))


def sh2_rotation_matrix(rot: jnp.ndarray) -> jnp.ndarray:
    """5x5 matrix rotating degree-2 SH coefficients by world rotation `rot`.

    Constructed by evaluating the basis at rotated sample directions — the
    same numerical approach as the reference's degree-2 path
    (SplatBuffer.js:772-817).

    Derivation: we need sh' with b(d)^T sh' = b(R^T d)^T sh for all unit d.
    Sampling at the 5 invertible directions d_i gives sh' = A^-1 B sh with
    A[i] = b(d_i) and B[i] = b(R^T d_i).

    Because evaluation scales component i by SH_C2[i] (signs included), the
    matrix is conjugated by K = diag(SH_C2).
    """
    rotated = jnp.asarray(_SH2_DIRS, jnp.float32) @ rot  # rows are R^T d_i
    b = jnp.stack([_sh2_basis(rotated[i]) for i in range(5)])
    m_unscaled = jnp.asarray(_SH2_A_INV, jnp.float32) @ b
    k = jnp.asarray(SH_C2, jnp.float32)
    return m_unscaled * (k[None, :] / k[:, None])


def rotate_sh(sh: jnp.ndarray, rot: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Rotate ``[N, K, 3]`` SH coefficients by rotation matrix ``rot``."""
    if degree < 1 or sh.shape[1] == 0:
        return sh
    out = [rotate_sh1(sh[:, 0:3], rot)]
    if degree >= 2 and sh.shape[1] >= 8:
        m2 = sh2_rotation_matrix(rot)
        out.append(jnp.einsum("ij,njc->nic", m2, sh[:, 3:8]))
        if sh.shape[1] > 8:
            # Degree-3 rotation is not implemented; pass through unchanged
            # (the reference does not rotate degree 3 either).
            out.append(sh[:, 8:])
    elif sh.shape[1] > 3:
        out.append(sh[:, 3:])
    return jnp.concatenate(out, axis=1)
