"""3D covariance construction from scale/rotation, with transform congruence.

Matches the reference's `SplatBuffer.computeCovariance`
(/root/reference/src/loaders/SplatBuffer.js:440-486):

    C = R @ S            (rotation times diagonal scale)
    Sigma = C @ C^T
    with a scene transform T3 (upper-left 3x3 of the 4x4):
    Sigma' = T3 @ Sigma @ T3^T
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math3d


def covariance_from_scale_quat(scales: jnp.ndarray, quats: jnp.ndarray,
                               transform3: jnp.ndarray | None = None
                               ) -> jnp.ndarray:
    """Full 3x3 covariance matrices ``[N, 3, 3]``.

    Args:
      scales: ``[N, 3]``; quats: ``[N, 4]`` (x, y, z, w);
      transform3: optional ``[3, 3]`` scene transform applied congruently.
    """
    r = math3d.quat_to_rotmat(quats)            # [N, 3, 3]
    m = r * scales[:, None, :]                  # R @ diag(s)
    cov = m @ jnp.swapaxes(m, -1, -2)
    if transform3 is not None:
        cov = transform3[None] @ cov @ transform3.T[None]
    return cov


def covariance6(scales: jnp.ndarray, quats: jnp.ndarray,
                transform3: jnp.ndarray | None = None) -> jnp.ndarray:
    """Compact symmetric covariance ``[N, 6]``: (xx, xy, xz, yy, yz, zz).

    Same element order the reference packs into its covariance texture
    (SplatBuffer.js:469-483 stores m00, m01, m02, m11, m12, m22).
    """
    cov = covariance_from_scale_quat(scales, quats, transform3)
    return jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], axis=-1)
