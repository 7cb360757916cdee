"""Splat-data optimization: the SplatPartitioner / SplatBufferGenerator
pipeline (/root/reference/src/loaders/SplatPartitioner.js:46-99,
SplatBufferGenerator.js:17-31), vectorized.

``optimize_splat_data`` reorders splats by (0.5-unit-clamped) squared
distance from the scene center — cache/streaming locality so near splats
load and render first — and partitions them into fixed-size sections for
multi-section .ksplat output and progressive loading.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import SplatData

CLAMP_DISTANCE = 0.5


def optimize_splat_data(splats: SplatData,
                        scene_center: Sequence[float] = (0.0, 0.0, 0.0),
                        section_size: Optional[int] = None,
                        alpha_removal_threshold: int = 1,
                        ) -> List[SplatData]:
    """Filter + reorder + partition. Returns the list of section SplatDatas.

    - alpha_removal_threshold: u8 opacity cutoff (>= kept), like the
      generator's minimumAlpha.
    - section_size: splats per section (None = single section).
    """
    means = np.asarray(splats.means)
    opacity_u8 = np.asarray(splats.colors[:, 3]) * 255.0
    keep = np.nonzero(opacity_u8 >= alpha_removal_threshold)[0]

    center = np.asarray(scene_center, np.float32)
    rel = means[keep] - center
    clamped = np.floor(rel / CLAMP_DISTANCE) * CLAMP_DISTANCE
    dist_sq = np.sum(clamped * clamped, axis=1)
    order = keep[np.argsort(dist_sq, kind="stable")]

    idx = jnp.asarray(order)
    reordered = jax.tree.map(lambda x: x[idx], splats)
    n = len(order)
    if not section_size or section_size >= n:
        return [reordered]
    sections = []
    for start in range(0, n, section_size):
        sl = jnp.arange(start, min(start + section_size, n))
        sections.append(jax.tree.map(lambda x: x[sl], reordered))
    return sections
