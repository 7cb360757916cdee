"""Splat picking: ray vs splat intersection, fully vectorized.

Replaces the reference's CPU octree walk + per-leaf tests
(/root/reference/src/raycaster/Raycaster.js:36-165, Ray.js:26-113) with one
vectorized test over every splat — the tile-binned renderer made the octree
unnecessary, and an [N]-wide jnp computation is the TPU-native shape for
this.  Both of the reference's hit tests are provided:

- sphere approximation: radius = mean of the three scales ("splat-sphere",
  Raycaster.js:120-133)
- true ellipsoid: transform the ray into the splat's unit-sphere frame
  (scale/rotation inverse) and test there (:135-160).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core import math3d
from ..core.types import Camera, SplatData


@dataclasses.dataclass
class Ray:
    origin: jnp.ndarray      # [3]
    direction: jnp.ndarray   # [3] normalized

    @staticmethod
    def from_camera_and_screen(camera: Camera, screen_x: float,
                               screen_y: float, width: int, height: int
                               ) -> "Ray":
        """Build a world-space ray through pixel (x, y), raster orientation
        (y down, origin top-left) like DOM mouse coordinates."""
        ndc_x = 2.0 * (screen_x + 0.5) / width - 1.0
        ndc_y = 1.0 - 2.0 * (screen_y + 0.5) / height
        inv_proj = jnp.linalg.inv(camera.proj)
        inv_view = jnp.linalg.inv(camera.view)
        near = inv_proj @ jnp.array([ndc_x, ndc_y, -1.0, 1.0])
        near = near / near[3]
        world = inv_view @ near
        origin = camera.cam_pos
        direction = math3d.normalize(world[:3] - origin)
        return Ray(origin=origin, direction=direction)


@dataclasses.dataclass
class Hit:
    splat_index: int
    scene_index: int
    t: float                 # distance along the ray
    point: np.ndarray        # [3] world-space intersection


class Raycaster:
    """Stateless picking helper (`intersect_splats` is jittable)."""

    def __init__(self, ellipsoid: bool = False):
        # False = splat-sphere approximation (the reference default)
        self.ellipsoid = ellipsoid

    def intersect(self, ray: Ray, splats: SplatData,
                  transforms: Optional[jnp.ndarray] = None,
                  scene_indices: Optional[jnp.ndarray] = None,
                  min_alpha: float = 0.01) -> Optional[Hit]:
        t, idx = intersect_splats(ray.origin, ray.direction, splats,
                                  self.ellipsoid, transforms, scene_indices,
                                  min_alpha)
        t = float(t)
        if not np.isfinite(t):
            return None
        idx = int(idx)
        scene = int(scene_indices[idx]) if scene_indices is not None else 0
        point = np.asarray(ray.origin + t * ray.direction)
        return Hit(splat_index=idx, scene_index=scene, t=t, point=point)


def intersect_splats(origin, direction, splats: SplatData,
                     ellipsoid: bool = False,
                     transforms: Optional[jnp.ndarray] = None,
                     scene_indices: Optional[jnp.ndarray] = None,
                     min_alpha: float = 0.01):
    """Closest-hit test. Returns (t, splat_index); t = +inf on miss."""
    means = splats.means
    if transforms is not None:
        if scene_indices is None:
            scene_indices = jnp.zeros((means.shape[0],), jnp.int32)
        tf = transforms[scene_indices]
        means = jnp.einsum("nij,nj->ni", tf[:, :3, :3], means) + tf[:, :3, 3]

    visible = splats.colors[:, 3] >= min_alpha

    if not ellipsoid:
        # sphere of radius mean(scale) (Raycaster.js:120-133)
        radius = jnp.mean(splats.scales, axis=1)
        if transforms is not None:
            # approximate uniform scene scale from the transform columns
            s = jnp.linalg.norm(transforms[scene_indices][:, :3, 0], axis=1)
            radius = radius * s
        t = _ray_sphere(origin, direction, means, radius)
    else:
        # unit-sphere frame test (Raycaster.js:135-160)
        rot = math3d.quat_to_rotmat(splats.quats)      # [N, 3, 3]
        if transforms is not None:
            rot = transforms[scene_indices][:, :3, :3] @ rot
        # local = diag(1/s) R^T (p - mean)
        inv_s = 1.0 / jnp.maximum(splats.scales, 1e-9)
        rel_o = origin[None, :] - means
        o_loc = jnp.einsum("nji,nj->ni", rot, rel_o) * inv_s
        d_loc = jnp.einsum("nji,j->ni", rot, direction) * inv_s
        t = _ray_sphere_local(o_loc, d_loc)

    t = jnp.where(visible & (t >= 0), t, jnp.inf)
    best = jnp.argmin(t)
    return t[best], best


def _ray_sphere(origin, direction, centers, radius):
    rel = centers - origin[None, :]
    tca = rel @ direction
    d2 = jnp.sum(rel * rel, axis=1) - tca * tca
    r2 = radius * radius
    thc = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
    t0 = tca - thc
    t1 = tca + thc
    t = jnp.where(t0 >= 0, t0, t1)
    return jnp.where(d2 <= r2, t, jnp.inf)


def _ray_sphere_local(o, d):
    """Per-splat rays vs the unit sphere at the origin. o, d: [N, 3]."""
    a = jnp.sum(d * d, axis=1)
    b = 2.0 * jnp.sum(o * d, axis=1)
    c = jnp.sum(o * o, axis=1) - 1.0
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    t = jnp.where(t0 >= 0, t0, t1)
    return jnp.where(disc >= 0, t, jnp.inf)
