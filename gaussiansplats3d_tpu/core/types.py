"""Core datatypes: the splat pytree, cameras, and render configuration.

The splat data model mirrors the reference's canonical decoded record
(/root/reference/src/loaders/UncompressedSplatArray.js:7-46 — position, scale,
rotation quaternion, DC color + opacity, then higher-order SH coefficients),
re-laid-out as struct-of-arrays for the TPU:

- ``means [N, 3] f32``    — world-space centers
- ``scales [N, 3] f32``   — per-axis Gaussian extents (already exp()'d)
- ``quats [N, 4] f32``    — rotation quaternions, (x, y, z, w) order
- ``colors [N, 4] f32``   — base RGBA in [0, 1].  RGB has the SH DC band baked
  in (``0.5 + SH_C0 * f_dc`` like INRIAV1PlyParser.js:176-183); A is the
  sigmoid'ed opacity.
- ``sh [N, K, 3] f32``    — higher-order SH coefficient triplets; K in
  {0, 3, 8, 15} for degrees 0-3 (the reference packs the same 9/24/45 floats,
  Util.js:166-178).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    DEFAULT_KERNEL_2D_SIZE,
    DEFAULT_MAX_SCREEN_SPACE_SPLAT_SIZE,
    DEFAULT_SORT_BITS,
    DEFAULT_TILE_SIZE,
    MAX_SORT_BITS,
    MIN_SORT_BITS,
    SH_DEGREE_TO_COEFF_COUNT,
)
from . import math3d


@jax.tree_util.register_dataclass
@dataclass
class SplatData:
    """Struct-of-arrays splat container (a JAX pytree)."""

    means: jnp.ndarray     # [N, 3]
    scales: jnp.ndarray    # [N, 3]
    quats: jnp.ndarray     # [N, 4] (x, y, z, w)
    colors: jnp.ndarray    # [N, 4] RGBA in [0, 1]
    sh: jnp.ndarray        # [N, K, 3]

    @property
    def num_splats(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        k = self.sh.shape[1]
        for deg, count in SH_DEGREE_TO_COEFF_COUNT.items():
            if count == k:
                return deg
        raise ValueError(f"unsupported SH coefficient count {k}")

    def astype(self, dtype) -> "SplatData":
        return jax.tree.map(lambda x: x.astype(dtype), self)

    def with_sh_degree(self, degree: int) -> "SplatData":
        """Truncate or zero-pad the SH bands to `degree`."""
        k_new = SH_DEGREE_TO_COEFF_COUNT[degree]
        k_old = self.sh.shape[1]
        if k_new == k_old:
            return self
        if k_new < k_old:
            sh = self.sh[:, :k_new, :]
        else:
            pad = jnp.zeros((self.sh.shape[0], k_new - k_old, 3), self.sh.dtype)
            sh = jnp.concatenate([self.sh, pad], axis=1)
        return dataclasses.replace(self, sh=sh)

    @staticmethod
    def concatenate(parts: "list[SplatData]") -> "SplatData":
        degree = max(p.sh_degree for p in parts)
        parts = [p.with_sh_degree(degree) for p in parts]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)

    @staticmethod
    def zeros(n: int, sh_degree: int = 0) -> "SplatData":
        k = SH_DEGREE_TO_COEFF_COUNT[sh_degree]
        return SplatData(
            means=jnp.zeros((n, 3), jnp.float32),
            scales=jnp.ones((n, 3), jnp.float32),
            quats=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), (n, 1)),
            colors=jnp.zeros((n, 4), jnp.float32),
            sh=jnp.zeros((n, k, 3), jnp.float32),
        )


@jax.tree_util.register_dataclass
@dataclass
class Camera:
    """Camera matrices (a JAX pytree; all fields are traced arrays).

    ``view``: world -> camera 4x4 (camera looks down -Z).
    ``proj``: GL-style projection 4x4.  Pixel focal lengths are derived from
    the projection matrix exactly like the reference derives them from the
    three.js camera (/root/reference/src/Viewer.js:651-677):
    ``fx = proj[0,0] * W / 2``, ``fy = proj[1,1] * H / 2``.
    ``cam_pos``: camera position in world space (for SH view directions).
    """

    view: jnp.ndarray      # [4, 4]
    proj: jnp.ndarray      # [4, 4]
    cam_pos: jnp.ndarray   # [3]

    @staticmethod
    def look_at(eye, target, up=(0.0, 1.0, 0.0), fov_y_deg: float = 60.0,
                aspect: float = 1.0, near: float = 0.1, far: float = 500.0
                ) -> "Camera":
        view = math3d.look_at_view_matrix(eye, target, up)
        proj = math3d.perspective_projection(fov_y_deg, aspect, near, far)
        return Camera(view=view, proj=proj,
                      cam_pos=jnp.asarray(eye, jnp.float32))

    @staticmethod
    def orthographic(eye, target, up=(0.0, 1.0, 0.0), half_height: float = 1.0,
                     aspect: float = 1.0, near: float = 0.1, far: float = 500.0
                     ) -> "Camera":
        view = math3d.look_at_view_matrix(eye, target, up)
        hh = half_height
        hw = half_height * aspect
        proj = math3d.orthographic_projection(-hw, hw, -hh, hh, near, far)
        return Camera(view=view, proj=proj,
                      cam_pos=jnp.asarray(eye, jnp.float32))


@dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable; safe as a jit static arg).

    Mirrors the reference Viewer/material option surface
    (/root/reference/src/Viewer.js:43-287):
      - ``sh_degree``                <- maxSphericalHarmonicsDegree (clamped)
      - ``kernel_2d_size``           <- kernel2DSize (default 0.3)
      - ``antialiased``              <- antialiased
      - ``splat_scale``              <- splatScale
      - ``max_screen_space_splat_size`` <- maxScreenSpaceSplatSize
      - ``point_cloud_mode``         <- pointCloudModeEnabled
      - ``sort_bits``                <- splatSortDistanceMapPrecision
      - ``render_mode_2d``           <- SplatRenderMode.TwoD
      - ``orthographic``             <- camera.isOrthographicCamera
      - ``focal_adjustment``         <- focalAdjustment
    plus TPU-side knobs (tile size, pair capacity, chunking).
    """

    width: int = 800
    height: int = 600
    sh_degree: int = 0
    kernel_2d_size: float = DEFAULT_KERNEL_2D_SIZE
    antialiased: bool = False
    splat_scale: float = 1.0
    max_screen_space_splat_size: float = DEFAULT_MAX_SCREEN_SPACE_SPLAT_SIZE
    point_cloud_mode: bool = False
    render_mode_2d: bool = False
    orthographic: bool = False
    # Focal-length multiplier for splat screen extents (reference
    # focalAdjustment, Viewer.js:208 + SplatMesh.updateUniforms): scales the
    # EWA Jacobian's focal, so splat footprints grow/shrink without moving
    # projected centers — the reference's sharpness knob for stereo/VR.
    focal_adjustment: float = 1.0
    sort_bits: int = DEFAULT_SORT_BITS
    min_alpha: float = 1.0 / 255.0
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # Emit a per-pixel ``depth`` channel (alpha-weighted mean of the same
    # clip-space-z depth key the sorter uses; 0 where nothing was hit).
    # The TPU analogue of the reference's depth-composited overlay quad
    # (/root/reference/src/SceneHelper.js:38-91): lets callers z-composite
    # splat renders with other 3D content.  Differentiable (depth rides the
    # record sort as a gradient-carrying field), so depth-supervised
    # training losses work.
    return_depth: bool = False

    # --- TPU pipeline knobs ---
    # Compositor backend: 'pallas' (on-chip kernels), 'jax' (pure-JAX scan,
    # the CPU/interpret fallback and the readable reference), or 'auto'
    # (pallas on TPU backends, jax elsewhere).
    backend: str = "auto"
    tile_size: int = DEFAULT_TILE_SIZE
    # Total capacity of the (tile, splat) pair list as a multiple of N.
    pair_multiplier: float = 4.0
    # Hard cap on the pair list (overrides pair_multiplier when smaller).
    max_pairs: Optional[int] = None
    # Lanes in the fused expand+sort path (binning.bin_sort_records): each
    # lane is N gather-free slots covering one tile of a splat's rect.
    # 4 covers every rect up to 2x2 tiles; 2 covers 1x2/2x1; 1 covers
    # single-tile only.  2 is the throughput sweet spot at real splat
    # sizes (~1.5 pairs/splat): the dominant cost is the S = lanes*N +
    # aux sort, and the compacted aux table absorbs >2-tile splats
    # cheaply.
    lanes: int = 2
    # Aux-slot budget (multiple of N) for splats whose tile rect exceeds
    # the lanes.  <= 0 disables the aux path entirely, dropping (and
    # counting in ``overflow``) any beyond-lane pairs.
    aux_multiplier: float = 0.25
    # Pair-record precision through the fused expand+sort (each packed pair
    # removes one full value operand from the dominant sort):
    #   'f32'    every field exact (finite-difference-grade gradients)
    #   'mixed'  geometry exact; color/opacity as f16 pairs — still above
    #            the reference's fidelity, which stores color as u8 texels
    #            (SplatMesh color texture)
    #   'packed' the view/serving mode: positions u16 fixed point (1/16 px
    #            up to ~2K viewports, 1/8 px beyond), conic f16, color +
    #            opacity u8 (the reference's color-texel fidelity and
    #            1/255 discard threshold), support box in u8 log steps —
    #            comparable to the reference's compressed .ksplat levels
    # Gradients are straight-through in all modes.
    record_precision: str = "mixed"
    # Forward-only rendering (viewing/serving): drops the sorted-slot
    # permutation operand from the dominant pair sort — the operand exists
    # only to align gradients in the backward pass.  Outputs are
    # stop-gradiented; leave False for training.
    forward_only: bool = False
    # Splats processed per compositing chunk (MXU-friendly multiple of 128).
    chunk_size: int = 128

    def __post_init__(self):
        if not (MIN_SORT_BITS <= self.sort_bits <= MAX_SORT_BITS):
            raise ValueError(
                f"sort_bits must be in [{MIN_SORT_BITS}, {MAX_SORT_BITS}]")
        if self.sh_degree not in (0, 1, 2, 3):
            raise ValueError("sh_degree must be 0..3")
        if self.backend not in ("auto", "pallas", "jax"):
            raise ValueError("backend must be 'auto', 'pallas' or 'jax'")
        if self.lanes not in (1, 2, 4):
            raise ValueError("lanes must be 1, 2 or 4")
        if self.record_precision not in ("f32", "mixed", "packed"):
            raise ValueError(
                "record_precision must be 'f32', 'mixed' or 'packed'")

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_size)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_size)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    def pair_capacity(self, num_splats: int) -> int:
        cap = int(num_splats * self.pair_multiplier)
        if self.max_pairs is not None:
            cap = min(cap, self.max_pairs)
        # Round up to a chunk multiple so the compositor loop has no remainder.
        c = max(self.chunk_size, self.tile_size)
        return -(-cap // c) * c

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def derive_focal(proj: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Pixel focal lengths (fx, fy) from a GL projection matrix.

    For orthographic projections this returns pixels-per-world-unit, which is
    what the orthographic EWA Jacobian needs (the reference's `orthoZoom`
    serves the same role, SplatMaterial3D.js:112-116).
    """
    return jnp.stack([proj[0, 0] * width * 0.5, proj[1, 1] * height * 0.5])


def random_splats(key, n: int, sh_degree: int = 0,
                  extent: float = 1.0) -> SplatData:
    """Synthetic random scene (used by tests and benchmarks)."""
    import jax.random as jr
    k1, k2, k3, k4, k5, k6 = jr.split(key, 6)
    means = jr.uniform(k1, (n, 3), jnp.float32, -extent, extent)
    scales = jr.uniform(k2, (n, 3), jnp.float32, 0.005, 0.05) * extent
    quats = math3d.normalize(jr.normal(k3, (n, 4), jnp.float32))
    rgb = jr.uniform(k4, (n, 3), jnp.float32, 0.0, 1.0)
    opacity = jr.uniform(k5, (n, 1), jnp.float32, 0.3, 1.0)
    colors = jnp.concatenate([rgb, opacity], axis=-1)
    k = SH_DEGREE_TO_COEFF_COUNT[sh_degree]
    sh = 0.2 * jr.normal(k6, (n, k, 3), jnp.float32)
    return SplatData(means=means, scales=scales, quats=quats,
                     colors=colors, sh=sh)
