"""Framework-wide constants.

These mirror the semantic constants of the reference implementation
(mkkellogg/GaussianSplats3D) so that rendered output is comparable:

- ``MAX_SCENES``/``PROGRESSIVE_LOAD_SECTION_SIZE``/``SPH_8BIT_RANGE``:
  /root/reference/src/Constants.js:1-11
- SH band constants: /root/reference/src/splatmesh/SplatMaterial.js:109-110
  (SH_C0 is baked into colors at load time, see
  /root/reference/src/loaders/ply/INRIAV1PlyParser.js:143-207)
- Gaussian cutoff (sqrt(8) sigma) and min alpha:
  /root/reference/src/splatmesh/SplatMaterial.js:80-81 and
  /root/reference/src/splatmesh/SplatMaterial3D.js:237-248
- 2D kernel dilation default (0.3):
  /root/reference/src/splatmesh/SplatMaterial3D.js:21
- Default depth-sort precision (2^16 buckets):
  /root/reference/src/Constants.js:3 (DepthMapRange)
"""

import math

# --- multi-scene composition -------------------------------------------------
MAX_SCENES = 32
PROGRESSIVE_LOAD_SECTION_SIZE = 262144
SPHERICAL_HARMONICS_8BIT_RANGE = 3.0  # compression range for 8-bit SH

# --- spherical harmonics -----------------------------------------------------
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)

# SH component counts (floats) for degrees 0..3, excluding the DC band which
# is baked into the base color (reference: Util.js:166-178).
SH_DEGREE_TO_COMPONENT_COUNT = {0: 0, 1: 9, 2: 24, 3: 45}
# Number of (r,g,b) coefficient triplets per degree, excluding DC.
SH_DEGREE_TO_COEFF_COUNT = {0: 0, 1: 3, 2: 8, 3: 15}

# --- rasterization semantics ---------------------------------------------------
SQRT8 = math.sqrt(8.0)
GAUSSIAN_CUTOFF = 8.0          # discard fragments with d^T Sigma^-1 d > 8
MIN_ALPHA = 1.0 / 255.0        # minimum contributing alpha
ALPHA_CLAMP = 0.999            # keep (1 - alpha) > 0 for a stable backward pass
EIGENVALUE_GUARD = 0.1         # max(0.1, discriminant) guard in 2x2 eigensolve
CLIP_FACTOR = 1.2              # clip-space cull at 1.2 * w
DEFAULT_KERNEL_2D_SIZE = 0.3
DEFAULT_MAX_SCREEN_SPACE_SPLAT_SIZE = 1024.0
POINT_CLOUD_EIGENVALUE = 0.2   # point-cloud mode renders fixed-size discs

# --- depth sort ----------------------------------------------------------------
DEFAULT_SORT_BITS = 16         # 2^16 depth buckets (DepthMapRange)
MIN_SORT_BITS = 10
MAX_SORT_BITS = 24

# --- tiling --------------------------------------------------------------------
# 32x32-pixel tiles flatten to 1024 = (8, 128) float32 vector registers on the
# TPU VPU, so one tile's pixel state occupies exactly one vreg per channel.
DEFAULT_TILE_SIZE = 32

# transmittance early-exit threshold for the front-to-back compositor
TRANSMITTANCE_EPS = 1.0 / 255.0
