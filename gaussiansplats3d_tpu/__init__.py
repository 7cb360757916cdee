"""gaussiansplats3d_tpu — a TPU-native differentiable Gaussian-splat renderer.

A from-scratch JAX/Pallas framework with the capabilities of
mkkellogg/GaussianSplats3D: multi-format ingest (.ply/.splat/.ksplat/.spz),
SH-shaded EWA splat projection, on-chip depth sort + tile binning,
front-to-back compositing with a full backward pass, multi-scene composition,
and multi-chip sharding via jax.sharding meshes.
"""

from . import io  # noqa: F401
from . import utils  # noqa: F401
from . import viewer  # noqa: F401
from .constants import MAX_SCENES  # noqa: F401
from .core.bake import bake_transform  # noqa: F401
from .core.types import Camera, RenderConfig, SplatData, random_splats  # noqa: F401
from .io import load, save  # noqa: F401
from .render.oracle import reference_render  # noqa: F401
from .render.pipeline import render, render_batch, stack_cameras  # noqa: F401
from .viewer import OrbitCamera, Viewer  # noqa: F401

__version__ = "0.1.0"
