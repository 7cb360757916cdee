"""Reference ("oracle") renderer: globally sorted, untiled, differentiable.

This is the allclose ground truth for the tiled/Pallas fast path, playing the
role the reference's full pipeline (WASM counting sort at
/root/reference/src/worker/sorter.cpp + the GLSL EWA rasterization at
src/splatmesh/SplatMaterial3D.js) plays in the browser:

- every visible splat is depth-sorted globally (stable, front-to-back, with
  depth keys quantized to 2^sort_bits buckets exactly like the sorter's
  distance map), then
- composited over *all* pixels with no tiling; the sqrt(8)-sigma cutoff
  guarantees the result is identical to any spatially-culled evaluation.

O(N * P) — intended for small validation scenes.  It is pure JAX and
differentiable end-to-end (the compositor chunks are checkpointed, so
`jax.grad` of a loss on the image gives exact pixel gradients w.r.t. every
splat attribute), which makes it the gradient oracle as well.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import Camera, RenderConfig, SplatData
from .compositing import composite_sorted, pixel_grid
from .projection import project_splats, quantize_depth


def reference_render(splats: SplatData, camera: Camera, cfg: RenderConfig,
                     transforms: jnp.ndarray | None = None,
                     scene_indices: jnp.ndarray | None = None,
                     scene_opacities: jnp.ndarray | None = None,
                     scene_visibility: jnp.ndarray | None = None):
    """Render one view. Returns dict with 'color' [H, W, 3] and 'alpha' [H, W].

    Row 0 of the output is the top of the image.  The background contributes
    (1 - alpha) * cfg.background.  With ``cfg.return_depth`` the dict also
    carries 'depth' [H, W]: the alpha-weighted mean of the per-splat depth
    key (0 where alpha is ~0) — depth rides the compositor as a fourth
    radiance channel, so it is differentiable like everything else.
    """
    proj = project_splats(splats, camera, cfg, transforms, scene_indices,
                          scene_opacities, scene_visibility)
    key = quantize_depth(proj.depth, proj.mask, cfg.sort_bits)
    order = jnp.argsort(key, stable=True)

    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opacity = proj.opacity[order]
    radius = proj.radius[order]
    if cfg.return_depth:
        depth = jnp.where(proj.mask, proj.depth, 0.0)[order]
        color = jnp.concatenate([color, depth[:, None]], axis=-1)

    n = mean2d.shape[0]
    c = cfg.chunk_size
    pad = (-n) % c
    if pad:
        mean2d = jnp.pad(mean2d, ((0, pad), (0, 0)))
        conic = jnp.pad(conic, ((0, pad), (0, 0)),
                        constant_values=1.0)  # benign PD conic
        color = jnp.pad(color, ((0, pad), (0, 0)))
        opacity = jnp.pad(opacity, ((0, pad),))
        radius = jnp.pad(radius, ((0, pad), (0, 0)))

    px, py = pixel_grid(cfg.width, cfg.height)
    color_acc, trans = composite_sorted(
        px, py, mean2d, conic, color, opacity, radius, cfg.min_alpha, c)

    bg = jnp.asarray(cfg.background, jnp.float32)
    alpha = 1.0 - trans
    color_img = color_acc[:, :3] + trans[:, None] * bg[None, :]
    out = {
        "color": color_img.reshape(cfg.height, cfg.width, 3),
        "alpha": alpha.reshape(cfg.height, cfg.width),
    }
    if cfg.return_depth:
        depth = color_acc[:, 3] / jnp.maximum(alpha, 1e-6)
        depth = jnp.where(alpha > 1e-6, depth, 0.0)
        out["depth"] = depth.reshape(cfg.height, cfg.width)
    return out
