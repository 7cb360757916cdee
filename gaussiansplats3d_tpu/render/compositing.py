"""Front-to-back alpha compositing via log-transmittance prefix sums.

The reference composites back-to-front with GL NormalBlending over depth-sorted
quads (/root/reference/src/splatmesh/SplatMaterial3D.js:234-252 + the sorted
instance order).  Front-to-back compositing with a running transmittance T is
the exact same operator:

    C = sum_i T_i * alpha_i * c_i,   T_{i+1} = T_i * (1 - alpha_i),  T_0 = 1

TPU-first formulation: instead of a scalar sequential blend per fragment, we
process splats in chunks of C and express the in-chunk prefix products as an
exclusive cumulative sum of log(1 - alpha) — which the Pallas kernel computes
as a strictly-lower-triangular [C, C] @ [C, P] matmul on the MXU, and the
per-pixel weighted color sum as a [P, C] @ [C, 4] matmul.  This turns alpha
blending from a VPU-serial operation into MXU work.

Per-fragment semantics (shared by the oracle and the tiled/Pallas paths so
that they agree bit-for-nearly):

    G     = a dx^2 + 2 b dx dy + c dy^2       (conic quadratic form)
    alpha = opacity * exp(-0.5 G)
    alpha = 0        where G > 8 (sqrt(8)-sigma cutoff) or alpha < 1/255
    alpha = min(alpha, 0.999)                  (keeps backward stable)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import ALPHA_CLAMP, GAUSSIAN_CUTOFF


def splat_alphas(px: jnp.ndarray, py: jnp.ndarray,
                 mean2d: jnp.ndarray, conic: jnp.ndarray,
                 opacity: jnp.ndarray, radius: jnp.ndarray,
                 min_alpha: float) -> jnp.ndarray:
    """Evaluate per-(splat, pixel) alphas.

    Args:
      px, py: ``[P]`` pixel center coordinates (GL orientation).
      mean2d: ``[C, 2]``; conic: ``[C, 3]``; opacity: ``[C]``;
      radius: ``[C, 2]`` support-box half-extents (hard cutoff).
    Returns ``[C, P]`` alphas.
    """
    dx = px[None, :] - mean2d[:, 0:1]
    dy = py[None, :] - mean2d[:, 1:2]
    g = (conic[:, 0:1] * dx * dx + 2.0 * conic[:, 1:2] * dx * dy
         + conic[:, 2:3] * dy * dy)
    alpha = opacity[:, None] * jnp.exp(-0.5 * g)
    outside = ((g > GAUSSIAN_CUTOFF) | (alpha < min_alpha)
               | (jnp.abs(dx) > radius[:, 0:1])
               | (jnp.abs(dy) > radius[:, 1:2]))
    alpha = jnp.where(outside, 0.0, alpha)
    return jnp.minimum(alpha, ALPHA_CLAMP)


def composite_chunk(px, py, mean2d, conic, color, opacity, radius, min_alpha,
                    color_acc, trans):
    """Composite one chunk of C splats (front-to-back order) over P pixels.

    ``color`` may carry any number of channels K (RGB, or RGB + depth when
    a depth map is requested).  Returns updated (color_acc [P, K], trans [P]).
    """
    alpha = splat_alphas(px, py, mean2d, conic, opacity, radius,
                         min_alpha)  # [C, P]
    log_omega = jnp.log1p(-alpha)
    # Exclusive prefix sum along the splat axis: log prod_{j<i} (1 - alpha_j).
    excl = jnp.cumsum(log_omega, axis=0) - log_omega
    w = alpha * jnp.exp(excl) * trans[None, :]                       # [C, P]
    color_acc = color_acc + jnp.einsum(
        "cp,ck->pk", w, color, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    trans = trans * jnp.exp(jnp.sum(log_omega, axis=0))
    return color_acc, trans


def composite_sorted(px, py, mean2d, conic, color, opacity, radius, min_alpha,
                     chunk_size: int):
    """Composite depth-sorted splats over pixels, chunked and checkpointed.

    All splat arrays must already be front-to-back sorted and padded to a
    multiple of `chunk_size` (pad with opacity == 0).

    Returns (color [P, K], trans [P]).
    """
    p = px.shape[0]
    n = mean2d.shape[0]
    k = color.shape[-1]
    assert n % chunk_size == 0, (n, chunk_size)
    num_chunks = n // chunk_size

    def body(carry, chunk):
        color_acc, trans = carry
        m2, cn, cl, op, rd = chunk
        color_acc, trans = composite_chunk(
            px, py, m2, cn, cl, op, rd, min_alpha, color_acc, trans)
        return (color_acc, trans), None

    chunks = (
        mean2d.reshape(num_chunks, chunk_size, 2),
        conic.reshape(num_chunks, chunk_size, 3),
        color.reshape(num_chunks, chunk_size, k),
        opacity.reshape(num_chunks, chunk_size),
        radius.reshape(num_chunks, chunk_size, 2),
    )
    init = (jnp.zeros((p, k), jnp.float32), jnp.ones((p,), jnp.float32))
    (color_acc, trans), _ = jax.lax.scan(
        jax.checkpoint(body), init, chunks)
    return color_acc, trans


def pixel_grid(width: int, height: int):
    """Flat GL-oriented pixel center coordinates for a full image.

    Row 0 of the output image is the top of the screen; GL y points up, so
    row r has y = height - (r + 0.5).
    """
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    ys = height - (jnp.arange(height, dtype=jnp.float32) + 0.5)
    px = jnp.tile(xs, height)
    py = jnp.repeat(ys, width)
    return px, py
