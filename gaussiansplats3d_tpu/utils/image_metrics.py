"""Image-quality metrics for splat training/eval: PSNR and SSIM.

The reference viewer renders but never trains, so it has no quality
metrics; 3DGS training pipelines standardly report PSNR/SSIM and optimize
``0.8 * L1 + 0.2 * (1 - SSIM)`` (the original 3DGS paper's loss).  Both
metrics here are pure-jnp, jittable and differentiable, so they slot into
sharded training losses directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(img: jnp.ndarray, ref: jnp.ndarray, max_val: float = 1.0
         ) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over all pixels/channels."""
    mse = jnp.mean((img - ref) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / jnp.sum(g)


def ssim(img: jnp.ndarray, ref: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] (or [H, W]) image pair.

    Separable-Gaussian-window SSIM (Wang et al. 2004) with the standard
    K1=0.01 / K2=0.03 constants — the construction used by the original
    3DGS training loss.  Differentiable; use ``1 - ssim(...)`` as a loss.
    """
    if img.ndim == 2:
        img = img[..., None]
        ref = ref[..., None]
    img = img.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    k = _gaussian_kernel(kernel_size, sigma)

    def blur(x):  # separable [H, W, C] Gaussian, SAME padding
        x = jnp.moveaxis(x, -1, 0)[:, None]            # [C, 1, H, W]
        kh = k.reshape(1, 1, kernel_size, 1)
        kw = k.reshape(1, 1, 1, kernel_size)
        for kk in (kh, kw):
            x = jax.lax.conv_general_dilated(
                x, kk, window_strides=(1, 1), padding="SAME")
        return jnp.moveaxis(x[:, 0], 0, -1)            # [H, W, C]

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = blur(img)
    mu_y = blur(ref)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = blur(img * img) - mu_x2
    sig_y = blur(ref * ref) - mu_y2
    sig_xy = blur(img * ref) - mu_xy
    num = (2.0 * mu_xy + c1) * (2.0 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    return jnp.mean(num / den)


def d_ssim_l1_loss(img: jnp.ndarray, ref: jnp.ndarray,
                   ssim_weight: float = 0.2) -> jnp.ndarray:
    """The 3DGS paper's training loss: (1-w) * L1 + w * (1 - SSIM)."""
    l1 = jnp.mean(jnp.abs(img - ref))
    return (1.0 - ssim_weight) * l1 + ssim_weight * (1.0 - ssim(img, ref))
