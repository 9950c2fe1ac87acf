"""Quality metrics on device: PSNR / SSIM / temporal consistency.

The reference computes PSNR/SSIM per frame with cv2 on the host
(reference app.py:1579-1602; quality metrics in
agents/quality_assessor/quality_agent.py:274-318). Here metrics are jitted
jnp graphs over whole clips; SSIM follows the standard Wang et al. settings
(11x11 Gaussian, sigma 1.5, K1=0.01, K2=0.03) and matches scikit-image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "temporal_consistency", "evaluate_pair"]


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR in dB over all dims except an optional leading batch."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=8)
def _gauss_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def _filter2(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 'valid' Gaussian filter over (H, W) of (H, W, C)."""
    kh = k[:, None, None, None]  # (k,1,1,1) DHWIO-ish for conv over H
    img4 = img[None]  # (1,H,W,C)
    from jax import lax

    out = lax.conv_general_dilated(
        img4, jnp.tile(k[:, None, None, None], (1, 1, 1, img.shape[-1])),
        (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=img.shape[-1],
    )
    out = lax.conv_general_dilated(
        out, jnp.tile(k[None, :, None, None], (1, 1, 1, img.shape[-1])),
        (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=img.shape[-1],
    )
    return out[0]


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over an image ``(H, W, C)`` or clip ``(T, H, W, C)``."""
    if a.ndim == 4:
        return jnp.mean(jax.vmap(lambda x, y: ssim(x, y, max_val))(a, b))
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    k = jnp.asarray(_gauss_kernel())
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _filter2(a, k)
    mu_b = _filter2(b, k)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = _filter2(a * a, k) - mu_aa
    var_b = _filter2(b * b, k) - mu_bb
    cov = _filter2(a * b, k) - mu_ab
    num = (2 * mu_ab + c1) * (2 * cov + c2)
    den = (mu_aa + mu_bb + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


def temporal_consistency(clip: jnp.ndarray) -> jnp.ndarray:
    """1 - mean abs frame difference (reference quality_agent.py:450-471)."""
    clip = clip.astype(jnp.float32)
    diff = jnp.mean(jnp.abs(clip[1:] - clip[:-1]))
    return 1.0 - diff


@jax.jit
def evaluate_pair(out_clip: jnp.ndarray, ref_clip: jnp.ndarray) -> dict:
    return {
        "psnr": psnr(out_clip, ref_clip),
        "ssim": ssim(out_clip, ref_clip),
        "temporal_consistency": temporal_consistency(out_clip),
    }
