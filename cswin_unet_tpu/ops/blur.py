"""Gaussian blur: device-fused (separable XLA convs) + scipy-parity host path.

The reference's robustness tooling blurs datasets offline with
``scipy.ndimage.gaussian_filter`` (σ=1.0 train slices, apply_blur_train.py:150;
σ=1.5 test volumes, apply_blur_test.py:81,164). The device path reproduces
scipy's semantics — truncated kernel radius ``int(4σ + 0.5)``, 'reflect'
boundary (= numpy 'symmetric') — as two 1-D convolutions fused by XLA, so
blur-augmented training can run with zero host-side Python in the hot loop
(the BASELINE.json north star).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage._gaussian_kernel1d semantics (normalized, radius
    int(truncate·σ + 0.5))."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_2d(images: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Blur (..., H, W) along the last two axes, scipy 'reflect' boundary."""
    k = jnp.asarray(gaussian_kernel_1d(sigma, truncate))
    r = (k.shape[0] - 1) // 2
    orig_shape = images.shape
    H, W = orig_shape[-2:]
    x = images.reshape((-1, H, W, 1)).astype(jnp.float32)

    # scipy mode='reflect' == numpy pad mode='symmetric' (edge included)
    x = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="symmetric")
    kh = k.reshape(-1, 1, 1, 1)
    kw = k.reshape(1, -1, 1, 1)
    x = lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x = lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return x.reshape(orig_shape)


def gaussian_blur_host(image: np.ndarray, sigma: float) -> np.ndarray:
    """scipy reference path (offline tooling)."""
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(image, sigma=sigma)
