"""Image pyramid + Gaussian blur.

Replaces `ORBextractor::ComputePyramid` (reference orbextractor.cpp:833-857:
8 levels, successive 1/1.2 bilinear resize) and the pre-descriptor
`GaussianBlur(7x7, sigma=2)` (orbextractor.cpp:795-800).

Everything runs as dense XLA ops (resize = gather-free bilinear via
jax.image, blur = separable depthwise convolution) which XLA fuses and maps
onto the VPU/MXU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def level_shape(height: int, width: int, scale_factor: float, level: int) -> tuple[int, int]:
    inv = 1.0 / (scale_factor ** level)
    return max(int(round(height * inv)), 32), max(int(round(width * inv)), 32)


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float) -> list[jnp.ndarray]:
    """img [H,W] float32 -> list of n_levels arrays, level l scaled by
    scale_factor^-l.  Successive resize from the previous level, matching the
    reference's cascade (orbextractor.cpp:843-853)."""
    H, W = img.shape
    levels = [img]
    for l in range(1, n_levels):
        h, w = level_shape(H, W, scale_factor, l)
        levels.append(
            jax.image.resize(levels[-1], (h, w), method="linear")
        )
    return levels


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(ksize: int, sigma: float) -> tuple[float, ...]:
    half = ksize // 2
    xs = [math.exp(-0.5 * (i / sigma) ** 2) for i in range(-half, half + 1)]
    s = sum(xs)
    return tuple(x / s for x in xs)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur with edge replication, [H,W] -> [H,W]."""
    k = _gaussian_kernel(ksize, sigma)
    half = ksize // 2
    H, W = img.shape
    # static shifted-slice accumulation: a 1-channel spatial conv cannot
    # use the MXU and lowers to a slow scalar loop on TPU (~3.3 ms at
    # 640x480); 2*ksize fused elementwise FMAs are HBM-bound (~50 us)
    x = jnp.pad(img, ((half, half), (0, 0)), mode="edge")
    y = jnp.zeros_like(img)
    for i in range(ksize):
        y = y + float(k[i]) * jax.lax.slice(x, (i, 0), (i + H, W))
    x = jnp.pad(y, ((0, 0), (half, half)), mode="edge")
    y = jnp.zeros_like(img)
    for i in range(ksize):
        y = y + float(k[i]) * jax.lax.slice(x, (0, i), (H, i + W))
    return y
