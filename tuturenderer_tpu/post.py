"""Post-processing: bloom (emissive extract + separable Gaussian) and
exposure tone-mapping.

Re-implements Postprocessor (Postprocessor.hpp:29-197) as jnp convolutions:
- emissive extraction: pixels with |rgb| > 3 rescaled so their max channel
  hits STRENGTH=2 (Postprocessor.hpp:122-148);
- separable Gaussian blur with KERNELSIZE=10 taps, STDDEV=30, repeated
  GAUSSIANLOOP+1 times (Postprocessor.hpp:37-45, 63-119), clamp-to-edge
  like its UV clamp;
- add back and exposure map 1 - exp(-c * EXPOSURE) (Postprocessor.hpp:
  150-166, 173-197).

Note the reference computes but never calls this pass (mains comment it
out); here it is a first-class, jittable option.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

STRENGTH = 2.0
GAUSSIANLOOP = 1
KERNELSIZE = 10
STDDEV = 30.0
EXPOSURE = 1.5


def _gaussian_kernel(size: int = KERNELSIZE, stddev: float = STDDEV):
    # taps at startX..startX+size-1 with startX = -size*0.5 truncated like
    # the C int conversion (Postprocessor.hpp:83)
    start = int(-size * 0.5)
    xs = np.arange(start, start + size, dtype=np.float64)
    g = (1.0 / np.sqrt(2 * np.pi * stddev)) * np.exp(
        -(xs * xs) / (2 * stddev * stddev))
    g = g / g.sum()
    return jnp.asarray(g, jnp.float32), start


def _blur_axis(img, axis: int):
    k, start = _gaussian_kernel()
    out = jnp.zeros_like(img)
    n = img.shape[axis]
    idx_base = jnp.arange(n)
    for i in range(KERNELSIZE):
        off = start + i
        idx = jnp.clip(idx_base + off, 0, n - 1)   # clamp-to-edge
        out = out + k[i] * jnp.take(img, idx, axis=axis)
    return out


def extract_emissive(img):
    mag = jnp.sqrt(jnp.sum(img * img, axis=-1, keepdims=True))
    mx = jnp.max(img, axis=-1, keepdims=True)
    rescaled = img / jnp.maximum(mx, 1e-20) * STRENGTH
    return jnp.where(mag > 3.0, rescaled, 0.0)


def gaussian_blur(img):
    return _blur_axis(_blur_axis(img, 0), 1)


def tonemap_exposure(img):
    return 1.0 - jnp.exp(-img * EXPOSURE)


@jax.jit
def bloom_and_tonemap(img):
    """HDR_BLOOM pipeline (Postprocessor.hpp:29-59): bloom then tone map."""
    em = extract_emissive(img)
    for _ in range(GAUSSIANLOOP + 1):
        em = gaussian_blur(em)
    return tonemap_exposure(img + em)


@jax.jit
def bloom_only(img):
    em = extract_emissive(img)
    for _ in range(GAUSSIANLOOP + 1):
        em = gaussian_blur(em)
    return img + em


@jax.jit
def hdr_only(img):
    return tonemap_exposure(img)
