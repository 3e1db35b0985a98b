"""Scopes backend: histogram, waveform, vectorscope.

Reference: `/root/reference/src/common/histogram.c` (256-bin per-channel
histogram collection over an ROI) and the darkroom scopes the GUI draws
from it (waveform: per-column intensity counts; vectorscope: chroma
plane density).  TPU form: every scope is a one-hot matmul — the image
quantized to bin indices becomes a (bins, N) selection that reduces on
the MXU; no scatters, no `jnp.histogram` gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _one_hot_counts(idx, bins: int):
    """idx (...,) int32 -> (bins,) counts via one-hot sum."""
    oh = (idx[..., None] == jnp.arange(bins, dtype=jnp.int32))
    return oh.reshape(-1, bins).sum(axis=0, dtype=jnp.float32)


def histogram_rgb(img, bins: int = 256):
    """(3, H, W) display RGB in [0,1] -> (3, bins) counts
    (histogram.c 256-bin collection)."""
    idx = jnp.clip((img * (bins - 1) + 0.5).astype(jnp.int32), 0, bins - 1)
    return jnp.stack([_one_hot_counts(idx[c], bins) for c in range(3)])


def waveform(img, bins: int = 160, out_cols: int = 0):
    """(3, H, W) -> (3, bins, W') column-intensity density (the darkroom
    waveform scope): for each output column, the vertical distribution
    of channel values."""
    c, h, w = img.shape
    out_cols = out_cols or min(w, 360)
    # pool columns to the display width
    step = max(w // out_cols, 1)
    wc = (w // step) * step
    pooled = img[:, :, :wc].reshape(c, h, wc // step, step).mean(-1)
    idx = jnp.clip((pooled * (bins - 1) + 0.5).astype(jnp.int32),
                   0, bins - 1)
    # per column: one-hot over bins summed over rows -> (bins, cols)
    oh = (idx[:, :, :, None] == jnp.arange(bins, dtype=jnp.int32))
    out = oh.sum(axis=1, dtype=jnp.float32)          # (3, cols, bins)
    return jnp.flip(jnp.moveaxis(out, -1, 1), axis=1)  # bright on top


def vectorscope(img, size: int = 128):
    """(3, H, W) -> (size, size) chroma-plane density around the neutral
    axis (CbCr-style projection of the scopes vectorscope)."""
    r, g, b = img[0], img[1], img[2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 0.5 + (b - y) * 0.564
    cr = 0.5 + (r - y) * 0.713
    ib = jnp.clip((cb * (size - 1) + 0.5).astype(jnp.int32), 0, size - 1)
    ir = jnp.clip((cr * (size - 1) + 0.5).astype(jnp.int32), 0, size - 1)
    flat = (ir * size + ib).reshape(-1)
    counts = _one_hot_counts(flat, size * size)
    return counts.reshape(size, size)


def stats(img):
    """Per-channel (mean, min, max, clipped-high fraction) — the
    overexposure indicators' numbers (histogram.c consumers)."""
    flatc = img.reshape(img.shape[0], -1)
    return {
        "mean": jnp.mean(flatc, axis=1),
        "min": jnp.min(flatc, axis=1),
        "max": jnp.max(flatc, axis=1),
        "clipped": jnp.mean((flatc >= 1.0 - 1e-6).astype(jnp.float32),
                            axis=1),
    }
