"""XLA-fused image preprocessing.

Reproduces the reference transform (``src/dataio/collate_multiview.py:12-19``):
``Resize(size, BICUBIC)`` (shorter side → size, aspect preserved) →
``CenterCrop(size)`` → ``ToTensor()`` ([0,1] CHW float), deliberately with
**no normalization** — VGGT normalizes internally (``:17``; our
``models/vggt.py`` does the same).

TPU-first: this runs as a jitted device graph (north-star requirement) instead
of PIL in DataLoader workers. PIL resizes uint8→uint8 (quantizing after the
filter); we replicate that round-trip so pixel values match torchvision within
±1/255 (bicubic kernels match: Keys a=-0.5, antialiased on downscale).

Shapes are static per (H, W) — each distinct source size compiles once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _resize_dims(h: int, w: int, size: int) -> tuple[int, int]:
    """torchvision Resize(int) semantics: shorter side → size, keep aspect."""
    if h <= w:
        return size, max(size, int(round(size * w / h)))
    return max(size, int(round(size * h / w))), size


@partial(jax.jit, static_argnames=("size",))
def _resize_crop_kernel(img: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    nh, nw = _resize_dims(h, w, size)
    x = img.astype(jnp.float32)
    x = jax.image.resize(x, (nh, nw, 3), method="cubic", antialias=True)
    # PIL quantizes to uint8 after the filter; match that rounding.
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    top = int(round((nh - size) / 2.0))
    left = int(round((nw - size) / 2.0))
    x = jax.lax.dynamic_slice(x, (top, left, 0), (size, size, 3))
    return (x / 255.0).transpose(2, 0, 1)  # CHW in [0,1]


def resize_center_crop(image_u8, size: int) -> jnp.ndarray:
    """[H, W, 3] uint8 → [3, size, size] float32 in [0, 1]."""
    img = jnp.asarray(image_u8)
    assert img.ndim == 3 and img.shape[-1] == 3, img.shape
    return _resize_crop_kernel(img, size)


def preprocess_views(images_u8, size: int) -> jnp.ndarray:
    """List of [H, W, 3] uint8 arrays (any sizes) → [V, 3, size, size]."""
    return jnp.stack([resize_center_crop(im, size) for im in images_u8], axis=0)
