"""On-device RandomErasing for detection (multi-scale variant).

Equivalent of the reference effdet/data/random_erasing.py:22-94 (const /
rand / pixel fill modes, up to ``max_count`` erase rectangles per image,
applied after normalization on the accelerator) — here a pure jnp function
on the batch, driven by a PRNG key, so it fuses into the input pipeline's
device graph.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=(
    "probability", "min_area", "max_area", "min_aspect", "max_count", "mode"))
def random_erasing(
        key: jax.Array,
        images: jnp.ndarray,          # [B, H, W, C] normalized float
        probability: float = 0.5,
        min_area: float = 0.02,
        max_area: float = 1 / 3,
        min_aspect: float = 0.3,
        max_count: int = 1,
        mode: str = "const") -> jnp.ndarray:
    """Erase up to max_count random rectangles per image.

    mode: 'const' fills 0 (post-normalize mean), 'rand' one noise value per
    channel per box, 'pixel' per-pixel noise (reference modes, :22-40).
    """
    b, h, w, c = images.shape
    max_aspect = 1.0 / min_aspect
    log_ratio = (jnp.log(min_aspect), jnp.log(max_aspect))

    def erase_one(img, key):
        def body(i, carry):
            img, key = carry
            key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
            do = jax.random.uniform(k1) < probability
            area = h * w * jax.random.uniform(k2, minval=min_area,
                                              maxval=max_area)
            aspect = jnp.exp(jax.random.uniform(
                k3, minval=log_ratio[0], maxval=log_ratio[1]))
            eh = jnp.clip(jnp.sqrt(area * aspect), 1, h - 1).astype(jnp.int32)
            ew = jnp.clip(jnp.sqrt(area / aspect), 1, w - 1).astype(jnp.int32)
            top = jax.random.randint(k4, (), 0, jnp.maximum(h - eh, 1))
            left = jax.random.randint(k5, (), 0, jnp.maximum(w - ew, 1))

            yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            inside = ((yy >= top) & (yy < top + eh) &
                      (xx >= left) & (xx < left + ew) & do)

            if mode == "pixel":
                fill = jax.random.normal(k6, img.shape, img.dtype)
            elif mode == "rand":
                fill = jnp.broadcast_to(
                    jax.random.normal(k6, (1, 1, c), img.dtype), img.shape)
            else:
                fill = jnp.zeros_like(img)
            img = jnp.where(inside[..., None], fill, img)
            return img, key

        img, _ = jax.lax.fori_loop(0, max_count, body, (img, key))
        return img

    keys = jax.random.split(key, b)
    return jax.vmap(erase_one)(images, keys)
