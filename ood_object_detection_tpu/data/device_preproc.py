"""Fused on-device preprocessing: letterbox resize + normalize as one XLA graph.

The reference letterboxes on CPU workers with PIL and normalizes on GPU in
PrefetchLoader (effdet/data/loader.py:121-142, transforms.py:75-107). Here
the whole hot path is one jitted batched graph on TPU: host workers only
decode JPEG into a fixed-size uint8 canvas (+ true size), the device does
the per-image dynamic-scale resize (scale_and_translate keeps shapes
static — scale is data, not shape), pad-fill, and normalization. This is
the "fused on-device XLA preprocessing graph" of the BASELINE north star.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .transforms import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD


def _letterbox_one(canvas: jnp.ndarray, true_hw: jnp.ndarray,
                   target_hw: Tuple[int, int], method: str,
                   fill_color: jnp.ndarray,
                   dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resize the valid [true_h, true_w] region of a fixed canvas to fit
    target (aspect preserved), origin at top-left, padding filled.

    Returns (float image [H,W,3], img_scale scalar = original/target)."""
    th, tw = target_hw
    ch, cw = canvas.shape[0], canvas.shape[1]
    true_h = true_hw[0].astype(jnp.float32)
    true_w = true_hw[1].astype(jnp.float32)

    scale = jnp.minimum(th / true_h, tw / true_w)
    # match host ResizePad integer-truncated scaled size (transforms.py:86-88)
    scaled_h = jnp.floor(true_h * scale)
    scaled_w = jnp.floor(true_w * scale)

    img = canvas.astype(dtype)
    out = jax.image.scale_and_translate(
        img, (th, tw, 3), (0, 1, 2),
        jnp.array([scale, scale, 1.0], jnp.float32),
        jnp.zeros((3,), jnp.float32),
        method=method)

    yy = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1)
    valid = (yy < scaled_h) & (xx < scaled_w)
    out = jnp.where(valid[..., None], out,
                    fill_color[None, None, :].astype(out.dtype))
    return out, 1.0 / scale


@partial(jax.jit, static_argnames=("target_hw", "method", "out_dtype"))
def batched_letterbox_normalize(
        canvases: jnp.ndarray,      # [B, Hc, Wc, 3] uint8
        true_hw: jnp.ndarray,       # [B, 2] int32 (h, w) of the valid region
        target_hw: Tuple[int, int] = (512, 512),
        method: str = "linear",
        mean: Tuple[float, ...] = IMAGENET_DEFAULT_MEAN,
        std: Tuple[float, ...] = IMAGENET_DEFAULT_STD,
        fill_color: Tuple[float, ...] = (124.0, 116.0, 104.0),
        out_dtype: str = "float32",
) -> Dict[str, jnp.ndarray]:
    """Fused batch letterbox + ImageNet normalization.

    ``out_dtype='bfloat16'`` runs the resample + normalize in bf16 —
    halves preproc HBM traffic; the quantization (~0.008 on normalized
    values) is the same order as the uint8 source's 1/255 step, and the
    model casts to its compute dtype immediately anyway.

    Returns {'image': [B,H,W,3] normalized (out_dtype),
             'img_scale': [B,1], 'img_size': [B,2] (w,h original)}.
    """
    dtype = jnp.dtype(out_dtype)
    fill = jnp.asarray(fill_color, jnp.float32)

    def one(c, hw):
        img, inv_scale = _letterbox_one(c, hw, target_hw, method, fill,
                                        dtype=dtype)
        return img, inv_scale

    imgs, inv_scales = jax.vmap(one)(canvases, true_hw)
    mean_arr = (jnp.asarray(mean, jnp.float32) * 255.0).astype(dtype)
    std_inv = (1.0 / (jnp.asarray(std, jnp.float32) * 255.0)).astype(dtype)
    imgs = (imgs - mean_arr) * std_inv

    img_size_wh = jnp.stack(
        [true_hw[:, 1], true_hw[:, 0]], axis=-1).astype(jnp.float32)
    return {
        "image": imgs,
        "img_scale": inv_scales[:, None].astype(jnp.float32),
        "img_size": img_size_wh,
    }


@partial(jax.jit, static_argnames=("mean", "std"))
def normalize_uint8(images: jnp.ndarray,
                    mean: Tuple[float, ...] = IMAGENET_DEFAULT_MEAN,
                    std: Tuple[float, ...] = IMAGENET_DEFAULT_STD) -> jnp.ndarray:
    """uint8 NHWC -> normalized float32 (PrefetchLoader's on-GPU normalize,
    loader.py:121-142, as a TPU op)."""
    mean_arr = jnp.asarray(mean, jnp.float32) * 255.0
    std_arr = jnp.asarray(std, jnp.float32) * 255.0
    return (images.astype(jnp.float32) - mean_arr) / std_arr
