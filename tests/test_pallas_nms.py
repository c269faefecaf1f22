import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_object_detection_tpu.ops.nms import nms_fixed, soft_nms_fixed
from ood_object_detection_tpu.ops.pallas_nms import pallas_batched_nms


def _random(rng, b=4, n=256):
    x1 = rng.uniform(0, 300, (b, n))
    y1 = rng.uniform(0, 300, (b, n))
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(5, 60, (b, n)),
         y1 + rng.uniform(5, 60, (b, n))], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    return boxes, scores


def test_pallas_hard_nms_matches_xla(rng):
    boxes, scores = _random(rng)
    ki_p, ks_p = pallas_batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    max_out=50, iou_threshold=0.3)
    ki_x, ks_x = jax.jit(jax.vmap(
        lambda b, s: nms_fixed(b, s, 0.3, 50)))(jnp.asarray(boxes),
                                                jnp.asarray(scores))
    np.testing.assert_array_equal(np.asarray(ki_p), np.asarray(ki_x))
    np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_x), rtol=1e-6)


def test_pallas_soft_nms_matches_xla(rng):
    boxes, scores = _random(rng)
    ki_p, ks_p = pallas_batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    max_out=50, soft=True, iou_threshold=0.3)
    ki_x, ks_x = jax.jit(jax.vmap(
        lambda b, s: soft_nms_fixed(b, s, 50, iou_threshold=0.3)))(
            jnp.asarray(boxes), jnp.asarray(scores))
    np.testing.assert_array_equal(np.asarray(ki_p), np.asarray(ki_x))
    np.testing.assert_allclose(np.asarray(ks_p), np.asarray(ks_x), rtol=1e-4)


def test_pallas_nms_padding_rows(rng):
    boxes = np.array([[[0, 0, 10, 10], [100, 100, 110, 110]]], np.float32)
    scores = np.array([[0.9, 0.0]], np.float32)
    ki, ks = pallas_batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                max_out=4, iou_threshold=0.5)
    np.testing.assert_array_equal(np.asarray(ki)[0], [0, -1, -1, -1])
    np.testing.assert_allclose(np.asarray(ks)[0], [0.9, 0, 0, 0])
