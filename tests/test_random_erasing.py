"""On-device RandomErasing (reference effdet/data/random_erasing.py:22-94)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_object_detection_tpu.data import random_erasing


@pytest.fixture
def images(rng):
    return jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32))


def test_probability_zero_is_identity(images):
    out = random_erasing(jax.random.key(0), images, probability=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(images))


def test_const_mode_erases_rectangle_with_zeros(images):
    out = np.asarray(random_erasing(
        jax.random.key(1), images, probability=1.0, mode="const",
        min_area=0.1, max_area=0.3))
    x = np.asarray(images)
    changed = np.any(out != x, axis=-1)          # [B, H, W]
    for b in range(x.shape[0]):
        assert changed[b].sum() > 0, "every image must get an erase box"
        # erased pixels are exactly 0 (the post-normalize mean)
        assert np.all(out[b][changed[b]] == 0.0)
        ys, xs = np.where(changed[b])
        # the erased region is one solid rectangle
        assert changed[b][ys.min():ys.max() + 1, xs.min():xs.max() + 1].all()


def test_pixel_mode_fills_noise(images):
    out = np.asarray(random_erasing(
        jax.random.key(2), images, probability=1.0, mode="pixel",
        min_area=0.1, max_area=0.3))
    x = np.asarray(images)
    changed = np.any(out != x, axis=-1)
    b = 0
    vals = out[b][changed[b]]
    # per-pixel noise: many distinct values, not a constant fill
    assert len(np.unique(vals.round(5))) > 10


def test_rand_mode_one_value_per_channel(images):
    out = np.asarray(random_erasing(
        jax.random.key(3), images, probability=1.0, mode="rand",
        min_area=0.1, max_area=0.3))
    x = np.asarray(images)
    changed = np.any(out != x, axis=-1)
    b = 0
    region = out[b][changed[b]]                   # [N, 3]
    assert region.shape[0] > 0
    # each channel is a single broadcast noise value
    for ch in range(3):
        assert len(np.unique(region[:, ch])) == 1


def test_deterministic_under_same_key(images):
    a = random_erasing(jax.random.key(7), images, probability=0.7)
    b = random_erasing(jax.random.key(7), images, probability=0.7)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = random_erasing(jax.random.key(8), images, probability=0.7)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_max_count_multiple_boxes(images):
    out = np.asarray(random_erasing(
        jax.random.key(4), images, probability=1.0, max_count=3,
        min_area=0.02, max_area=0.1))
    x = np.asarray(images)
    changed = np.any(out != x, axis=-1)
    assert changed[0].sum() > 0
