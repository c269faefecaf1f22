"""Bit-parity of the Pallas fused key/OOD reduce vs the XLA path.

Runs in interpret mode on CPU (fused_key_ood_reduce auto-selects interpret
off-TPU); on a real TPU backend the same tests exercise the compiled kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_object_detection_tpu.ops.pallas_reduce import fused_key_ood_reduce
from ood_object_detection_tpu.ops.post_process import (
    _packed_f32_key_reduce, _per_anchor_reduce, _unpack_f32_key)


def _levels(rng, b=2, num_classes=90, a=3, sizes=((8, 8), (4, 4), (2, 2))):
    return [jnp.asarray(
        rng.normal(-2, 3, (b, h, w, a * num_classes)).astype(np.float32))
        .astype(jnp.bfloat16) for h, w in sizes]


def test_key_bit_parity(rng):
    lvls = _levels(rng)
    key_p, ood_p = fused_key_ood_reduce(lvls, 90)
    key_x, ood_x = _packed_f32_key_reduce(lvls, 90)
    assert ood_p is None and ood_x is None
    np.testing.assert_array_equal(np.asarray(key_p), np.asarray(key_x))


def test_energy_parity(rng):
    lvls = _levels(rng)
    key_p, ood_p = fused_key_ood_reduce(lvls, 90, ood_method="energy")
    key_x, ood_x = _packed_f32_key_reduce(lvls, 90, ood_method="energy")
    np.testing.assert_array_equal(np.asarray(key_p), np.asarray(key_x))
    np.testing.assert_allclose(
        np.asarray(ood_p), np.asarray(ood_x), rtol=1e-6, atol=1e-6)


def test_key_decodes_to_anchor_argmax(rng):
    lvls = _levels(rng, num_classes=21, a=2, sizes=((4, 4), (2, 2)))
    key, _ = fused_key_ood_reduce(lvls, 21)
    logits, classes = _unpack_f32_key(key)
    max_all, arg_all, _ = _per_anchor_reduce(lvls, 21)
    np.testing.assert_array_equal(
        np.asarray(logits), np.asarray(max_all.astype(jnp.float32)))
    np.testing.assert_array_equal(np.asarray(classes), np.asarray(arg_all))


def test_non_energy_methods_skip_second_reduce(rng):
    lvls = _levels(rng, sizes=((2, 2),))
    for m in ("max_logit", "msp", None):
        _, ood = fused_key_ood_reduce(lvls, 90, ood_method=m)
        assert ood is None


def test_f32_input_is_cast(rng):
    lvls = [l.astype(jnp.float32) for l in _levels(rng, sizes=((2, 2),))]
    key_p, _ = fused_key_ood_reduce(lvls, 90)
    key_x, _ = _packed_f32_key_reduce(lvls, 90)
    np.testing.assert_array_equal(np.asarray(key_p), np.asarray(key_x))


def test_odd_row_counts(rng):
    # rows = b*h*w not divisible by the preferred 512 block
    lvls = _levels(rng, b=3, sizes=((7, 5),))
    key_p, ood_p = fused_key_ood_reduce(lvls, 90, ood_method="energy")
    key_x, ood_x = _packed_f32_key_reduce(lvls, 90, ood_method="energy")
    np.testing.assert_array_equal(np.asarray(key_p), np.asarray(key_x))
    np.testing.assert_allclose(
        np.asarray(ood_p), np.asarray(ood_x), rtol=1e-6, atol=1e-6)
