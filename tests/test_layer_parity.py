"""Activation parity of the conv building blocks vs torch.

The reference model can't be instantiated here (it imports timm), but the
building blocks CAN be checked against raw torch ops with shared weights:
SeparableConv (depthwise+pointwise, reference efficientdet.py:60-83),
ConvBnAct, and the TF-SAME padding variants — the exact pieces whose
layout conversion (OIHW->HWIO) the checkpoint converter relies on.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ood_object_detection_tpu.models.layers import (  # noqa: E402
    ConvBnAct,
    SeparableConv,
)


def _torch_conv(x_nhwc, weight_hwio, stride=1, padding=0, groups=1,
                bias=None):
    """Run torch conv2d on NHWC input with HWIO weights; return NHWC."""
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    # HWIO -> OIHW (per-group I)
    w = torch.from_numpy(np.transpose(weight_hwio, (3, 2, 0, 1)))
    b = torch.from_numpy(bias) if bias is not None else None
    y = torch.nn.functional.conv2d(x, w, b, stride=stride, padding=padding,
                                   groups=groups)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def _tf_same_pad(x_nhwc, k, s):
    """TF-SAME pre-padding for torch (asymmetric, bottom/right heavy)."""
    h, w = x_nhwc.shape[1:3]
    pad_h = max((int(np.ceil(h / s)) - 1) * s + k - h, 0)
    pad_w = max((int(np.ceil(w / s)) - 1) * s + k - w, 0)
    return np.pad(x_nhwc, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                           (pad_w // 2, pad_w - pad_w // 2), (0, 0)))


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_bn_act_matches_torch(rng, stride):
    """PyTorch-style symmetric padding path (pad_type='')."""
    x = rng.normal(0, 1, (2, 9, 9, 4)).astype(np.float32)
    import jax
    m = ConvBnAct(out_channels=6, kernel_size=3, stride=stride,
                  norm=False, act_type=None, bias=True)
    variables = m.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    w = np.asarray(variables["params"]["conv"]["kernel"])
    b = np.asarray(variables["params"]["conv"]["bias"])
    theirs = _torch_conv(x, w, stride=stride, padding=1, bias=b)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_bn_act_tf_same_matches_torch(rng, stride):
    """tf_ variants use TF-SAME (asymmetric) padding — must match the
    manual-pad torch computation (reference pad_type='same' path)."""
    x = rng.normal(0, 1, (2, 9, 9, 4)).astype(np.float32)
    m = ConvBnAct(out_channels=6, kernel_size=3, stride=stride,
                  pad_type="same", norm=False, act_type=None, bias=True)
    import jax
    variables = m.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    w = np.asarray(variables["params"]["conv"]["kernel"])
    b = np.asarray(variables["params"]["conv"]["bias"])
    theirs = _torch_conv(_tf_same_pad(x, 3, stride), w, stride=stride,
                         padding=0, bias=b)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_separable_conv_matches_torch(rng):
    """Depthwise + pointwise with shared weights == torch grouped conv
    chain (reference SeparableConv2d, efficientdet.py:60-83)."""
    import jax
    x = rng.normal(0, 1, (2, 8, 8, 6)).astype(np.float32)
    m = SeparableConv(out_channels=10, kernel_size=3, norm=False,
                      act_type=None, bias=True)
    variables = m.init(jax.random.key(1), jnp.asarray(x))
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    w_dw = np.asarray(variables["params"]["conv_dw"]["kernel"])  # [3,3,1,6]
    w_pw = np.asarray(variables["params"]["conv_pw"]["kernel"])  # [1,1,6,10]
    b_pw = np.asarray(variables["params"]["conv_pw"]["bias"])
    mid = _torch_conv(x, w_dw, stride=1, padding=1, groups=6)
    theirs = _torch_conv(mid, w_pw, stride=1, padding=0, bias=b_pw)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_bn_matches_torch(rng):
    """BN eval-mode semantics (running stats, eps=1e-3) match torch."""
    import jax
    x = rng.normal(0, 1, (2, 6, 6, 4)).astype(np.float32)
    m = ConvBnAct(out_channels=4, kernel_size=1, norm=True, act_type=None)
    variables = m.init(jax.random.key(2), jnp.asarray(x))
    # plant non-trivial running stats
    import flax
    variables = flax.core.unfreeze(variables)
    bn_stats = variables["batch_stats"]
    bn_key = list(bn_stats.keys())[0]
    bn_stats[bn_key]["mean"] = jnp.asarray(
        rng.normal(0, 1, 4).astype(np.float32))
    bn_stats[bn_key]["var"] = jnp.asarray(
        rng.uniform(0.5, 2, 4).astype(np.float32))
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    w = np.asarray(variables["params"]["conv"]["kernel"])
    params_bn = variables["params"][bn_key]
    conv = _torch_conv(x, w, stride=1, padding=0)
    tb = torch.nn.BatchNorm2d(4, eps=1e-3)
    tb.weight.data = torch.from_numpy(np.asarray(params_bn["scale"]))
    tb.bias.data = torch.from_numpy(np.asarray(params_bn["bias"]))
    tb.running_mean.data = torch.from_numpy(
        np.asarray(bn_stats[bn_key]["mean"]))
    tb.running_var.data = torch.from_numpy(
        np.asarray(bn_stats[bn_key]["var"]))
    tb.eval()
    with torch.no_grad():
        theirs = tb(torch.from_numpy(
            np.transpose(conv, (0, 3, 1, 2)))).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
