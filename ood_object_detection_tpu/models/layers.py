"""Building-block layers: activations, padding, conv blocks, resampling.

TPU-first equivalents of the reference's conv building blocks
(ConvBnAct2d/SeparableConv2d/Interpolate2d/ResampleFeatureMap,
effdet/efficientdet.py:42-177): NHWC layout throughout (XLA's native TPU
conv layout), Flax linen modules, explicit `training` flag for BN.

Padding: ``pad_type='same'`` is TF SAME (asymmetric for stride>1, what the
tf_* checkpoints need); ``pad_type=''`` is symmetric k//2 padding (the
PyTorch convention the efficientdet_* variants use). The two coincide for
stride 1 / odd kernels.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any

# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

_ACTS: dict[str, Callable] = {
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "hard_swish": jax.nn.hard_swish,
    "hard_sigmoid": jax.nn.hard_sigmoid,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
}


def get_act(name: Optional[str]) -> Callable:
    if name is None:
        return _ACTS["swish"]
    return _ACTS[name]


# ---------------------------------------------------------------------------
# padding
# ---------------------------------------------------------------------------

def conv_padding(pad_type: str, kernel_size: int, stride: int = 1,
                 dilation: int = 1) -> Union[str, Sequence[Tuple[int, int]]]:
    """Resolve a pad_type string to a lax conv padding spec."""
    if pad_type in ("same", "SAME"):
        return "SAME"
    # '' = PyTorch-style fixed symmetric padding
    pad = ((kernel_size - 1) // 2) * dilation
    return [(pad, pad), (pad, pad)]


def pool_padding(pad_type: str, kernel_size: int, stride: int,
                 input_size: Tuple[int, int]) -> Sequence[Tuple[int, int]]:
    """Padding for pooling. TF SAME pooling pads asymmetrically (low side
    gets the smaller pad); '' pads symmetrically by (k-1)//2."""
    if pad_type in ("same", "SAME"):
        pads = []
        for dim in range(2):
            in_sz = input_size[dim]
            out_sz = -(-in_sz // stride)
            total = max((out_sz - 1) * stride + kernel_size - in_sz, 0)
            pads.append((total // 2, total - total // 2))
        return pads
    pad = (kernel_size - 1) // 2
    return [(pad, pad), (pad, pad)]


# ---------------------------------------------------------------------------
# initializers (TF official EfficientDet scheme, effdet/efficientdet.py:472-537)
# ---------------------------------------------------------------------------

def glorot_uniform_conv():
    """fan-avg uniform (TF glorot) over conv kernel dims."""
    return nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


def variance_scaling_fan_in():
    """fan-in normal, used for head separable convs."""
    return nn.initializers.variance_scaling(1.0, "fan_in", "normal")


def head_normal_init(std: float = 0.01):
    return nn.initializers.normal(stddev=std)


def prior_prob_bias(prior: float = 0.01):
    """Focal-loss prior bias: -log((1-p)/p)."""
    import math
    val = -math.log((1 - prior) / prior)
    return nn.initializers.constant(val)


# ---------------------------------------------------------------------------
# norm
# ---------------------------------------------------------------------------

def batch_norm(momentum: float = 0.01, eps: float = 1e-3,
               dtype=jnp.float32, name: str = "bn") -> nn.BatchNorm:
    """nn.BatchNorm with torch-style momentum semantics (running stat
    update fraction = ``momentum``), eps 1e-3 per the model configs.
    Call with ``use_running_average=not training``."""
    return nn.BatchNorm(momentum=1.0 - momentum, epsilon=eps, dtype=dtype,
                        name=name, use_running_average=None)


# ---------------------------------------------------------------------------
# conv blocks
# ---------------------------------------------------------------------------

class ConvBnAct(nn.Module):
    """Conv -> (BN) -> (act). NHWC."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    pad_type: str = ""
    bias: bool = False
    norm: bool = True
    act_type: Optional[str] = "swish"
    norm_momentum: float = 0.01
    norm_eps: float = 1e-3
    kernel_init: Callable = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(
            self.out_channels, (self.kernel_size, self.kernel_size),
            strides=self.stride,
            kernel_dilation=self.dilation,
            padding=conv_padding(self.pad_type, self.kernel_size, self.stride,
                                 self.dilation),
            use_bias=self.bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv")(x)
        if self.norm:
            x = batch_norm(self.norm_momentum, self.norm_eps, self.dtype)(
                x, use_running_average=not training)
        if self.act_type is not None:
            x = get_act(self.act_type)(x)
        return x


class SeparableConv(nn.Module):
    """Depthwise conv -> pointwise conv -> (BN) -> (act).

    BN/act placement matches the reference SeparableConv2d
    (efficientdet.py:60-83): norm+act come after the pointwise projection.
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    pad_type: str = ""
    bias: bool = False
    channel_multiplier: int = 1
    norm: bool = True
    act_type: Optional[str] = "swish"
    norm_momentum: float = 0.01
    norm_eps: float = 1e-3
    dw_kernel_init: Callable = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
    pw_kernel_init: Callable = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False, ret_dw: bool = False):
        in_ch = x.shape[-1]
        dw = nn.Conv(
            in_ch * self.channel_multiplier,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            kernel_dilation=self.dilation,
            padding=conv_padding(self.pad_type, self.kernel_size, self.stride,
                                 self.dilation),
            feature_group_count=in_ch,
            use_bias=False,
            kernel_init=self.dw_kernel_init,
            dtype=self.dtype,
            name="conv_dw")(x)
        x = nn.Conv(
            self.out_channels, (1, 1),
            use_bias=self.bias,
            kernel_init=self.pw_kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv_pw")(dw)
        if self.norm:
            x = batch_norm(self.norm_momentum, self.norm_eps, self.dtype)(
                x, use_running_average=not training)
        if self.act_type is not None:
            x = get_act(self.act_type)(x)
        if ret_dw:
            # expose the depthwise intermediate: the MetaHead path hangs a
            # second pointwise predict head and the projection features off
            # it (reference efficientdet.py:685-691)
            return x, dw
        return x


# ---------------------------------------------------------------------------
# resize / resample
# ---------------------------------------------------------------------------

def interpolate(x: jnp.ndarray, out_hw: Tuple[int, int], mode: str = "nearest"):
    """Resize NHWC spatial dims. 'nearest' matches torch F.interpolate
    nearest semantics (floor index) for integer scale factors."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if mode == "nearest" and oh % h == 0 and ow % w == 0:
        # exact integer upsample: repeat (cheaper + bit-exact vs torch)
        x = jnp.repeat(x, oh // h, axis=1)
        x = jnp.repeat(x, ow // w, axis=2)
        return x
    method = {"nearest": "nearest", "bilinear": "bilinear", "bicubic": "cubic"}[mode]
    return jax.image.resize(x, (b, oh, ow, c), method=method)


def max_pool2d(x: jnp.ndarray, kernel_size: int, stride: int, pad_type: str):
    pads = pool_padding(pad_type, kernel_size, stride, x.shape[1:3])
    return nn.max_pool(x, (kernel_size, kernel_size), strides=(stride, stride),
                       padding=pads)


def avg_pool2d(x: jnp.ndarray, kernel_size: int, stride: int, pad_type: str):
    pads = pool_padding(pad_type, kernel_size, stride, x.shape[1:3])
    return nn.avg_pool(x, (kernel_size, kernel_size), strides=(stride, stride),
                       padding=pads)


class ResampleFeatureMap(nn.Module):
    """Channel-project (1x1 conv, optional BN) + spatial down/upsample.

    Capability of the reference ResampleFeatureMap (efficientdet.py:140-177):
    downsample via max/avg pool (kernel = stride+1) or interpolation;
    upsample via nearest/bilinear; 1x1 conv when channels change, placed
    before or after the downsample per ``conv_after_downsample``.
    """
    in_channels: int
    out_channels: int
    reduction_ratio: float = 1.0
    pad_type: str = ""
    downsample: str = "max"
    upsample: str = "nearest"
    apply_bn: bool = False
    conv_after_downsample: bool = False
    redundant_bias: bool = False
    norm_momentum: float = 0.01
    norm_eps: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        def conv(v):
            return ConvBnAct(
                self.out_channels, kernel_size=1, pad_type=self.pad_type,
                norm=self.apply_bn,
                bias=not self.apply_bn or self.redundant_bias,
                act_type=None,
                norm_momentum=self.norm_momentum, norm_eps=self.norm_eps,
                dtype=self.dtype, name="conv")(v, training)

        needs_conv = self.in_channels != self.out_channels
        if self.reduction_ratio > 1:
            if needs_conv and not self.conv_after_downsample:
                x = conv(x)
            stride = int(self.reduction_ratio)
            if self.downsample in ("max", "avg"):
                pool = max_pool2d if self.downsample == "max" else avg_pool2d
                x = pool(x, stride + 1, stride, self.pad_type)
            else:
                oh = int(x.shape[1] / self.reduction_ratio)
                ow = int(x.shape[2] / self.reduction_ratio)
                x = interpolate(x, (oh, ow), self.downsample)
            if needs_conv and self.conv_after_downsample:
                x = conv(x)
        else:
            if needs_conv:
                x = conv(x)
            if self.reduction_ratio < 1:
                scale = int(1 // self.reduction_ratio)
                x = interpolate(x, (x.shape[1] * scale, x.shape[2] * scale),
                                self.upsample)
        return x


class SqueezeExcite(nn.Module):
    """SE block: global-avg -> reduce conv -> act -> expand conv -> gate."""
    reduced_channels: int
    act_type: str = "swish"
    gate_type: str = "sigmoid"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="conv_reduce")(s)
        s = get_act(self.act_type)(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                    dtype=self.dtype, name="conv_expand")(s)
        return x * get_act(self.gate_type)(s)


def drop_path(x, rng, rate: float):
    """Stochastic depth on the batch dim."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
    return x * mask.astype(x.dtype) / keep
