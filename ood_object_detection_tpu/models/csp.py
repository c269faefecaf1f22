"""Cross-Stage-Partial backbones: CSP-ResNet50, CSP-ResNeXt50, CSP-Darknet53.

The reference zoo's experimental alternates (cspresdet50 / cspresdext50 /
cspdarkdet53 configs, model_config.py:174-241) pull these from timm; this is
a from-scratch NHWC implementation of the published CSPNet design
(arXiv:1911.11929): each stage expands, splits channels into a cross path
and a block path, runs residual blocks on the block half, and re-merges
through transition convs.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import batch_norm, conv_padding, get_act


def _conv_bn_act(x, out_ch, k, stride, act, training, dtype, name,
                 groups: int = 1):
    x = nn.Conv(out_ch, (k, k), strides=stride,
                padding=conv_padding("", k, stride),
                feature_group_count=groups, use_bias=False, dtype=dtype,
                name=f"{name}_conv")(x)
    x = batch_norm(dtype=dtype, name=f"{name}_bn")(
        x, use_running_average=not training)
    return get_act(act)(x)


class _ResBottleneckBlock(nn.Module):
    """1x1 -> 3x3 (grouped for ResNeXt) -> 1x1 + residual."""
    out_channels: int
    bottle_ratio: float = 0.25
    groups: int = 1
    act: str = "leaky_relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        hidden = max(int(self.out_channels * self.bottle_ratio), self.groups)
        hidden = (hidden // self.groups) * self.groups
        shortcut = x
        y = _conv_bn_act(x, hidden, 1, 1, self.act, training, self.dtype, "c1")
        y = _conv_bn_act(y, hidden, 3, 1, self.act, training, self.dtype, "c2",
                         groups=self.groups)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="c3_conv")(y)
        y = batch_norm(dtype=self.dtype, name="c3_bn")(
            y, use_running_average=not training)
        return get_act(self.act)(y + shortcut)


class _DarkBlock(nn.Module):
    """1x1 -> 3x3 + residual (Darknet style)."""
    out_channels: int
    bottle_ratio: float = 0.5
    act: str = "leaky_relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        hidden = int(self.out_channels * self.bottle_ratio)
        shortcut = x
        y = _conv_bn_act(x, hidden, 1, 1, self.act, training, self.dtype, "c1")
        y = _conv_bn_act(y, self.out_channels, 3, 1, self.act, training,
                         self.dtype, "c2")
        return y + shortcut


class _CrossStage(nn.Module):
    """One CSP stage: (downsample) -> expand -> split -> blocks on half ->
    transition -> concat -> transition."""
    out_channels: int
    depth: int
    stride: int
    block_type: str            # 'bottleneck' | 'dark'
    bottle_ratio: float
    expand_ratio: float = 2.0
    groups: int = 1
    act: str = "leaky_relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        exp_chs = int(self.out_channels * self.expand_ratio)
        half = exp_chs // 2

        if self.stride > 1:
            x = _conv_bn_act(x, x.shape[-1], 3, self.stride, self.act,
                             training, self.dtype, "down")
        x = _conv_bn_act(x, exp_chs, 1, 1, self.act, training, self.dtype,
                         "exp")
        xs, xb = x[..., :half], x[..., half:]

        for i in range(self.depth):
            if self.block_type == "dark":
                xb = _DarkBlock(half, self.bottle_ratio, self.act,
                                self.dtype, name=f"block_{i}")(xb, training)
            else:
                xb = _ResBottleneckBlock(
                    half, self.bottle_ratio, self.groups, self.act,
                    self.dtype, name=f"block_{i}")(xb, training)

        xb = _conv_bn_act(xb, half, 1, 1, self.act, training, self.dtype,
                          "trans_b")
        out = jnp.concatenate([xs, xb], axis=-1)
        return _conv_bn_act(out, self.out_channels, 1, 1, self.act, training,
                            self.dtype, "trans")


@dataclasses.dataclass(frozen=True)
class CspDef:
    stem_channels: int
    stem_kernel: int
    stem_pool: bool
    depths: Tuple[int, ...]
    filters: Tuple[int, ...]
    strides: Tuple[int, ...]
    block_type: str
    bottle_ratio: float
    expand_ratio: float
    stem_stride: int = 2
    groups: int = 1
    act: str = "leaky_relu"


CSP_DEFS = {
    "cspresnet50": CspDef(64, 7, True, (3, 3, 5, 2), (128, 256, 512, 1024),
                          (1, 2, 2, 2), "bottleneck", 0.5, 2.0),
    "cspresnext50": CspDef(64, 7, True, (3, 3, 5, 2), (256, 512, 1024, 2048),
                           (1, 2, 2, 2), "bottleneck", 0.25, 1.0, groups=32),
    "cspdarknet53": CspDef(32, 3, False, (1, 2, 8, 8, 4),
                           (64, 128, 256, 512, 1024), (2, 2, 2, 2, 2),
                           "dark", 0.5, 2.0, stem_stride=1),
}


class CspBackbone(nn.Module):
    """CSP backbone emitting the three deepest features (strides 8/16/32)."""
    definition: CspDef
    dtype: Any = jnp.float32

    @staticmethod
    def feature_channels(d: CspDef) -> List[int]:
        stride = d.stem_stride
        if d.stem_pool:
            stride *= 2
        reds, chans = [], []
        for s, f in zip(d.strides, d.filters):
            stride *= s
            reds.append(stride)
            chans.append(f)
        return [chans[max(i for i, r in enumerate(reds) if r == target)]
                for target in (8, 16, 32)]

    @nn.compact
    def __call__(self, x, training: bool = False):
        d = self.definition
        x = _conv_bn_act(x, d.stem_channels, d.stem_kernel, d.stem_stride,
                         d.act, training, self.dtype, "stem")
        stride = d.stem_stride
        if d.stem_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
            stride *= 2

        features = {}
        for i, (depth, filters, s) in enumerate(
                zip(d.depths, d.filters, d.strides)):
            stride *= s
            x = _CrossStage(
                filters, depth, s, d.block_type, d.bottle_ratio,
                d.expand_ratio, d.groups, d.act, self.dtype,
                name=f"stage_{i}")(x, training)
            features[stride] = x
        return [features[r] for r in (8, 16, 32)]
