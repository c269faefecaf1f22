"""Feature-pyramid backbones: EfficientNet family, MobileNetV2/V3, ResNet.

The reference gets backbones from timm (effdet/efficientdet.py:837-839,
``create_model(features_only=True, out_indices=(2,3,4))``); this module is a
from-scratch NHWC Flax implementation of the families the zoo configs name,
built on a generic MBConv stage-spec system (the published EfficientNet /
MobileNet architectures, arXiv:1905.11946, 1801.04381, 1905.02244).

A backbone returns the three deepest pre-downsample features (strides
8/16/32) = P3, P4, P5 inputs for the FPN, and exposes ``feature_info``
(channel counts + reductions) for graph construction.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (batch_norm, SqueezeExcite, conv_padding, drop_path,
                     get_act)


def round_channels(channels: float, multiplier: float = 1.0,
                   divisor: int = 8, min_value: Optional[int] = None) -> int:
    """TF/timm channel rounding: scale, snap to divisor, never drop >10%."""
    if not multiplier:
        return int(channels)
    channels *= multiplier
    min_value = min_value or divisor
    new_ch = max(min_value, int(channels + divisor / 2) // divisor * divisor)
    if new_ch < 0.9 * channels:
        new_ch += divisor
    return int(new_ch)


def scale_repeats(repeats: int, depth_multiplier: float) -> int:
    return int(math.ceil(repeats * depth_multiplier))


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """One stage of identical blocks.

    block: 'ds' depthwise-separable | 'ir' inverted residual |
           'er' edge (fused) residual | 'cn' plain conv
    """
    block: str
    repeats: int
    kernel: int
    stride: int
    expand: float
    channels: int
    se_ratio: float = 0.0
    act_type: Optional[str] = None       # None = model default
    fused_channels: int = 0              # 'er': force expanded width
    no_skip: bool = False
    kernels: Tuple[int, ...] = ()        # mixed-kernel depthwise (MixNet)
    # MixNet grouped pointwise convs (arXiv:1907.09595 §3; timm encodes
    # them as a1.1/p1.1 MixedConv-over-1x1s in the mixnet arch defs, which
    # with even channels is exactly a grouped 1x1 conv). The reference's
    # mixdet_m/l zoo entries (model_config.py:241-263) inherit these from
    # timm; XLA supports them natively via feature_group_count.
    exp_groups: int = 1                  # 'ir': groups of the pw expand
    pwl_groups: int = 1                  # 'ir': groups of the pw project


@dataclasses.dataclass(frozen=True)
class BackboneDef:
    stem_channels: int
    stages: Tuple[BlockSpec, ...]
    width: float = 1.0
    depth: float = 1.0
    act_type: str = "swish"
    pad_type: str = ""                   # '' torch-symmetric, 'same' TF SAME
    fix_stem: bool = False               # don't width-scale the stem
    fix_first_last: bool = False         # don't depth-scale first/last stage
    se_from_expanded: bool = False       # SE reduce base: expanded (mnv3) vs input chs
    se_gate: str = "sigmoid"
    se_divisor: int = 1                  # round SE reduce chs (mnv3: 8)


# ---------------------------------------------------------------------------
# stage specs
# ---------------------------------------------------------------------------

_EFFNET_STAGES = (
    BlockSpec("ds", 1, 3, 1, 1.0, 16, 0.25),
    BlockSpec("ir", 2, 3, 2, 6.0, 24, 0.25),
    BlockSpec("ir", 2, 5, 2, 6.0, 40, 0.25),
    BlockSpec("ir", 3, 3, 2, 6.0, 80, 0.25),
    BlockSpec("ir", 3, 5, 1, 6.0, 112, 0.25),
    BlockSpec("ir", 4, 5, 2, 6.0, 192, 0.25),
    BlockSpec("ir", 1, 3, 1, 6.0, 320, 0.25),
)

_EFFNET_LITE_STAGES = tuple(
    dataclasses.replace(s, se_ratio=0.0) for s in _EFFNET_STAGES)

_EFFNET_EDGE_STAGES = (
    BlockSpec("er", 1, 3, 1, 4.0, 24, 0.0, fused_channels=24, no_skip=True),
    BlockSpec("er", 2, 3, 2, 8.0, 32, 0.0),
    BlockSpec("er", 4, 3, 2, 8.0, 48, 0.0),
    BlockSpec("ir", 5, 5, 2, 8.0, 96, 0.0),
    BlockSpec("ir", 4, 5, 1, 8.0, 144, 0.0),
    BlockSpec("ir", 2, 5, 2, 8.0, 192, 0.0),
)

_MOBILENET_V2_STAGES = (
    BlockSpec("ds", 1, 3, 1, 1.0, 16),
    BlockSpec("ir", 2, 3, 2, 6.0, 24),
    BlockSpec("ir", 3, 3, 2, 6.0, 32),
    BlockSpec("ir", 4, 3, 2, 6.0, 64),
    BlockSpec("ir", 3, 3, 1, 6.0, 96),
    BlockSpec("ir", 3, 3, 2, 6.0, 160),
    BlockSpec("ir", 1, 3, 1, 6.0, 320),
)

_MOBILENET_V3_LARGE_STAGES = (
    BlockSpec("ds", 1, 3, 1, 1.0, 16, 0.0, act_type="relu"),
    BlockSpec("ir", 1, 3, 2, 4.0, 24, 0.0, act_type="relu"),
    BlockSpec("ir", 1, 3, 1, 3.0, 24, 0.0, act_type="relu"),
    BlockSpec("ir", 3, 5, 2, 3.0, 40, 0.25, act_type="relu"),
    BlockSpec("ir", 1, 3, 2, 6.0, 80, 0.0),
    BlockSpec("ir", 1, 3, 1, 2.5, 80, 0.0),
    BlockSpec("ir", 2, 3, 1, 2.3, 80, 0.0),
    BlockSpec("ir", 2, 3, 1, 6.0, 112, 0.25),
    BlockSpec("ir", 3, 5, 2, 6.0, 160, 0.25),
)


# Grouped-pointwise placement follows timm's mixnet arch strings per
# block: `a1.1` = grouped pw expand, `p1.1` = grouped pw project,
# groups=2 everywhere a split exists (k list 1.1). Placement is
# irregular (e.g. mixnet_s's c80 stage is p1.1-only on BOTH the
# stride-2 lead and the refinements; mixnet_m's c80 lead is fully
# dense) — tests/test_mixnet_parity.py cross-checks these tables
# against a transcription of the timm arch strings.
_MIXNET_S_STAGES = (
    BlockSpec("ds", 1, 3, 1, 1.0, 16, 0.0, act_type="relu"),
    BlockSpec("ir", 1, 3, 2, 6.0, 24, 0.0, act_type="relu",
              exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 1, 3, 1, 3.0, 24, 0.0, act_type="relu",
              exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 1, 0, 2, 6.0, 40, 0.5, act_type="swish", kernels=(3, 5, 7)),
    BlockSpec("ir", 3, 0, 1, 6.0, 40, 0.5, act_type="swish", kernels=(3, 5),
              exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 1, 0, 2, 6.0, 80, 0.25, act_type="swish", kernels=(3, 5, 7),
              pwl_groups=2),
    BlockSpec("ir", 2, 0, 1, 6.0, 80, 0.25, act_type="swish", kernels=(3, 5),
              pwl_groups=2),
    BlockSpec("ir", 1, 0, 1, 6.0, 120, 0.5, act_type="swish", kernels=(3, 5, 7),
              exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 2, 0, 1, 3.0, 120, 0.5, act_type="swish",
              kernels=(3, 5, 7, 9), exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 1, 0, 2, 6.0, 200, 0.5, act_type="swish",
              kernels=(3, 5, 7, 9, 11)),
    BlockSpec("ir", 2, 0, 1, 6.0, 200, 0.5, act_type="swish",
              kernels=(3, 5, 7, 9), pwl_groups=2),
)

_MIXNET_M_STAGES = (
    BlockSpec("ds", 1, 3, 1, 1.0, 24, 0.0, act_type="relu"),
    BlockSpec("ir", 1, 0, 2, 6.0, 32, 0.0, act_type="relu", kernels=(3, 5, 7),
              exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 1, 3, 1, 3.0, 32, 0.0, act_type="relu",
              exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 1, 0, 2, 6.0, 40, 0.5, act_type="swish",
              kernels=(3, 5, 7, 9)),
    BlockSpec("ir", 3, 0, 1, 6.0, 40, 0.5, act_type="swish", kernels=(3, 5),
              exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 1, 0, 2, 6.0, 80, 0.25, act_type="swish", kernels=(3, 5, 7)),
    BlockSpec("ir", 3, 0, 1, 6.0, 80, 0.25, act_type="swish",
              kernels=(3, 5, 7, 9), exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 1, 3, 1, 6.0, 120, 0.5, act_type="swish"),
    BlockSpec("ir", 3, 0, 1, 3.0, 120, 0.5, act_type="swish",
              kernels=(3, 5, 7, 9), exp_groups=2, pwl_groups=2),
    BlockSpec("ir", 1, 0, 2, 6.0, 200, 0.5, act_type="swish",
              kernels=(3, 5, 7, 9)),
    BlockSpec("ir", 3, 0, 1, 6.0, 200, 0.5, act_type="swish",
              kernels=(3, 5, 7, 9), pwl_groups=2),
)


def _effnet(width, depth, **kw):
    return BackboneDef(32, _EFFNET_STAGES, width=width, depth=depth, **kw)


def _effnet_lite(width, depth, **kw):
    return BackboneDef(32, _EFFNET_LITE_STAGES, width=width, depth=depth,
                       act_type="relu6", fix_stem=True, fix_first_last=True, **kw)


BACKBONE_DEFS: Dict[str, BackboneDef] = {
    # EfficientNet B0-B7 (torch-symmetric padding variants)
    "efficientnet_b0": _effnet(1.0, 1.0),
    "efficientnet_b1": _effnet(1.0, 1.1),
    "efficientnet_b2": _effnet(1.1, 1.2),
    "efficientnet_b3": _effnet(1.2, 1.4),
    "efficientnet_b4": _effnet(1.4, 1.8),
    "efficientnet_b5": _effnet(1.6, 2.2),
    "efficientnet_b6": _effnet(1.8, 2.6),
    "efficientnet_b7": _effnet(2.0, 3.1),
    # TF-SAME padding variants (for tf_* checkpoint parity)
    "tf_efficientnet_b0": _effnet(1.0, 1.0, pad_type="same"),
    "tf_efficientnet_b1": _effnet(1.0, 1.1, pad_type="same"),
    "tf_efficientnet_b2": _effnet(1.1, 1.2, pad_type="same"),
    "tf_efficientnet_b3": _effnet(1.2, 1.4, pad_type="same"),
    "tf_efficientnet_b4": _effnet(1.4, 1.8, pad_type="same"),
    "tf_efficientnet_b5": _effnet(1.6, 2.2, pad_type="same"),
    "tf_efficientnet_b6": _effnet(1.8, 2.6, pad_type="same"),
    "tf_efficientnet_b7": _effnet(2.0, 3.1, pad_type="same"),
    # Lite (no SE, relu6, fixed stem)
    "efficientnet_lite0": _effnet_lite(1.0, 1.0),
    "efficientnet_lite1": _effnet_lite(1.0, 1.1),
    "efficientnet_lite2": _effnet_lite(1.1, 1.2),
    "efficientnet_lite3": _effnet_lite(1.2, 1.4),
    "efficientnet_lite4": _effnet_lite(1.4, 1.8),
    "tf_efficientnet_lite0": _effnet_lite(1.0, 1.0, pad_type="same"),
    "tf_efficientnet_lite1": _effnet_lite(1.0, 1.1, pad_type="same"),
    "tf_efficientnet_lite2": _effnet_lite(1.1, 1.2, pad_type="same"),
    "tf_efficientnet_lite3": _effnet_lite(1.2, 1.4, pad_type="same"),
    "tf_efficientnet_lite4": _effnet_lite(1.4, 1.8, pad_type="same"),
    # EdgeTPU variants
    "efficientnet_es": BackboneDef(32, _EFFNET_EDGE_STAGES, 1.0, 1.0,
                                   act_type="relu"),
    "efficientnet_em": BackboneDef(32, _EFFNET_EDGE_STAGES, 1.0, 1.1,
                                   act_type="relu"),
    # MobileNets
    "mobilenetv2_100": BackboneDef(32, _MOBILENET_V2_STAGES, 1.0, 1.0,
                                   act_type="relu6"),
    "mobilenetv2_110d": BackboneDef(32, _MOBILENET_V2_STAGES, 1.1, 1.2,
                                    act_type="relu6", fix_stem=True,
                                    fix_first_last=True),
    "mobilenetv2_120d": BackboneDef(32, _MOBILENET_V2_STAGES, 1.2, 1.4,
                                    act_type="relu6", fix_stem=True,
                                    fix_first_last=True),
    "mobilenetv3_large_100": BackboneDef(
        16, _MOBILENET_V3_LARGE_STAGES, 1.0, 1.0, act_type="hard_swish",
        se_from_expanded=True, se_gate="hard_sigmoid", se_divisor=8),
    # MixNets (mixed-kernel depthwise; se applied on expanded channels)
    "mixnet_s": BackboneDef(16, _MIXNET_S_STAGES, 1.0, 1.0,
                            act_type="swish", fix_stem=True),
    "mixnet_m": BackboneDef(24, _MIXNET_M_STAGES, 1.0, 1.0,
                            act_type="swish", fix_stem=True),
    "mixnet_l": BackboneDef(24, _MIXNET_M_STAGES, 1.3, 1.0,
                            act_type="swish", fix_stem=True),
}


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _split_channels(total: int, groups: int) -> List[int]:
    base = total // groups
    chans = [base] * groups
    chans[0] += total - base * groups
    return chans


class _MixedDepthwiseConv(nn.Module):
    """MixNet mixed depthwise conv: channels split across kernel sizes
    (arXiv:1907.09595). Each group gets its own kxk depthwise conv."""
    kernels: Tuple[int, ...]
    stride: int
    pad_type: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        chans = _split_channels(x.shape[-1], len(self.kernels))
        outs = []
        start = 0
        for i, (k, ch) in enumerate(zip(self.kernels, chans)):
            xg = x[..., start:start + ch]
            outs.append(nn.Conv(
                ch, (k, k), strides=self.stride,
                padding=conv_padding(self.pad_type, k, self.stride),
                feature_group_count=ch, use_bias=False, dtype=self.dtype,
                name=f"conv_dw_{i}")(xg))
            start += ch
        return jnp.concatenate(outs, axis=-1)


class _ConvBnActBlock(nn.Module):
    out_channels: int
    kernel: int
    stride: int
    act_type: str
    pad_type: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=self.stride,
                    padding=conv_padding(self.pad_type, self.kernel, self.stride),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = batch_norm(dtype=self.dtype, name="bn")(x, use_running_average=not training)
        return get_act(self.act_type)(x)


def _maybe_drop_path(module: nn.Module, x, rate: float, training: bool):
    """Stochastic depth on the residual branch (timm drop_path semantics:
    the reference's ``dropout`` flag -> backbone drop_path_rate,
    pretrain.py:94, infer.py:132).

    Active only when the apply call provides a 'drop_path' rng — NOT gated
    on ``training``: in the reference, freezing BN (set_bn_eval) does not
    disable drop_path, so tying both to one flag would change semantics.
    Train steps opt in by passing rngs={'drop_path': key}; eval/init never
    pass it."""
    del training
    if rate <= 0.0 or not module.has_rng("drop_path"):
        return x
    return drop_path(x, module.make_rng("drop_path"), rate)


class _DsBlock(nn.Module):
    """Depthwise-separable block (no expansion): dw -> (se) -> pw."""
    spec: BlockSpec
    out_channels: int
    act_type: str
    pad_type: str
    se_gate: str
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_ch = x.shape[-1]
        shortcut = x
        k, s = self.spec.kernel, self.spec.stride
        x = nn.Conv(in_ch, (k, k), strides=s,
                    padding=conv_padding(self.pad_type, k, s),
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, name="conv_dw")(x)
        x = batch_norm(dtype=self.dtype, name="bn1")(x, use_running_average=not training)
        x = get_act(self.act_type)(x)
        if self.spec.se_ratio > 0:
            x = SqueezeExcite(max(1, int(in_ch * self.spec.se_ratio)),
                              act_type=self.act_type, gate_type=self.se_gate,
                              dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pw")(x)
        x = batch_norm(dtype=self.dtype, name="bn2")(x, use_running_average=not training)
        if s == 1 and in_ch == self.out_channels and not self.spec.no_skip:
            x = _maybe_drop_path(self, x, self.drop_path_rate, training) \
                + shortcut
        return x


class _IrBlock(nn.Module):
    """Inverted residual (MBConv): pw-expand -> dw -> (se) -> pw-project."""
    spec: BlockSpec
    out_channels: int
    act_type: str
    pad_type: str
    se_from_expanded: bool
    se_gate: str
    se_divisor: int
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_ch = x.shape[-1]
        shortcut = x
        mid = round_channels(in_ch * self.spec.expand, divisor=8) \
            if self.spec.expand != 1.0 else in_ch
        k, s = self.spec.kernel, self.spec.stride

        if self.spec.expand != 1.0:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        feature_group_count=self.spec.exp_groups,
                        name="conv_pw")(x)
            x = batch_norm(dtype=self.dtype, name="bn1")(x, use_running_average=not training)
            x = get_act(self.act_type)(x)
        if self.spec.kernels:
            x = _MixedDepthwiseConv(self.spec.kernels, s, self.pad_type,
                                    dtype=self.dtype, name="conv_dw")(x)
        else:
            x = nn.Conv(mid, (k, k), strides=s,
                        padding=conv_padding(self.pad_type, k, s),
                        feature_group_count=mid, use_bias=False,
                        dtype=self.dtype, name="conv_dw")(x)
        x = batch_norm(dtype=self.dtype, name="bn2")(x, use_running_average=not training)
        x = get_act(self.act_type)(x)
        if self.spec.se_ratio > 0:
            base = mid if self.se_from_expanded else in_ch
            reduced = max(1, int(base * self.spec.se_ratio))
            if self.se_divisor > 1:
                reduced = round_channels(reduced, 1.0, self.se_divisor)
            x = SqueezeExcite(reduced, act_type=self.act_type,
                              gate_type=self.se_gate, dtype=self.dtype, name="se")(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    feature_group_count=self.spec.pwl_groups,
                    dtype=self.dtype, name="conv_pwl")(x)
        x = batch_norm(dtype=self.dtype, name="bn3")(x, use_running_average=not training)
        if s == 1 and in_ch == self.out_channels and not self.spec.no_skip:
            x = _maybe_drop_path(self, x, self.drop_path_rate, training) \
                + shortcut
        return x


class _ErBlock(nn.Module):
    """Edge residual (fused MBConv): full kxk expand conv -> pw-project."""
    spec: BlockSpec
    out_channels: int
    act_type: str
    pad_type: str
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_ch = x.shape[-1]
        shortcut = x
        mid = self.spec.fused_channels or round_channels(
            in_ch * self.spec.expand, divisor=8)
        k, s = self.spec.kernel, self.spec.stride
        x = nn.Conv(mid, (k, k), strides=s,
                    padding=conv_padding(self.pad_type, k, s),
                    use_bias=False, dtype=self.dtype, name="conv_exp")(x)
        x = batch_norm(dtype=self.dtype, name="bn1")(x, use_running_average=not training)
        x = get_act(self.act_type)(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv_pwl")(x)
        x = batch_norm(dtype=self.dtype, name="bn2")(x, use_running_average=not training)
        if s == 1 and in_ch == self.out_channels and not self.spec.no_skip:
            x = _maybe_drop_path(self, x, self.drop_path_rate, training) \
                + shortcut
        return x


_BLOCK_TYPES = {"ds": _DsBlock, "ir": _IrBlock, "er": _ErBlock, "cn": _ConvBnActBlock}


# ---------------------------------------------------------------------------
# backbone module
# ---------------------------------------------------------------------------

class GenericBackbone(nn.Module):
    """Stage-spec driven MBConv backbone emitting P3/P4/P5 features."""
    definition: BackboneDef
    out_reductions: Tuple[int, ...] = (8, 16, 32)
    dtype: Any = jnp.float32
    # gradient-checkpoint the first N stages: their intra-block activations
    # (the largest tensors in the net: stage 0-2 at 1/2-1/8 resolution) are
    # recomputed in the backward pass instead of stored — trades ~one extra
    # stage-forward of FLOPs for several GB of HBM at large batch
    remat_stages: int = 0
    # stochastic depth: max drop rate, scaled linearly over block depth
    # (timm efficientnet_builder semantics — the reference's `dropout` flag
    # feeds backbone_args drop_path_rate, pretrain.py:94 default 0.2).
    # When > 0, training applies need rngs={'drop_path': key}.
    drop_path_rate: float = 0.0

    @staticmethod
    def feature_channels(definition: BackboneDef,
                         out_reductions=(8, 16, 32)) -> List[int]:
        """Channels of the emitted features, without building the module."""
        d = definition
        chans, reds = [], []
        stride = 2
        n = len(d.stages)
        for i, spec in enumerate(d.stages):
            out_ch = round_channels(spec.channels, d.width)
            if d.fix_first_last and i in (0, n - 1):
                pass
            if spec.stride == 2:
                stride *= 2
            chans.append(out_ch)
            reds.append(stride)
        out = []
        for r in out_reductions:
            # the last stage at reduction r
            idx = max(i for i, rr in enumerate(reds) if rr == r)
            out.append(chans[idx])
        return out

    @nn.compact
    def __call__(self, x, training: bool = False) -> List[jnp.ndarray]:
        d = self.definition
        stem_ch = d.stem_channels if d.fix_stem else round_channels(
            d.stem_channels, d.width)
        x = nn.Conv(stem_ch, (3, 3), strides=2,
                    padding=conv_padding(d.pad_type, 3, 2),
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = batch_norm(dtype=self.dtype, name="bn_stem")(x, use_running_average=not training)
        x = get_act(d.act_type)(x)

        features = {}
        stride = 2
        n = len(d.stages)
        block_idx = 0
        total_blocks = sum(
            spec.repeats if (d.fix_first_last and i in (0, n - 1))
            else scale_repeats(spec.repeats, d.depth)
            for i, spec in enumerate(d.stages))
        for i, spec in enumerate(d.stages):
            out_ch = round_channels(spec.channels, d.width)
            repeats = spec.repeats
            if not (d.fix_first_last and i in (0, n - 1)):
                repeats = scale_repeats(spec.repeats, d.depth)
            act = spec.act_type or d.act_type
            if spec.stride == 2:
                # feature BEFORE this downsample is the deepest at `stride`
                features[stride] = x
                stride *= 2
            for r in range(repeats):
                s = dataclasses.replace(spec, stride=spec.stride if r == 0 else 1)
                cls = _BLOCK_TYPES[spec.block]
                kwargs = dict(spec=s, out_channels=out_ch, act_type=act,
                              pad_type=d.pad_type, dtype=self.dtype)
                if spec.block in ("ds", "ir", "er") and self.drop_path_rate:
                    # linear decay over depth (timm: rate * idx / total)
                    kwargs.update(drop_path_rate=self.drop_path_rate
                                  * block_idx / total_blocks)
                if spec.block == "ds":
                    kwargs.update(se_gate=d.se_gate)
                elif spec.block == "ir":
                    kwargs.update(se_from_expanded=d.se_from_expanded,
                                  se_gate=d.se_gate, se_divisor=d.se_divisor)
                if i < self.remat_stages:
                    # lifted remat keeps the param tree identical
                    cls = nn.remat(cls, static_argnums=(2,),
                                   policy=jax.checkpoint_policies.nothing_saveable)
                x = cls(**kwargs, name=f"blocks_{i}_{r}")(x, training)
                block_idx += 1
        features[stride] = x

        return [features[r] for r in self.out_reductions]


# ---------------------------------------------------------------------------
# ResNet (for resdet50)
# ---------------------------------------------------------------------------

class _Bottleneck(nn.Module):
    mid_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        out_ch = self.mid_channels * 4
        shortcut = x
        y = nn.Conv(self.mid_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = batch_norm(dtype=self.dtype, name="bn1")(y, use_running_average=not training)
        y = nn.relu(y)
        y = nn.Conv(self.mid_channels, (3, 3), strides=self.stride,
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = batch_norm(dtype=self.dtype, name="bn2")(y, use_running_average=not training)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = batch_norm(dtype=self.dtype, name="bn3")(y, use_running_average=not training)
        if x.shape[-1] != out_ch or self.stride != 1:
            shortcut = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            shortcut = batch_norm(dtype=self.dtype, name="downsample_bn")(shortcut, use_running_average=not training)
        return nn.relu(y + shortcut)


class ResNetBackbone(nn.Module):
    """ResNet-50 style backbone -> C3/C4/C5 (strides 8/16/32)."""
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @staticmethod
    def feature_channels(layers=(3, 4, 6, 3)) -> List[int]:
        return [512, 1024, 2048]

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        x = batch_norm(dtype=self.dtype, name="bn_stem")(x, use_running_average=not training)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        for i, (blocks, mid) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            stride = 1 if i == 0 else 2
            for b in range(blocks):
                x = _Bottleneck(mid, stride if b == 0 else 1,
                                dtype=self.dtype,
                                name=f"layer{i + 1}_{b}")(x, training)
            if i >= 1:
                outs.append(x)
        return outs


def create_backbone(name: str, dtype=jnp.float32, remat_stages: int = 0,
                    drop_path_rate: float = 0.0, **backbone_args):
    """Backbone module + feature_info [(channels, reduction)] by zoo name."""
    if name in BACKBONE_DEFS:
        d = BACKBONE_DEFS[name]
        module = GenericBackbone(d, dtype=dtype, remat_stages=remat_stages,
                                 drop_path_rate=drop_path_rate)
        chans = GenericBackbone.feature_channels(d)
        return module, [dict(num_chs=c, reduction=r)
                        for c, r in zip(chans, (8, 16, 32))]
    if name == "resnet50":
        module = ResNetBackbone(dtype=dtype)
        return module, [dict(num_chs=c, reduction=r)
                        for c, r in zip((512, 1024, 2048), (8, 16, 32))]
    from .csp import CSP_DEFS, CspBackbone
    if name in CSP_DEFS:
        d = CSP_DEFS[name]
        module = CspBackbone(d, dtype=dtype)
        chans = CspBackbone.feature_channels(d)
        return module, [dict(num_chs=c, reduction=r)
                        for c, r in zip(chans, (8, 16, 32))]
    raise NotImplementedError(
        f"backbone '{name}' is not implemented yet "
        f"(available: {sorted(BACKBONE_DEFS) + ['resnet50'] + sorted(CSP_DEFS)})")
