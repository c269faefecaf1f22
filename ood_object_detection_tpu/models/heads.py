"""Class / box prediction heads.

Redesign of the reference HeadNet + MetaHead pair
(effdet/efficientdet.py:368-469, 569-694). In JAX the MetaHead hack —
re-implementing the head as raw parameters so MAML fast weights can flow —
is unnecessary: params are already a pytree, so the *same* HeadNet serves
the standard path and the inner-loop path (apply with an updated param
subtree). The only MetaHead semantic that survives is ``force_batch_stats``:
the reference runs its head BN in training mode with shared (never-read)
running stats (efficientdet.py:673), i.e. always batch-stat normalization.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config.model_config import ModelConfig
from .layers import (
    ConvBnAct,
    SeparableConv,
    get_act,
    head_normal_init,
    prior_prob_bias,
    variance_scaling_fan_in,
)


class HeadNet(nn.Module):
    """Shared-conv head with per-(repeat, level) BatchNorm.

    Convs are shared across pyramid levels; every (repeat, level) pair gets
    its own BN (the EfficientDet design, effdet/efficientdet.py:398-405).
    The class-head predict bias starts at the focal prior -log((1-p)/p)
    (efficientdet.py:514).
    """
    config: ModelConfig
    num_outputs: int                 # num_classes or 4
    is_class_head: bool = False
    num_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], training: bool = False,
                 ret_activs: bool = False, level_offset: int = 0,
                 force_batch_stats: bool = False):
        cfg = self.config
        num_channels = self.num_channels or cfg.fpn_channels
        num_anchors = cfg.num_anchors_per_location
        act_type = cfg.head_act_type or cfg.act_type
        conv_cls = SeparableConv if cfg.separable_conv else ConvBnAct
        use_batch_stats = training or force_batch_stats

        conv_kwargs = dict(
            kernel_size=3, pad_type=cfg.pad_type, bias=cfg.redundant_bias,
            norm=False, act_type=None)
        if cfg.separable_conv:
            conv_kwargs.update(dw_kernel_init=variance_scaling_fan_in(),
                               pw_kernel_init=variance_scaling_fan_in())
        else:
            conv_kwargs.update(kernel_init=head_normal_init())

        # shared conv repeats (instantiated once; reused per level)
        convs = [conv_cls(num_channels, **conv_kwargs, name=f"conv_rep_{r}")
                 for r in range(cfg.box_class_repeats)]

        # per-(repeat, level) BN
        bns = [[nn.BatchNorm(
                    use_running_average=not use_batch_stats,
                    momentum=1.0 - cfg.norm_momentum, epsilon=cfg.norm_eps,
                    name=f"bn_rep_{r}_{l}")
                for l in range(cfg.num_levels)]
               for r in range(cfg.box_class_repeats)]

        predict_kwargs = dict(
            kernel_size=3, pad_type=cfg.pad_type, bias=True,
            norm=False, act_type=None)
        if cfg.separable_conv:
            predict_kwargs.update(
                dw_kernel_init=variance_scaling_fan_in(),
                pw_kernel_init=variance_scaling_fan_in(),
                bias_init=prior_prob_bias() if self.is_class_head
                else nn.initializers.zeros)
        else:
            predict_kwargs.update(
                kernel_init=head_normal_init(),
                bias_init=prior_prob_bias() if self.is_class_head
                else nn.initializers.zeros)
        predict = conv_cls(self.num_outputs * num_anchors, **predict_kwargs,
                           name="predict")

        act = get_act(act_type)
        outputs = []
        activs = []
        for level in range(level_offset, len(x)):
            x_level = x[level]
            for r in range(cfg.box_class_repeats):
                x_level = convs[r](x_level, training)
                x_level = bns[r][level](x_level)
                x_level = act(x_level)
            if ret_activs:
                activs.append(x_level)
            outputs.append(predict(x_level, training))

        if ret_activs:
            return outputs, activs
        return outputs
