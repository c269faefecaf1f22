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

import jax
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


class HeadBatchNorm(nn.Module):
    """BatchNorm whose normalization source (batch vs running stats) is a
    call-time choice, independent of mutability.

    The reference MetaHead always normalizes its head BN with *batch* stats
    (F.batch_norm(training=True), efficientdet.py:673) even at inference —
    flax's BatchNorm can't do that without a mutable batch_stats collection,
    so the episodic inner loop (pure, jax.grad-differentiated) needs this.
    Param/stat names mirror nn.BatchNorm ('scale'/'bias', 'mean'/'var') for
    checkpoint compatibility.
    """
    momentum: float = 0.01     # running-stat update fraction (torch style)
    eps: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_batch_stats: bool = False):
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if use_batch_stats:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)     # stats in f32 even for bf16 compute
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            if self.is_mutable_collection("batch_stats") and \
                    not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean.astype(self.dtype)) * jax.lax.rsqrt(
            var.astype(self.dtype) + jnp.asarray(self.eps, self.dtype))
        return y * scale.astype(self.dtype) + bias.astype(self.dtype)


class HeadNet(nn.Module):
    """Shared-conv head with per-(repeat, level) BatchNorm.

    Convs are shared across pyramid levels; every (repeat, level) pair gets
    its own BN (the EfficientDet design, effdet/efficientdet.py:398-405).
    The class-head predict bias starts at the focal prior -log((1-p)/p)
    (efficientdet.py:514).

    ``separate_head`` adds a second pointwise predict conv sharing the
    predict conv's depthwise stage (reference MetaHead.add_head,
    efficientdet.py:640-643: predict_pw_sep/predict_pb_sep applied to the
    same x_pred). Call with ``heads='both'`` to get
    (sep_outputs, main_outputs[, activs]) in the reference's return order
    (efficientdet.py:685-694); any other ``heads`` value returns the main
    head only, like the reference's heads='class'/'None' paths.
    """
    config: ModelConfig
    num_outputs: int                 # num_classes or 4
    is_class_head: bool = False
    num_channels: Optional[int] = None
    separate_head: bool = False

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], training: bool = False,
                 ret_activs: bool = False, level_offset: int = 0,
                 force_batch_stats: bool = False, heads: str = "main"):
        cfg = self.config
        num_channels = self.num_channels or cfg.fpn_channels
        num_anchors = cfg.num_anchors_per_location
        act_type = cfg.head_act_type or cfg.act_type
        conv_cls = SeparableConv if cfg.separable_conv else ConvBnAct
        use_batch_stats = training or force_batch_stats

        dtype = jnp.dtype(cfg.compute_dtype)
        conv_kwargs = dict(
            kernel_size=3, pad_type=cfg.pad_type, bias=cfg.redundant_bias,
            norm=False, act_type=None, dtype=dtype)
        if cfg.separable_conv:
            conv_kwargs.update(dw_kernel_init=variance_scaling_fan_in(),
                               pw_kernel_init=variance_scaling_fan_in())
        else:
            conv_kwargs.update(kernel_init=head_normal_init())

        # shared conv repeats (instantiated once; reused per level)
        convs = [conv_cls(num_channels, **conv_kwargs, name=f"conv_rep_{r}")
                 for r in range(cfg.box_class_repeats)]

        # per-(repeat, level) BN
        bns = [[HeadBatchNorm(
                    momentum=cfg.norm_momentum, eps=cfg.norm_eps, dtype=dtype,
                    name=f"bn_rep_{r}_{l}")
                for l in range(cfg.num_levels)]
               for r in range(cfg.box_class_repeats)]

        predict_kwargs = dict(
            kernel_size=3, pad_type=cfg.pad_type, bias=True,
            norm=False, act_type=None, dtype=dtype)
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

        predict_sep = None
        if self.separate_head:
            if not cfg.separable_conv:
                raise ValueError(
                    "separate_head requires separable_conv heads (the "
                    "reference MetaHead is separable-only, "
                    "efficientdet.py:613-616,640-643)")
            # second pointwise predict head on the shared depthwise output:
            # randn * (1/C)^0.5 kernel + focal-prior bias
            # (reference add_head, efficientdet.py:640-643)
            predict_sep = nn.Conv(
                self.num_outputs * num_anchors, (1, 1), use_bias=True,
                kernel_init=variance_scaling_fan_in(),
                bias_init=prior_prob_bias(),
                dtype=dtype, name="predict_sep")

        act = get_act(act_type)
        both = self.separate_head and heads == "both"
        outputs = []
        sep_outputs = []
        activs = []
        for level in range(level_offset, len(x)):
            x_level = x[level]
            for r in range(cfg.box_class_repeats):
                x_level = convs[r](x_level, training)
                x_level = bns[r][level](x_level, use_batch_stats)
                x_level = act(x_level)
            if cfg.separable_conv:
                # activs are the predict conv's DEPTHWISE output — what the
                # reference MetaHead returns as obj_embds and hangs the sep
                # head off (efficientdet.py:685-691)
                out, x_pred = predict(x_level, training, ret_dw=True)
            else:
                out, x_pred = predict(x_level, training), x_level
            if ret_activs:
                activs.append(x_pred)
            outputs.append(out)
            if both or (self.separate_head and self.is_initializing()):
                sep_out = predict_sep(x_pred)
                if both:
                    sep_outputs.append(sep_out)

        if both:
            if ret_activs:
                return sep_outputs, outputs, activs
            return sep_outputs, outputs
        if ret_activs:
            return outputs, activs
        return outputs
