"""AnchorNet: per-anchor multiplier head (legacy episodic component).

Port of the reference AnchorNet (effdet/efficientdet.py:765-828) — a small
SeparableConv stack over FPN activations predicting 9 per-anchor logits per
cell, used by commented-out experiments in the reference drivers
(SURVEY §2.2). Kept for capability completeness; same per-(repeat, level)
BN structure as HeadNet.
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config.model_config import ModelConfig
from .heads import HeadBatchNorm
from .layers import SeparableConv, get_act


class AnchorNet(nn.Module):
    config: ModelConfig
    num_layers: int = 2
    num_channels: int = 88
    detach_input: bool = True

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], training: bool = False):
        cfg = self.config
        act = get_act(cfg.act_type)
        num_anchors = cfg.num_anchors_per_location

        convs = []
        for i in range(max(self.num_layers - 1, 0)):
            convs.append(SeparableConv(
                self.num_channels, kernel_size=3, pad_type=cfg.pad_type,
                bias=True if i == 0 else cfg.redundant_bias,
                norm=False, act_type=None, name=f"conv_rep_{i}"))
        bns = [[HeadBatchNorm(momentum=cfg.norm_momentum, eps=cfg.norm_eps,
                              name=f"bn_rep_{r}_{l}")
                for l in range(cfg.num_levels)]
               for r in range(max(self.num_layers - 1, 0))]
        anchor_out = SeparableConv(
            num_anchors, kernel_size=3, pad_type=cfg.pad_type, bias=True,
            norm=False, act_type=None, name="anchor_out")

        outputs = []
        for level, x_level in enumerate(x):
            if self.detach_input:
                import jax
                x_level = jax.lax.stop_gradient(x_level)
            for r, conv in enumerate(convs):
                x_level = conv(x_level, training)
                x_level = bns[r][level](x_level, training)
                x_level = act(x_level)
            outputs.append(anchor_out(x_level, training))
        return outputs
