"""The assembled EfficientDet model (backbone + BiFPN + class/box heads).

NHWC Flax equivalent of the reference EfficientDet module
(effdet/efficientdet.py:831-933). The reference's string-dispatch forward
modes ('bb' / 'fpn_and_head' / 'supp_cls' / ...) become named methods usable
via ``model.apply(vars, x, method=...)`` — same staged-execution capability
(episodic harness runs backbone, FPN and heads separately) without the
cross-GPU `.to()` hops of the original (efficientdet.py:905-908); device
placement is the mesh's job under pjit.

Outputs are per-level NHWC: class [B, H, W, A*C], box [B, H, W, A*4] —
the layout post_process expects.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.model_config import ModelConfig
from .backbone import create_backbone
from .bifpn import BiFpn
from .heads import HeadNet


class EfficientDet(nn.Module):
    config: ModelConfig

    def setup(self):
        cfg = self.config
        backbone, feature_info = create_backbone(
            cfg.backbone_name, dtype=jnp.dtype(cfg.compute_dtype),
            **(cfg.backbone_args or {}))
        self.backbone = backbone
        self._feature_info = tuple(feature_info)
        self.fpn = BiFpn(cfg, self._feature_info)
        head_cls = HeadNet
        if cfg.remat_heads:
            # recompute the head-repeat activations (the largest train-step
            # tensors after the FPN at D4-class resolutions) in the backward
            # pass; every arg but the pyramid is trace-static
            head_cls = nn.remat(
                HeadNet, static_argnums=(2, 3, 4, 5, 6),
                policy=jax.checkpoint_policies.nothing_saveable)
        self.class_net = head_cls(cfg, num_outputs=cfg.num_classes,
                                  is_class_head=True,
                                  separate_head=cfg.separate_head)
        self.box_net = head_cls(cfg, num_outputs=4)

    # --- staged forward methods (reference modes, efficientdet.py:895-933) ---

    def backbone_features(self, x, training: bool = False):
        """mode='bb': image -> [P3, P4, P5] backbone features."""
        x = x.astype(jnp.dtype(self.config.compute_dtype))
        return self.backbone(x, training)

    def fpn_features(self, feats, training: bool = False):
        """mode='only_fpn': backbone features -> FPN pyramid."""
        return self.fpn(feats, training)

    def image_to_fpn(self, x, training: bool = False):
        """mode='supp_bb'/'fpn': image -> FPN pyramid."""
        x = x.astype(jnp.dtype(self.config.compute_dtype))
        return self.fpn(self.backbone(x, training), training)

    def heads(self, activs, training: bool = False):
        """mode='head'/'fpn_and_head' tail: pyramid -> (class, box) outputs."""
        # all HeadNet args positional: remat_heads wraps HeadNet in
        # nn.remat, whose static_argnums require every arg to be present
        return (self.class_net(activs, training, False, 0, False, "main"),
                self.box_net(activs, training, False, 0, False, "main"))

    def class_head(self, activs, training: bool = False,
                   ret_activs: bool = False, level_offset: int = 0,
                   force_batch_stats: bool = False, heads: str = "main"):
        """mode='supp_cls'/'qry_cls': class head only (episodic path).
        ``heads='both'`` with ``config.separate_head`` returns
        (sep_out, main_out[, activs]) — the reference's supp_cls dispatch
        always asks for both heads (efficientdet.py:897)."""
        # positional args: remat_heads wraps class_net in nn.remat, whose
        # static_argnums are positional indices
        return self.class_net(activs, training, ret_activs, level_offset,
                              force_batch_stats, heads)

    def box_head(self, activs, training: bool = False):
        """box-branch of mode='not_cls'."""
        return self.box_net(activs, training, False, 0, False, "main")

    def __call__(self, x, training: bool = False):
        """mode='full_net': image -> (class_out, box_out) per level."""
        x = x.astype(jnp.dtype(self.config.compute_dtype))
        feats = self.backbone(x, training)
        activs = self.fpn(feats, training)
        return self.heads(activs, training)
