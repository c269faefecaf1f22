"""BiFPN / PAN / Quad-FPN feature network, built from declarative node graphs.

Re-design of the reference FpnCombine/Fnode/BiFpnLayer/BiFpn stack
(effdet/efficientdet.py:196-365) on NHWC Flax modules: the graph comes from
``config.fpn_config.FpnGraph`` (static tuples, so the whole FPN unrolls at
trace time into one XLA graph — no Python control flow at runtime).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.fpn_config import FpnGraph, get_fpn_config
from ..config.model_config import ModelConfig
from .layers import ConvBnAct, ResampleFeatureMap, SeparableConv, get_act


def _cfg_dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.compute_dtype)


class FpnCombine(nn.Module):
    """Resample each input node to the target resolution/width and fuse with
    sum / softmax-attention / fast-attention edge weights
    (effdet/efficientdet.py:196-245)."""
    config: ModelConfig
    feature_info: Tuple[Dict[str, int], ...]   # (num_chs, reduction) per node id
    inputs_offsets: Tuple[int, ...]
    target_reduction: int
    weight_method: str = "attn"

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], training: bool = False) -> jnp.ndarray:
        cfg = self.config
        nodes = []
        for offset in self.inputs_offsets:
            info = self.feature_info[offset]
            reduction_ratio = self.target_reduction / info["reduction"]
            node = ResampleFeatureMap(
                in_channels=info["num_chs"],
                out_channels=cfg.fpn_channels,
                reduction_ratio=reduction_ratio,
                pad_type=cfg.pad_type,
                downsample=cfg.downsample_type,
                upsample=cfg.upsample_type,
                apply_bn=cfg.apply_resample_bn,
                conv_after_downsample=cfg.conv_after_downsample,
                redundant_bias=cfg.redundant_bias,
                norm_momentum=cfg.norm_momentum,
                norm_eps=cfg.norm_eps,
                dtype=_cfg_dtype(cfg),
                name=f"resample_{offset}")(x[offset], training)
            nodes.append(node)

        dtype = nodes[0].dtype
        if self.weight_method in ("attn", "fastattn"):
            edge_weights = self.param(
                "edge_weights", nn.initializers.ones, (len(nodes),), jnp.float32)
        if self.weight_method == "attn":
            w = jax.nn.softmax(edge_weights.astype(dtype))
            out = sum(n * w[i] for i, n in enumerate(nodes))
        elif self.weight_method == "fastattn":
            w = jnp.maximum(edge_weights.astype(dtype), 0.0)
            w = w / (jnp.sum(w) + 1e-4)
            out = sum(n * w[i] for i, n in enumerate(nodes))
        elif self.weight_method == "sum":
            out = sum(nodes)
        else:
            raise ValueError(f"unknown weight_method {self.weight_method}")
        return out


class Fnode(nn.Module):
    """combine -> act -> (separable) conv, one FPN graph node
    (effdet/efficientdet.py:248-300)."""
    config: ModelConfig
    feature_info: Tuple[Dict[str, int], ...]
    inputs_offsets: Tuple[int, ...]
    target_reduction: int
    weight_method: str

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], training: bool = False) -> jnp.ndarray:
        cfg = self.config
        out = FpnCombine(
            cfg, self.feature_info, self.inputs_offsets, self.target_reduction,
            weight_method=self.weight_method, name="combine")(x, training)

        conv_cls = SeparableConv if cfg.separable_conv else ConvBnAct
        if cfg.conv_bn_relu_pattern:
            # conv -> bn -> act
            out = conv_cls(
                cfg.fpn_channels, kernel_size=3, pad_type=cfg.pad_type,
                bias=False, norm=True, act_type=cfg.act_type,
                norm_momentum=cfg.norm_momentum, norm_eps=cfg.norm_eps,
                dtype=_cfg_dtype(cfg),
                name="after_combine_conv")(out, training)
        else:
            # act -> conv -> bn (the default EfficientDet ordering)
            out = get_act(cfg.act_type)(out)
            out = conv_cls(
                cfg.fpn_channels, kernel_size=3, pad_type=cfg.pad_type,
                bias=cfg.redundant_bias, norm=True, act_type=None,
                norm_momentum=cfg.norm_momentum, norm_eps=cfg.norm_eps,
                dtype=_cfg_dtype(cfg),
                name="after_combine_conv")(out, training)
        return out


class BiFpnLayer(nn.Module):
    """One FPN cell: run every graph node, return the last num_levels outputs."""
    config: ModelConfig
    graph: FpnGraph
    feature_info: Tuple[Dict[str, int], ...]

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        cfg = self.config
        feature_info = list(self.feature_info)
        x = list(x)
        for i, node in enumerate(self.graph.nodes):
            out = Fnode(
                cfg, tuple(feature_info), node.inputs_offsets, node.reduction,
                node.weight_method, name=f"fnode_{i}")(x, training)
            x.append(out)
            feature_info.append(dict(num_chs=cfg.fpn_channels,
                                     reduction=node.reduction))
        return x[-cfg.num_levels:]


class BiFpn(nn.Module):
    """Full feature network: extra-level resamples (P6, P7, ...) + stacked
    cells (effdet/efficientdet.py:303-365)."""
    config: ModelConfig
    feature_info: Tuple[Dict[str, int], ...]    # backbone features (P3..P5)

    @nn.compact
    def __call__(self, x: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        cfg = self.config
        graph = get_fpn_config(cfg.fpn_name, min_level=cfg.min_level,
                               max_level=cfg.max_level)

        feature_info = [dict(f) for f in self.feature_info]
        x = list(x)
        # add coarser levels by downsampling the deepest feature
        for level in range(cfg.num_levels):
            if level < len(self.feature_info):
                continue
            in_chs = feature_info[-1]["num_chs"]
            reduction = feature_info[-1]["reduction"] * 2
            x.append(ResampleFeatureMap(
                in_channels=in_chs,
                out_channels=cfg.fpn_channels,
                reduction_ratio=2,
                pad_type=cfg.pad_type,
                downsample=cfg.downsample_type,
                upsample=cfg.upsample_type,
                apply_bn=cfg.apply_resample_bn,
                conv_after_downsample=cfg.conv_after_downsample,
                redundant_bias=cfg.redundant_bias,
                norm_momentum=cfg.norm_momentum,
                norm_eps=cfg.norm_eps,
                dtype=_cfg_dtype(cfg),
                name=f"resample_{level}")(x[-1], training))
            feature_info.append(dict(num_chs=cfg.fpn_channels,
                                     reduction=reduction))

        layer_cls = BiFpnLayer
        if cfg.remat_fpn:
            # lifted remat keeps the param tree identical; each cell's
            # intra-node activations are recomputed in the backward pass
            # from the (num_levels)-tensor cell input
            layer_cls = nn.remat(
                BiFpnLayer, static_argnums=(2,),
                policy=jax.checkpoint_policies.nothing_saveable)
        for rep in range(cfg.fpn_cell_repeats):
            x = layer_cls(cfg, graph, tuple(feature_info),
                          name=f"cell_{rep}")(x, training)
            feature_info = [dict(num_chs=cfg.fpn_channels,
                                 reduction=1 << lvl)
                            for lvl in range(cfg.min_level, cfg.max_level + 1)]
        return x
