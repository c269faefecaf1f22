"""MixNet grouped pointwise convs: torch-oracle parity + converter rules.

The reference's mixdet_m/l zoo entries (model_config.py:241-263) use timm
MixNets whose pointwise expand/project convs are GROUPED — timm encodes
them as MixedConv2d over 1x1 kernels (arch tokens a1.1/p1.1), i.e. a
ModuleDict of per-group convs over even channel splits. Our TPU-native
form is a single XLA grouped conv (feature_group_count=2,
models/backbone.py _IrBlock); the checkpoint converter folds timm's
per-group tensors into that one grouped kernel
(utils/checkpoint_convert.py _merge_mixed_pointwise).

This file pins both directions with a hand-written torch oracle that
reproduces timm's MixedConv semantics exactly (split -> per-group conv ->
concat): a full grouped IR block, weights shipped through the converter,
must match to float tolerance.
"""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ood_object_detection_tpu.models.backbone import (  # noqa: E402
    BACKBONE_DEFS,
    BackboneDef,
    BlockSpec,
    GenericBackbone,
    _split_channels,
    create_backbone,
)
from ood_object_detection_tpu.utils.checkpoint_convert import (  # noqa: E402
    convert_state_dict,
    merge_into_variables,
)

BN_EPS = 1e-3


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _mixed_conv(x, weights, kernels, stride=1, groups_dw=False):
    """timm MixedConv2d semantics: split channels, per-group conv, concat.

    weights[i] is the torch [out_g, in_g(/1), k, k] tensor of group i.
    """
    chans = _split_channels(x.shape[1], len(kernels))
    outs, start = [], 0
    for w, k, ch in zip(weights, kernels, chans):
        xg = x[:, start:start + ch]
        g = ch if groups_dw else 1
        outs.append(F.conv2d(xg, w, stride=stride, padding=k // 2, groups=g))
        start += ch
    return torch.cat(outs, dim=1)


def _bn(x, p, training=False):
    return F.batch_norm(x, _t(p["running_mean"]), _t(p["running_var"]),
                        _t(p["weight"]), _t(p["bias"]),
                        training=training, eps=BN_EPS)


def _rand_bn(rng, ch):
    return {
        "weight": rng.normal(1, 0.2, ch).astype(np.float32),
        "bias": rng.normal(0, 0.2, ch).astype(np.float32),
        "running_mean": rng.normal(0, 0.5, ch).astype(np.float32),
        "running_var": rng.uniform(0.5, 2.0, ch).astype(np.float32),
    }


def test_mixed_pw_merge_folds_groups_into_grouped_kernel():
    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 1, (24, 4, 1, 1)).astype(np.float32)
    w1 = rng.normal(0, 1, (24, 4, 1, 1)).astype(np.float32)
    sd = {
        "backbone.blocks.1.0.conv_pw.0.weight": w0,
        "backbone.blocks.1.0.conv_pw.1.weight": w1,
    }
    out = convert_state_dict(sd)
    k = out["params"]["backbone"]["blocks_1_0"]["conv_pw"]["kernel"]
    # grouped torch layout concat along OUT -> flax [1,1,in_g,out]
    assert k.shape == (1, 1, 4, 48)
    np.testing.assert_array_equal(
        k, np.transpose(np.concatenate([w0, w1], 0), (2, 3, 1, 0)))


def test_mixed_pw_merge_rejects_uneven_splits():
    sd = {
        "backbone.blocks.0.0.conv_pwl.0.weight": np.zeros((8, 5, 1, 1)),
        "backbone.blocks.0.0.conv_pwl.1.weight": np.zeros((8, 4, 1, 1)),
    }
    with pytest.raises(ValueError, match="uneven"):
        convert_state_dict(sd)


def test_mixed_pw_merge_rejects_uneven_out_splits():
    """Even input splits but uneven OUTPUT splits must also be rejected:
    feature_group_count divides outputs equally, so folding 16/8 out
    channels into one grouped kernel would silently pair output channels
    with the wrong input group."""
    sd = {
        "backbone.blocks.0.0.conv_pwl.0.weight": np.zeros((16, 4, 1, 1)),
        "backbone.blocks.0.0.conv_pwl.1.weight": np.zeros((8, 4, 1, 1)),
    }
    with pytest.raises(ValueError, match="uneven"):
        convert_state_dict(sd)


def test_mixed_depthwise_names_translate():
    sd = {"backbone.blocks.3.1.conv_dw.1.weight":
          np.zeros((24, 1, 5, 5), np.float32)}
    out = convert_state_dict(sd)
    k = out["params"]["backbone"]["blocks_3_1"]["conv_dw"]["conv_dw_1"]["kernel"]
    assert k.shape == (5, 5, 1, 24)


def test_grouped_ir_block_matches_torch_mixedconv_oracle():
    """Full grouped MixNet IR block vs a timm-semantics torch oracle,
    weights shipped through the checkpoint converter (stem 8 -> mid 48
    -> out 16; pw expand/project grouped x2, mixed dw (3,5), SE 0.5)."""
    rng = np.random.default_rng(7)
    spec = BlockSpec("ir", 1, 0, 1, 6.0, 16, 0.5, act_type="swish",
                     kernels=(3, 5), exp_groups=2, pwl_groups=2)
    bdef = BackboneDef(8, (spec,), act_type="swish", fix_stem=True)
    model = GenericBackbone(bdef, out_reductions=(2,))
    x = rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x))

    in_ch, mid, out_ch = 8, 48, 16
    # --- synthesize a timm-style state dict (MixedConv split tensors) ---
    t = {
        "backbone.conv_stem.weight":
            rng.normal(0, 0.3, (in_ch, 3, 3, 3)).astype(np.float32),
        "backbone.blocks.0.0.conv_pw.0.weight":
            rng.normal(0, 0.3, (mid // 2, in_ch // 2, 1, 1)).astype(np.float32),
        "backbone.blocks.0.0.conv_pw.1.weight":
            rng.normal(0, 0.3, (mid // 2, in_ch // 2, 1, 1)).astype(np.float32),
        "backbone.blocks.0.0.conv_dw.0.weight":
            rng.normal(0, 0.3, (mid // 2, 1, 3, 3)).astype(np.float32),
        "backbone.blocks.0.0.conv_dw.1.weight":
            rng.normal(0, 0.3, (mid // 2, 1, 5, 5)).astype(np.float32),
        "backbone.blocks.0.0.se.conv_reduce.weight":
            rng.normal(0, 0.3, (4, mid, 1, 1)).astype(np.float32),
        "backbone.blocks.0.0.se.conv_reduce.bias":
            rng.normal(0, 0.1, (4,)).astype(np.float32),
        "backbone.blocks.0.0.se.conv_expand.weight":
            rng.normal(0, 0.3, (mid, 4, 1, 1)).astype(np.float32),
        "backbone.blocks.0.0.se.conv_expand.bias":
            rng.normal(0, 0.1, (mid,)).astype(np.float32),
        "backbone.blocks.0.0.conv_pwl.0.weight":
            rng.normal(0, 0.3, (out_ch // 2, mid // 2, 1, 1)).astype(np.float32),
        "backbone.blocks.0.0.conv_pwl.1.weight":
            rng.normal(0, 0.3, (out_ch // 2, mid // 2, 1, 1)).astype(np.float32),
    }
    bns = {
        "backbone.bn1": _rand_bn(rng, in_ch),
        "backbone.blocks.0.0.bn1": _rand_bn(rng, mid),
        "backbone.blocks.0.0.bn2": _rand_bn(rng, mid),
        "backbone.blocks.0.0.bn3": _rand_bn(rng, out_ch),
    }
    for prefix, p in bns.items():
        for leaf, arr in p.items():
            t[f"{prefix}.{leaf}"] = arr

    converted = convert_state_dict(t)
    # standalone backbone: its tree has no 'backbone' root module
    converted = {c: tree.get("backbone", {})
                 for c, tree in converted.items() if c != "_unmatched"}
    merged, report = merge_into_variables(variables, converted)
    assert not report["missing"], report["missing"]
    assert not report["unexpected"], report["unexpected"]

    ours = np.asarray(model.apply(merged, jnp.asarray(x))[0])

    # --- torch oracle: timm MixedConv semantics step by step ---
    with torch.no_grad():
        xt = _t(np.transpose(x, (0, 3, 1, 2)))
        y = F.conv2d(xt, _t(t["backbone.conv_stem.weight"]),
                     stride=2, padding=1)
        y = F.silu(_bn(y, bns["backbone.bn1"]))
        b = "backbone.blocks.0.0"
        y = _mixed_conv(y, [_t(t[f"{b}.conv_pw.0.weight"]),
                            _t(t[f"{b}.conv_pw.1.weight"])], (1, 1))
        y = F.silu(_bn(y, bns[f"{b}.bn1"]))
        y = _mixed_conv(y, [_t(t[f"{b}.conv_dw.0.weight"]),
                            _t(t[f"{b}.conv_dw.1.weight"])], (3, 5),
                        groups_dw=True)
        y = F.silu(_bn(y, bns[f"{b}.bn2"]))
        s = y.mean((2, 3), keepdim=True)
        s = F.silu(F.conv2d(s, _t(t[f"{b}.se.conv_reduce.weight"]),
                            _t(t[f"{b}.se.conv_reduce.bias"])))
        s = torch.sigmoid(F.conv2d(s, _t(t[f"{b}.se.conv_expand.weight"]),
                                   _t(t[f"{b}.se.conv_expand.bias"])))
        y = y * s
        y = _mixed_conv(y, [_t(t[f"{b}.conv_pwl.0.weight"]),
                            _t(t[f"{b}.conv_pwl.1.weight"])], (1, 1))
        y = _bn(y, bns[f"{b}.bn3"])
        theirs = np.transpose(y.numpy(), (0, 2, 3, 1))

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name", ["mixnet_s", "mixnet_m", "mixnet_l"])
def test_mixnet_zoo_entries_have_grouped_pointwise(name):
    """Structural guard: the zoo stage tables actually carry groups
    (kills PARITY deviation #5 permanently)."""
    d = BACKBONE_DEFS[name]
    grouped = [s for s in d.stages if s.exp_groups > 1 or s.pwl_groups > 1]
    assert grouped, f"{name} has no grouped pointwise stages"
    # every grouped stage must have channel counts divisible by its groups
    model, _ = create_backbone(name)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3))))
    params = variables["params"]
    found_grouped_kernel = False
    stem = d.stem_channels if d.fix_stem else None
    del stem
    for key, sub in params.items():
        if not key.startswith("blocks_"):
            continue
        stage_idx = int(key.split("_")[1])
        spec = d.stages[stage_idx]
        if spec.block != "ir" or spec.exp_groups <= 1:
            continue
        k = sub["conv_pw"]["kernel"]
        # grouped kernel: flax [1,1,in/g,out]
        _, _, in_g, out = k.shape
        # dense would have in == out/expand; grouped halves the in axis
        mid = out
        assert mid % spec.exp_groups == 0
        assert in_g * spec.exp_groups == _infer_block_in_channels(
            params, key, d), (key, k.shape)
        found_grouped_kernel = True
    assert found_grouped_kernel


def _infer_block_in_channels(params, block_key, d: BackboneDef) -> int:
    """Input channels of a block = out channels of the previous conv."""
    keys = sorted((k for k in params if k.startswith("blocks_")),
                  key=lambda k: tuple(map(int, k.split("_")[1:])))
    idx = keys.index(block_key)
    if idx == 0:
        return params["conv_stem"]["kernel"].shape[-1]
    prev = params[keys[idx - 1]]
    last_conv = "conv_pwl" if "conv_pwl" in prev else (
        "conv_pw" if "conv_pw" in prev else "conv")
    return prev[last_conv]["kernel"].shape[-1]


def test_mixnet_grouped_param_count_drops_vs_dense():
    """Grouping halves those kernels' parameter counts — a cheap check
    that feature_group_count reached the conv (not just the spec)."""
    d = BACKBONE_DEFS["mixnet_m"]
    dense = dataclasses.replace(
        d, stages=tuple(dataclasses.replace(s, exp_groups=1, pwl_groups=1)
                        for s in d.stages))
    def n_params(definition):
        m = GenericBackbone(definition)
        v = jax.eval_shape(
            lambda: m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3))))
        return sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(v["params"]))
    assert n_params(d) < n_params(dense)


# --- arch-table cross-check against timm's published block strings ---
# Transcribed from timm/models/efficientnet.py _gen_mixnet_s/_gen_mixnet_m
# (the reference's mixdet zoo resolves backbones through these defs).
# Relu stages carry no act token (the mixnet decoder default); 'nsw'
# marks swish. mixnet_l reuses the mixnet_m arch at width 1.3.
_TIMM_MIXNET_S = [
    "ds_r1_k3_s1_e1_c16",
    "ir_r1_k3_a1.1_p1.1_s2_e6_c24", "ir_r1_k3_a1.1_p1.1_s1_e3_c24",
    "ir_r1_k3.5.7_s2_e6_c40_se0.5_nsw",
    "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw",
    "ir_r1_k3.5.7_p1.1_s2_e6_c80_se0.25_nsw",
    "ir_r2_k3.5_p1.1_s1_e6_c80_se0.25_nsw",
    "ir_r1_k3.5.7_a1.1_p1.1_s1_e6_c120_se0.5_nsw",
    "ir_r2_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw",
    "ir_r1_k3.5.7.9.11_s2_e6_c200_se0.5_nsw",
    "ir_r2_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw",
]
_TIMM_MIXNET_M = [
    "ds_r1_k3_s1_e1_c24",
    "ir_r1_k3.5.7_a1.1_p1.1_s2_e6_c32", "ir_r1_k3_a1.1_p1.1_s1_e3_c32",
    "ir_r1_k3.5.7.9_s2_e6_c40_se0.5_nsw",
    "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw",
    "ir_r1_k3.5.7_s2_e6_c80_se0.25_nsw",
    "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e6_c80_se0.25_nsw",
    "ir_r1_k3_s1_e6_c120_se0.5_nsw",
    "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw",
    "ir_r1_k3.5.7.9_s2_e6_c200_se0.5_nsw",
    "ir_r3_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw",
]


def _parse_timm_block(s):
    out = {"block": None, "repeats": 1, "kernels": (), "stride": 1,
           "expand": 1.0, "channels": 0, "se": 0.0, "exp_groups": 1,
           "pwl_groups": 1, "act": "relu"}
    toks = s.split("_")
    out["block"] = toks[0]
    for t in toks[1:]:
        if t == "nsw":
            out["act"] = "swish"
        elif t.startswith("r"):
            out["repeats"] = int(t[1:])
        elif t.startswith("k"):
            out["kernels"] = tuple(int(v) for v in t[1:].split("."))
        elif t.startswith("a"):
            out["exp_groups"] = len(t[1:].split("."))
        elif t.startswith("p") and t[1:2].isdigit():
            out["pwl_groups"] = len(t[1:].split("."))
        elif t.startswith("se"):
            out["se"] = float(t[2:])
        elif t.startswith("s"):
            out["stride"] = int(t[1:])
        elif t.startswith("e"):
            out["expand"] = float(t[1:])
        elif t.startswith("c"):
            out["channels"] = int(t[1:])
    return out


@pytest.mark.parametrize("name,arch", [("mixnet_s", _TIMM_MIXNET_S),
                                       ("mixnet_m", _TIMM_MIXNET_M),
                                       ("mixnet_l", _TIMM_MIXNET_M)])
def test_stage_tables_match_timm_arch_strings(name, arch):
    """Every BlockSpec row — incl. the irregular a1.1/p1.1 grouped
    pointwise placement — must match the timm arch string it models."""
    stages = BACKBONE_DEFS[name].stages
    assert len(stages) == len(arch)
    for spec, s in zip(stages, arch):
        exp = _parse_timm_block(s)
        kernels = tuple(spec.kernels) or (spec.kernel,)
        got = {"block": spec.block, "repeats": spec.repeats,
               "kernels": kernels, "stride": spec.stride,
               "expand": spec.expand, "channels": spec.channels,
               "se": spec.se_ratio, "exp_groups": spec.exp_groups,
               "pwl_groups": spec.pwl_groups,
               "act": spec.act_type or "swish"}
        assert got == exp, f"{name}: {s}\n  expected {exp}\n  got      {got}"
