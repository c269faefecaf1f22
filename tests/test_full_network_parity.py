"""FULL-ARCHITECTURE conversion-parity fixture (VERDICT r2 item #1).

One test exercises every checkpoint-converter name-family in a single
forward: a complete efficientdet_d0 (EfficientNet-B0 stem + all 16 MBConv
blocks + P6/P7 resamples + 3 fastattn BiFPN cells + class/box heads) is
loaded from a synthesized reference-named torch state_dict
(effdet/efficientdet.py:831-933 module tree, timm backbone names), and the
forward activations are checked against an INDEPENDENT raw-torch
recomputation of the reference composition at every stage boundary
(backbone P3/P4/P5, FPN P3..P7, head outputs per level), then the final
detections through ``topk_method='exact'`` are checked against a
numpy-side decode + score-threshold + per-class greedy-NMS composition
(reference generate_detections, effdet/anchors.py:95-172).

This is the strongest feasible proxy for the BASELINE "COCO mAP within
0.1 with converted reference weights" claim in an environment with no
network / timm / torchvision: it proves the converter's name translation
AND layout rules produce a network computing the reference function
end-to-end, not just per-module.

Parametrized over BOTH padding conventions: ``efficientdet_d0`` (torch
symmetric padding, redundant_bias=False) and ``tf_efficientdet_d0``
(TF SAME asymmetric padding + redundant conv_pw biases before BN,
redundant_bias=True — the convention of the BASELINE tf_efficientdet_d3/d4
URL-weight parity anchors, reference model_config.py:44,58). The torch
side reproduces TF SAME with explicit asymmetric F.pad (value -inf for
max pools, matching timm's Conv2dSame/create_pool2d, what the reference's
tf_* backbones use).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ood_object_detection_tpu.config import get_efficientdet_config  # noqa: E402
from ood_object_detection_tpu.models.efficientdet import EfficientDet  # noqa: E402
from ood_object_detection_tpu.ops.anchors import Anchors  # noqa: E402
from ood_object_detection_tpu.ops.post_process import generate_detections  # noqa: E402
from ood_object_detection_tpu.utils.checkpoint_convert import (  # noqa: E402
    convert_state_dict,
    merge_into_variables,
)

NUM_CLASSES = 4
IMG = 128

# EfficientNet-B0 stage table (published architecture, arXiv:1905.11946):
# (block, repeats, kernel, stride, expand, out_ch, se_ratio)
B0_STAGES = [
    ("ds", 1, 3, 1, 1.0, 16, 0.25),
    ("ir", 2, 3, 2, 6.0, 24, 0.25),
    ("ir", 2, 5, 2, 6.0, 40, 0.25),
    ("ir", 3, 3, 2, 6.0, 80, 0.25),
    ("ir", 3, 5, 1, 6.0, 112, 0.25),
    ("ir", 4, 5, 2, 6.0, 192, 0.25),
    ("ir", 1, 3, 1, 6.0, 320, 0.25),
]
FPN_CH = 64
# BiFPN node graph for min_level=3..max_level=7 (published EfficientDet
# top-down + bottom-up recurrence): (target_reduction, input_offsets)
BIFPN_NODES = [
    (64, (3, 4)), (32, (2, 5)), (16, (1, 6)), (8, (0, 7)),
    (16, (1, 7, 8)), (32, (2, 6, 9)), (64, (3, 5, 10)), (128, (4, 11)),
]


class _SD:
    """State-dict builder: creates reference-named torch params on demand
    (deterministic per creation order), so the synthesized dict holds
    exactly the keys the reference module tree would."""

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.d = {}

    def conv(self, name, out_ch, in_ch, k, groups=1, bias=False, scale=None):
        fan_in = (in_ch // groups) * k * k
        scale = scale if scale is not None else 1.0 / np.sqrt(fan_in)
        self.d[f"{name}.weight"] = self.rng.normal(
            0, scale, (out_ch, in_ch // groups, k, k)).astype(np.float32)
        if bias:
            self.d[f"{name}.bias"] = self.rng.normal(
                0, 0.05, (out_ch,)).astype(np.float32)

    def bn(self, name, ch):
        self.d[f"{name}.weight"] = self.rng.uniform(0.8, 1.2, ch).astype(np.float32)
        self.d[f"{name}.bias"] = self.rng.normal(0, 0.1, ch).astype(np.float32)
        self.d[f"{name}.running_mean"] = self.rng.normal(0, 0.1, ch).astype(np.float32)
        self.d[f"{name}.running_var"] = self.rng.uniform(0.8, 1.2, ch).astype(np.float32)

    def vec(self, name, n):
        self.d[name] = np.abs(self.rng.normal(1, 0.2, n)).astype(np.float32)


def _same_pads(n, k, s):
    """TF SAME pad (low, high) for one spatial dim."""
    total = max((-(-n // s) - 1) * s + k - n, 0)
    return total // 2, total - total // 2


def _pad_same(x, k, s, value=0.0):
    pt, pb = _same_pads(x.shape[2], k, s)
    pl, pr = _same_pads(x.shape[3], k, s)
    return F.pad(x, (pl, pr, pt, pb), value=value)


def _conv(x, sd, name, stride=1, padding=0, groups=1):
    """padding: int (torch symmetric) or 'same' (TF asymmetric)."""
    w = torch.from_numpy(sd[f"{name}.weight"])
    if padding == "same":
        x = _pad_same(x, w.shape[2], stride)
        padding = 0
    b = sd.get(f"{name}.bias")
    return F.conv2d(x, w, torch.from_numpy(b) if b is not None else None,
                    stride=stride, padding=padding, groups=groups)


def _maxpool(x, k, s, pad_type):
    if pad_type == "same":
        # TF SAME pooling: asymmetric pad with -inf (timm create_pool2d)
        return F.max_pool2d(_pad_same(x, k, s, value=float("-inf")), k, s)
    return F.max_pool2d(x, k, s, padding=(k - 1) // 2)


def _bn(x, sd, name, eps=1e-3):
    return F.batch_norm(
        x, torch.from_numpy(sd[f"{name}.running_mean"]),
        torch.from_numpy(sd[f"{name}.running_var"]),
        torch.from_numpy(sd[f"{name}.weight"]),
        torch.from_numpy(sd[f"{name}.bias"]), training=False, eps=eps)


def _se(x, sd, name, act=F.silu):
    s = x.mean(dim=(2, 3), keepdim=True)
    s = act(_conv(s, sd, f"{name}.conv_reduce"))
    s = _conv(s, sd, f"{name}.conv_expand")
    return x * torch.sigmoid(s)


def build_state_dict(seed=0, rb=False):
    """Every param of the reference efficientdet_d0 module tree, by name.

    ``rb``: redundant_bias — tf_* variants keep the original TF models'
    back-to-back bias+BN layers (reference model_config.py:58): conv_pw
    biases on the BiFPN after_combine / head conv_rep separable convs and
    on the resample 1x1 convs (efficientdet.py:158,286,387)."""
    sd = _SD(seed)
    # --- backbone (timm efficientnet_b0 feature-extractor names) ---
    sd.conv("backbone.conv_stem", 32, 3, 3)
    sd.bn("backbone.bn1", 32)
    in_ch = 32
    for si, (blk, reps, k, _s, expand, out_ch, se_ratio) in enumerate(B0_STAGES):
        for r in range(reps):
            p = f"backbone.blocks.{si}.{r}"
            if blk == "ds":
                sd.conv(f"{p}.conv_dw", in_ch, in_ch, k, groups=in_ch)
                sd.bn(f"{p}.bn1", in_ch)
                red = max(1, int(in_ch * se_ratio))
                sd.conv(f"{p}.se.conv_reduce", red, in_ch, 1, bias=True)
                sd.conv(f"{p}.se.conv_expand", in_ch, red, 1, bias=True)
                sd.conv(f"{p}.conv_pw", out_ch, in_ch, 1)
                sd.bn(f"{p}.bn2", out_ch)
            else:
                mid = int(in_ch * expand)
                sd.conv(f"{p}.conv_pw", mid, in_ch, 1)
                sd.bn(f"{p}.bn1", mid)
                sd.conv(f"{p}.conv_dw", mid, mid, k, groups=mid)
                sd.bn(f"{p}.bn2", mid)
                red = max(1, int(in_ch * se_ratio))
                sd.conv(f"{p}.se.conv_reduce", red, mid, 1, bias=True)
                sd.conv(f"{p}.se.conv_expand", mid, red, 1, bias=True)
                sd.conv(f"{p}.conv_pwl", out_ch, mid, 1)
                sd.bn(f"{p}.bn3", out_ch)
            in_ch = out_ch
    # --- fpn extra-level resamples (P6 from P5, P7 from P6) ---
    sd.conv("fpn.resample.3.conv.conv", FPN_CH, 320, 1, bias=rb)
    sd.bn("fpn.resample.3.conv.bn", FPN_CH)
    # resample.4 (P7): input already FPN_CH wide -> pool only, no params
    # --- fpn cells ---
    chans = [40, 112, 320, FPN_CH, FPN_CH]
    for cell in range(3):
        for ni, (_red, offsets) in enumerate(BIFPN_NODES):
            p = f"fpn.cell.{cell}.fnode.{ni}"
            for off in offsets:
                if chans[off] != FPN_CH:
                    sd.conv(f"{p}.combine.resample.{off}.conv.conv",
                            FPN_CH, chans[off], 1, bias=rb)
                    sd.bn(f"{p}.combine.resample.{off}.conv.bn", FPN_CH)
            sd.vec(f"{p}.combine.edge_weights", len(offsets))
            sd.conv(f"{p}.after_combine.conv.conv_dw", FPN_CH, FPN_CH, 3,
                    groups=FPN_CH)
            sd.conv(f"{p}.after_combine.conv.conv_pw", FPN_CH, FPN_CH, 1,
                    bias=rb)
            sd.bn(f"{p}.after_combine.conv.bn", FPN_CH)
            chans.append(FPN_CH)
        chans = [FPN_CH] * 5
    # --- heads ---
    n_anchors = 9
    for net, n_out in (("class_net", NUM_CLASSES), ("box_net", 4)):
        for r in range(3):
            sd.conv(f"{net}.conv_rep.{r}.conv_dw", FPN_CH, FPN_CH, 3,
                    groups=FPN_CH)
            sd.conv(f"{net}.conv_rep.{r}.conv_pw", FPN_CH, FPN_CH, 1,
                    bias=rb)
            for lvl in range(5):
                sd.bn(f"{net}.bn_rep.{r}.{lvl}.bn", FPN_CH)
        sd.conv(f"{net}.predict.conv_dw", FPN_CH, FPN_CH, 3, groups=FPN_CH)
        sd.conv(f"{net}.predict.conv_pw", n_out * n_anchors, FPN_CH, 1,
                bias=True)
    if "class_net.predict.conv_pw.bias" in sd.d:
        # focal-style prior: mostly-background scores in a useful range
        sd.d["class_net.predict.conv_pw.bias"] = (
            sd.d["class_net.predict.conv_pw.bias"] - 2.0)
    return sd.d


# ---------------------------------------------------------------------------
# independent torch recomputation of the reference composition
# ---------------------------------------------------------------------------

def torch_backbone(x, sd, pad_type=""):
    def cpad(k, s=1):
        return "same" if pad_type == "same" else k // 2
    x = _conv(x, sd, "backbone.conv_stem", stride=2, padding=cpad(3, 2))
    x = F.silu(_bn(x, sd, "backbone.bn1"))
    feats = {}
    stride, in_ch = 2, 32
    for si, (blk, reps, k, s0, expand, out_ch, se_ratio) in enumerate(B0_STAGES):
        if s0 == 2:
            feats[stride] = x
            stride *= 2
        for r in range(reps):
            p = f"backbone.blocks.{si}.{r}"
            s = s0 if r == 0 else 1
            shortcut = x
            if blk == "ds":
                y = _conv(x, sd, f"{p}.conv_dw", stride=s, padding=cpad(k, s),
                          groups=in_ch)
                y = F.silu(_bn(y, sd, f"{p}.bn1"))
                y = _se(y, sd, f"{p}.se")
                y = _conv(y, sd, f"{p}.conv_pw")
                y = _bn(y, sd, f"{p}.bn2")
            else:
                mid = int(in_ch * expand)
                y = F.silu(_bn(_conv(x, sd, f"{p}.conv_pw"), sd, f"{p}.bn1"))
                y = _conv(y, sd, f"{p}.conv_dw", stride=s, padding=cpad(k, s),
                          groups=mid)
                y = F.silu(_bn(y, sd, f"{p}.bn2"))
                y = _se(y, sd, f"{p}.se")
                y = _conv(y, sd, f"{p}.conv_pwl")
                y = _bn(y, sd, f"{p}.bn3")
            if s == 1 and in_ch == out_ch:
                y = y + shortcut
            x = y
            in_ch = out_ch
    feats[stride] = x
    return [feats[8], feats[16], feats[32]]


def torch_fpn(feats, sd, pad_type=""):
    # P6/P7 resamples (reference BiFpn.__init__, efficientdet.py:315-337)
    p6 = _conv(feats[2], sd, "fpn.resample.3.conv.conv")
    p6 = _bn(p6, sd, "fpn.resample.3.conv.bn")
    p6 = _maxpool(p6, 3, 2, pad_type)
    p7 = _maxpool(p6, 3, 2, pad_type)
    x = list(feats) + [p6, p7]
    chans = [40, 112, 320, FPN_CH, FPN_CH]
    reds = [8, 16, 32, 64, 128]
    for cell in range(3):
        for ni, (red, offsets) in enumerate(BIFPN_NODES):
            p = f"fpn.cell.{cell}.fnode.{ni}"
            nodes = []
            for off in offsets:
                v = x[off]
                if chans[off] != FPN_CH:
                    v = _conv(v, sd, f"{p}.combine.resample.{off}.conv.conv")
                    v = _bn(v, sd, f"{p}.combine.resample.{off}.conv.bn")
                ratio = red // reds[off] if red >= reds[off] else 0
                if ratio > 1:
                    v = _maxpool(v, ratio + 1, ratio, pad_type)
                elif ratio == 0:
                    v = F.interpolate(v, scale_factor=reds[off] // red,
                                      mode="nearest")
                nodes.append(v)
            w = F.relu(torch.from_numpy(sd[f"{p}.combine.edge_weights"]))
            w = w / (w.sum() + 1e-4)
            out = sum(n * w[i] for i, n in enumerate(nodes))
            out = F.silu(out)
            out = _conv(out, sd, f"{p}.after_combine.conv.conv_dw",
                        padding="same" if pad_type == "same" else 1,
                        groups=FPN_CH)
            out = _conv(out, sd, f"{p}.after_combine.conv.conv_pw")
            out = _bn(out, sd, f"{p}.after_combine.conv.bn")
            x.append(out)
            chans.append(FPN_CH)
            reds.append(red)
        x, chans, reds = x[-5:], [FPN_CH] * 5, [8, 16, 32, 64, 128]
    return x


def torch_head(levels, sd, net, pad_type=""):
    pad = "same" if pad_type == "same" else 1
    outs = []
    for lvl, x in enumerate(levels):
        for r in range(3):
            x = _conv(x, sd, f"{net}.conv_rep.{r}.conv_dw", padding=pad,
                      groups=FPN_CH)
            x = _conv(x, sd, f"{net}.conv_rep.{r}.conv_pw")
            x = F.silu(_bn(x, sd, f"{net}.bn_rep.{r}.{lvl}.bn"))
        x = _conv(x, sd, f"{net}.predict.conv_dw", padding=pad, groups=FPN_CH)
        x = _conv(x, sd, f"{net}.predict.conv_pw")
        outs.append(x)
    return outs


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture(scope="module",
                params=["efficientdet_d0", "tf_efficientdet_d0"])
def loaded(request):
    cfg = get_efficientdet_config(
        request.param, num_classes=NUM_CLASSES).replace(
            image_size=(IMG, IMG))
    model = EfficientDet(cfg)
    rng = np.random.default_rng(7)
    x = rng.uniform(-1.5, 1.5, (2, IMG, IMG, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), False)

    sd = build_state_dict(seed=3, rb=cfg.redundant_bias)
    converted = convert_state_dict(sd)
    assert not converted["_unmatched"], list(converted["_unmatched"])[:8]
    new_vars, report = merge_into_variables(
        {c: variables[c] for c in ("params", "batch_stats")}, converted)
    return cfg, model, new_vars, sd, x, report


def test_every_name_family_converts(loaded):
    """The synthesized reference state_dict covers the COMPLETE model: no
    model leaf left unfilled, no checkpoint leaf unconsumed."""
    *_, report = loaded
    assert not report["missing"], report["missing"][:10]
    assert not report["unexpected"], report["unexpected"][:10]
    # the full net is big: make sure we actually loaded hundreds of leaves
    assert len(report["loaded"]) > 400


def test_backbone_stage_parity(loaded):
    cfg, model, new_vars, sd, x, _ = loaded
    ours = model.apply(new_vars, jnp.asarray(x), False,
                       method="backbone_features")
    theirs = torch_backbone(torch.from_numpy(
        np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))), sd,
        pad_type=cfg.pad_type)
    for lvl, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(np.asarray(o), _nhwc(t), rtol=1e-4,
                                   atol=1e-4, err_msg=f"P{lvl + 3}")


def test_fpn_stage_parity(loaded):
    cfg, model, new_vars, sd, x, _ = loaded
    t_in = torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))
    t_feats = torch_backbone(t_in, sd, pad_type=cfg.pad_type)
    t_fpn = torch_fpn(t_feats, sd, pad_type=cfg.pad_type)
    ours = model.apply(new_vars, jnp.asarray(x), False, method="image_to_fpn")
    assert len(ours) == 5
    for lvl, (o, t) in enumerate(zip(ours, t_fpn)):
        np.testing.assert_allclose(np.asarray(o), _nhwc(t), rtol=1e-4,
                                   atol=1e-4, err_msg=f"FPN P{lvl + 3}")


def test_head_output_parity(loaded):
    cfg, model, new_vars, sd, x, _ = loaded
    cls_out, box_out = model.apply(new_vars, jnp.asarray(x), False)
    t_in = torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))
    t_fpn = torch_fpn(torch_backbone(t_in, sd, pad_type=cfg.pad_type), sd,
                      pad_type=cfg.pad_type)
    t_cls = torch_head(t_fpn, sd, "class_net", pad_type=cfg.pad_type)
    t_box = torch_head(t_fpn, sd, "box_net", pad_type=cfg.pad_type)
    for lvl in range(5):
        np.testing.assert_allclose(np.asarray(cls_out[lvl]), _nhwc(t_cls[lvl]),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"class P{lvl + 3}")
        np.testing.assert_allclose(np.asarray(box_out[lvl]), _nhwc(t_box[lvl]),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"box P{lvl + 3}")


# ---------------------------------------------------------------------------
# (b) detection-level parity: exact top-k -> decode -> threshold -> NMS
# ---------------------------------------------------------------------------

def _np_decode(codes, anchors_yxyx):
    """Reference decode_box_outputs (effdet/anchors.py:49-70), numpy."""
    ya = (anchors_yxyx[:, 0] + anchors_yxyx[:, 2]) / 2
    xa = (anchors_yxyx[:, 1] + anchors_yxyx[:, 3]) / 2
    ha = anchors_yxyx[:, 2] - anchors_yxyx[:, 0]
    wa = anchors_yxyx[:, 3] - anchors_yxyx[:, 1]
    ty, tx, th, tw = codes[:, 0], codes[:, 1], codes[:, 2], codes[:, 3]
    w = np.exp(tw) * wa
    h = np.exp(th) * ha
    yc = ty * ha + ya
    xc = tx * wa + xa
    return np.stack([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], -1)


def _np_iou(a, b):
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), -1)
    area_a = np.prod(a[:, 2:] - a[:, :2], -1)
    area_b = np.prod(b[:, 2:] - b[:, :2], -1)
    return inter / (area_a[:, None] + area_b[None] - inter + 1e-9)


def _np_reference_detections(cls_levels, box_levels, anchors, k=5000,
                             iou_thr=0.5, max_det=100):
    """Flat (anchor, class) top-k -> sigmoid -> 0.01 filter -> per-class
    greedy NMS — the reference generate_detections composition."""
    cls_all = np.concatenate(
        [c.reshape(c.shape[0], -1, NUM_CLASSES) for c in cls_levels], 1)
    box_all = np.concatenate(
        [b.reshape(b.shape[0], -1, 4) for b in box_levels], 1)
    out = []
    for b in range(cls_all.shape[0]):
        flat = cls_all[b].reshape(-1)
        top = np.argsort(-flat, kind="stable")[:k]
        aidx, cidx = top // NUM_CLASSES, top % NUM_CLASSES
        scores = 1.0 / (1.0 + np.exp(-flat[top]))
        keep_mask = scores > 0.01
        aidx, cidx, scores = aidx[keep_mask], cidx[keep_mask], scores[keep_mask]
        boxes = _np_decode(box_all[b][aidx], anchors[aidx])
        sel = []
        order = np.argsort(-scores, kind="stable")
        suppressed = np.zeros(len(order), bool)
        for oi in order:
            if suppressed[oi]:
                continue
            sel.append(oi)
            if len(sel) >= max_det:
                break
            same = cidx == cidx[oi]
            iou = _np_iou(boxes[oi][None], boxes)[0]
            suppressed |= same & (iou > iou_thr) & (scores < scores[oi])
        sel = np.asarray(sel, int)
        out.append((boxes[sel], scores[sel], cidx[sel] + 1))
    return out


def test_detection_parity_exact_mode(loaded):
    """Final detections through topk_method='exact' match the torch/numpy
    reference decode+threshold+NMS composition on the converted net."""
    cfg, model, new_vars, sd, x, _ = loaded
    anchors = Anchors.from_config(cfg)
    cls_out, box_out = model.apply(new_vars, jnp.asarray(x), False)

    dets, _ = generate_detections(
        cls_out, box_out, jnp.asarray(anchors.boxes),
        num_classes=NUM_CLASSES, max_detection_points=5000,
        max_det_per_image=100, soft_nms=False, iou_threshold=0.5,
        topk_method="exact", nms_impl="xla")
    dets = np.asarray(dets)

    refs = _np_reference_detections(
        [np.asarray(c, np.float32) for c in cls_out],
        [np.asarray(bx, np.float32) for bx in box_out],
        np.asarray(anchors.boxes, np.float32))

    for b in range(2):
        ref_boxes, ref_scores, ref_cls = refs[b]
        got = dets[b]
        got = got[got[:, 4] > 0.05]
        ref_keep = ref_scores > 0.05
        ref_boxes, ref_scores, ref_cls = (
            ref_boxes[ref_keep], ref_scores[ref_keep], ref_cls[ref_keep])
        assert len(got) == len(ref_scores), (len(got), len(ref_scores))
        np.testing.assert_allclose(got[:, 4], ref_scores, rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_array_equal(got[:, 5].astype(int), ref_cls)
        np.testing.assert_allclose(got[:, :4], ref_boxes, rtol=1e-3,
                                   atol=5e-3)
