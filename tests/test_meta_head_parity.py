"""Support-path class-head parity vs a torch oracle of the reference
MetaHead forward (effdet/efficientdet.py:645-694).

The episodic support path runs the class head at ``level_offset=2`` over
the full 5-level pyramid. Two semantics are pinned here against a literal
torch re-composition of MetaHead.forward:

  * BN selection is by ABSOLUTE level: the reference slices
    ``bn_rep_w[level*num_layers:(level+1)*num_layers]`` with ``level``
    starting at ``level_offset`` (efficientdet.py:666-668), i.e. support
    crops use the TOP-level BNs (levels 2..4) — the choice HeadNet makes
    with ``bns[r][level]`` (models/heads.py).
  * BN normalizes with BATCH stats (F.batch_norm(training=True) against
    never-read zero/one running stats, efficientdet.py:673) — our
    ``force_batch_stats``.
  * ``activs`` are the predict conv's DEPTHWISE output (the reference's
    obj_embds, efficientdet.py:685-691), and the separate head is a 1x1
    conv on that same tensor (add_head, efficientdet.py:640-643).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ood_object_detection_tpu.config import get_efficientdet_config  # noqa: E402
from ood_object_detection_tpu.models.heads import HeadNet  # noqa: E402


def _t(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(x_nhwc, (0, 3, 1, 2))))


def _nhwc(x_t):
    return np.transpose(x_t.detach().numpy(), (0, 2, 3, 1))


def test_support_class_head_parity_vs_reference_meta_head(rng):
    """class_head(level_offset=2, force_batch_stats=True, heads='both')
    == the reference MetaHead forward at level_offset=2 (torch oracle)."""
    ch = 16
    cfg = get_efficientdet_config("efficientdet_d0", num_classes=1,
                                  separate_head=True)
    reps, levels = cfg.box_class_repeats, cfg.num_levels
    n_anch = cfg.num_anchors_per_location          # num_classes=1 -> A=9
    head = HeadNet(cfg, num_outputs=1, is_class_head=True,
                   num_channels=ch, separate_head=True)

    grids = [16, 8, 4, 2, 1]
    x_levels = [rng.normal(0, 1, (3, g, g, ch)).astype(np.float32)
                for g in grids[:levels]]
    variables = head.init(jax.random.key(0),
                          [jnp.asarray(x) for x in x_levels], False)

    # --- synthesize reference-layout (torch OIHW) weights for every leaf ---
    w = {
        "conv_dw": [rng.normal(0, 0.4, (ch, 1, 3, 3)).astype(np.float32)
                    for _ in range(reps)],
        "conv_pw": [rng.normal(0, 0.4, (ch, ch, 1, 1)).astype(np.float32)
                    for _ in range(reps)],
        "conv_pb": [rng.normal(0, 0.4, (ch,)).astype(np.float32)
                    for _ in range(reps)],
        "bn_w": rng.uniform(0.5, 1.5, (reps, levels, ch)).astype(np.float32),
        "bn_b": rng.normal(0, 0.4, (reps, levels, ch)).astype(np.float32),
        "predict_dw": rng.normal(0, 0.4, (ch, 1, 3, 3)).astype(np.float32),
        "predict_pw": rng.normal(0, 0.4, (n_anch, ch, 1, 1)).astype(np.float32),
        "predict_pb": rng.normal(0, 0.4, (n_anch,)).astype(np.float32),
        "predict_pw_sep": rng.normal(0, 0.4, (n_anch, ch, 1, 1))
            .astype(np.float32),
        "predict_pb_sep": rng.normal(0, 0.4, (n_anch,)).astype(np.float32),
    }

    def dw_hwio(k):          # (C,1,kh,kw) -> (kh,kw,1,C)
        return np.transpose(k, (2, 3, 1, 0))

    def pw_hwio(k):          # (O,I,1,1) -> (1,1,I,O)
        return np.transpose(k, (2, 3, 1, 0))

    params = dict(variables["params"])
    for r in range(reps):
        params[f"conv_rep_{r}"] = {
            "conv_dw": {"kernel": jnp.asarray(dw_hwio(w["conv_dw"][r]))},
            "conv_pw": {"kernel": jnp.asarray(pw_hwio(w["conv_pw"][r])),
                        "bias": jnp.asarray(w["conv_pb"][r])},
        }
        for l in range(levels):
            params[f"bn_rep_{r}_{l}"] = {
                "scale": jnp.asarray(w["bn_w"][r, l]),
                "bias": jnp.asarray(w["bn_b"][r, l])}
    params["predict"] = {
        "conv_dw": {"kernel": jnp.asarray(dw_hwio(w["predict_dw"]))},
        "conv_pw": {"kernel": jnp.asarray(pw_hwio(w["predict_pw"])),
                    "bias": jnp.asarray(w["predict_pb"])},
    }
    params["predict_sep"] = {
        "kernel": jnp.asarray(pw_hwio(w["predict_pw_sep"])),
        "bias": jnp.asarray(w["predict_pb_sep"])}
    new_vars = {**variables, "params": params}

    sep, main, activs = head.apply(
        new_vars, [jnp.asarray(x) for x in x_levels], False,
        ret_activs=True, level_offset=2, force_batch_stats=True,
        heads="both")
    assert len(sep) == len(main) == len(activs) == levels - 2

    # --- torch oracle: the reference MetaHead forward, verbatim math ---
    F = torch.nn.functional
    running_mu = torch.zeros(ch)
    running_std = torch.ones(ch)
    for out_ix, level in enumerate(range(2, levels)):
        t = _t(x_levels[level])
        for r in range(reps):
            t = F.pad(t, (1, 1, 1, 1))
            t = F.conv2d(t, torch.from_numpy(w["conv_dw"][r]), groups=ch)
            t = F.conv2d(t, torch.from_numpy(w["conv_pw"][r]),
                         torch.from_numpy(w["conv_pb"][r]))
            # absolute-level BN slice (efficientdet.py:666-668), batch
            # stats (training=True; the running tensors are never read)
            t = F.batch_norm(t, running_mu.clone(), running_std.clone(),
                             torch.from_numpy(w["bn_w"][r, level]),
                             torch.from_numpy(w["bn_b"][r, level]),
                             training=True, eps=cfg.norm_eps)
            t = t * torch.sigmoid(t)                       # swish
        x_pred = F.pad(t, (1, 1, 1, 1))
        x_pred = F.conv2d(x_pred, torch.from_numpy(w["predict_dw"]),
                          groups=ch)
        x_out = F.conv2d(x_pred, torch.from_numpy(w["predict_pw"]),
                         torch.from_numpy(w["predict_pb"]))
        x_sep = F.conv2d(x_pred, torch.from_numpy(w["predict_pw_sep"]),
                         torch.from_numpy(w["predict_pb_sep"]))

        np.testing.assert_allclose(np.asarray(activs[out_ix]), _nhwc(x_pred),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(main[out_ix]), _nhwc(x_out),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sep[out_ix]), _nhwc(x_sep),
                                   rtol=1e-4, atol=1e-4)
