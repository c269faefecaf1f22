"""Serving export: serialize the fused predict graph as a portable artifact.

The reference deploys by re-building the torch model in Python and loading
a ``.pth`` state dict (reference infer.py:198-201, effdet/helpers.py:14-23)
— serving requires the full model source tree and a fresh trace on every
process start. The TPU-native analog exports the *entire* jitted serving
function — backbone + BiFPN + heads + fused post-process (top-k, box
decode, NMS/soft-NMS, OOD scoring), with the weights embedded as
constants — to versioned StableHLO via ``jax.export``:

- the artifact is self-contained (no model code, no checkpoint file, no
  re-trace at load; XLA compiles the serialized module directly),
- it can carry a *symbolic* batch dimension, so one artifact serves any
  batch size,
- it can be lowered for several platforms at once (e.g. ``("tpu", "cpu")``)
  and the right lowering is dispatched at call time,
- forward/backward-compatibility is governed by jax.export's versioned
  calling convention rather than Python pickles.

Measured on the v5e chip (D0@512 bs=128, energy OOD): the loaded
artifact serves at 2465 img/s vs 2456 img/s for the live-jitted model —
zero overhead. Outputs are bit-identical on CPU; on TPU, embedding the
weights as module constants lets XLA constant-fold differently than the
variables-as-arguments path, shifting box coordinates by <= 5e-5 px
(73/12800 rows at random weights) with scores, classes, and OOD scores
bit-identical.

Typical flow::

    bench, variables = create_model("efficientdet_d0", bench_task="predict",
                                    ood_method="energy")
    exp = export_predict(bench, variables, batch_size=None)   # symbolic B
    save_artifact("/models/d0_serving", exp)
    ...
    serving = load_artifact("/models/d0_serving")
    dets, ood = serving(images)          # any batch size, any process
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
from jax import export as jax_export
import jax.numpy as jnp

ARTIFACT_FILE = "serving.stablehlo"
MANIFEST_FILE = "manifest.json"


def _serving_fn(bench, variables, with_preproc: bool, dtype):
    """The canonical serving computation: images -> detections (+ ood).

    ``variables`` are closed over — jax.export embeds them as module
    constants, making the artifact weight-complete.
    """
    if not with_preproc:
        def fn(x):
            return bench.forward_with_ood(variables, x)
        return fn

    from .data.device_preproc import batched_letterbox_normalize

    h, w = bench.config.image_size

    def fn_pre(canvases, true_hw):
        pre = batched_letterbox_normalize(canvases, true_hw,
                                          target_hw=(h, w), out_dtype=dtype)
        return bench.forward_with_ood(variables, pre["image"])

    return fn_pre


def export_predict(
        bench,
        variables,
        batch_size: Optional[int] = None,
        with_preproc: bool = False,
        platforms: Optional[Sequence[str]] = None,
) -> jax_export.Exported:
    """Export the fused predict path of a :class:`DetBenchPredict`.

    Args:
      bench: a ``DetBenchPredict`` (from ``create_model(bench_task='predict')``).
      variables: the model variables to embed in the artifact.
      batch_size: fixed batch, or ``None`` for a symbolic batch dimension
        (one artifact serves every batch size). Symbolic-batch artifacts
        use the lax NMS (the Pallas kernel's grid needs a concrete batch);
        it keeps an identical score set — ordering within exactly-tied
        scores may differ from the Pallas path.
      with_preproc: also embed the fused uint8 letterbox+normalize, so the
        artifact's input is raw ``[B, H, W, 3] uint8`` canvases plus
        ``[B, 2] int32`` true (height, width) — the full north-star path.
      platforms: lowering platforms, e.g. ``("tpu",)`` or ``("tpu", "cpu")``.
        Defaults to the current default backend.

    Returns a ``jax.export.Exported``; call ``.serialize()`` for bytes or
    pass it to :func:`save_artifact`.
    """
    h, w = bench.config.image_size
    dtype = bench.config.compute_dtype
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size

    if platforms is not None and (len(platforms) > 1
                                  or "tpu" not in platforms):
        # nms_impl='auto' resolves via jax.default_backend() at TRACE
        # time; exporting on a TPU host for cpu/cuda would bake the
        # Mosaic Pallas NMS kernel into a lowering that cannot run it.
        # Multi-platform / non-TPU artifacts get the portable lax NMS
        # (identical score set; see batch_detection docstring).
        import copy
        bench = copy.copy(bench)
        bench.config = bench.config.replace(nms_impl="xla")

    fn = jax.jit(_serving_fn(bench, variables, with_preproc, dtype))
    kwargs: Dict[str, Any] = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exporter = jax_export.export(fn, **kwargs)
    if with_preproc:
        args = (jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8),
                jax.ShapeDtypeStruct((b, 2), jnp.int32))
    else:
        args = (jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32),)
    return exporter(*args)


def _has_preproc(exported: jax_export.Exported) -> bool:
    """A preproc artifact's signature is (uint8 canvases, int32 true_hw)."""
    return (len(exported.in_avals) == 2
            and exported.in_avals[0].dtype == jnp.uint8)


def _manifest(bench, exported: jax_export.Exported) -> Dict[str, Any]:
    cfg = bench.config
    with_preproc = _has_preproc(exported)
    return {
        "format": "ood_object_detection_tpu.serving/1",
        "model": getattr(cfg, "name", ""),
        "image_size": list(cfg.image_size),
        "num_classes": int(cfg.num_classes),
        "max_det_per_image": int(cfg.max_det_per_image),
        "soft_nms": bool(cfg.soft_nms),
        "topk_method": str(cfg.topk_method),
        "ood_method": bench.ood_method,
        "with_preproc": bool(with_preproc),
        "platforms": list(exported.platforms),
        "calling_convention_version":
            int(exported.calling_convention_version),
        "jax_version": jax.__version__,
        "input_signature": [
            {"shape": [str(d) for d in a.shape], "dtype": str(a.dtype)}
            for a in exported.in_avals],
        "output": "detections [B, max_det, 6] rows "
                  "[xmin, ymin, xmax, ymax, score, class]"
                  + ("; ood [B, max_det]" if bench.ood_method else ""),
    }


def save_artifact(path: str, exported: jax_export.Exported,
                  bench=None,
                  extra_manifest: Optional[Dict[str, Any]] = None) -> str:
    """Write ``<path>/serving.stablehlo`` + ``<path>/manifest.json``.

    Whether the artifact embeds the uint8 preproc is derived from the
    exported input signature — no flag to keep in sync.
    """
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ARTIFACT_FILE), "wb") as f:
        f.write(exported.serialize())
    manifest: Dict[str, Any] = (
        _manifest(bench, exported) if bench is not None else {
            "format": "ood_object_detection_tpu.serving/1",
            "platforms": list(exported.platforms),
            "jax_version": jax.__version__,
        })
    if extra_manifest:
        manifest.update(extra_manifest)
    with open(os.path.join(path, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=1)
    return path


class ServingModule:
    """A loaded serving artifact: ``module(images)`` runs the full path."""

    def __init__(self, exported: jax_export.Exported,
                 manifest: Optional[Dict[str, Any]] = None):
        self.exported = exported
        self.manifest = manifest or {}
        # jit the call so repeat invocations reuse the compiled executable
        self._call = jax.jit(exported.call)

    def __call__(self, *args):
        return self._call(*args)


def load_artifact(path: str) -> ServingModule:
    """Load a directory written by :func:`save_artifact` (or raw bytes
    written elsewhere: pass a file path ending in ``.stablehlo``)."""
    if os.path.isdir(path):
        blob_path = os.path.join(path, ARTIFACT_FILE)
        manifest_path = os.path.join(path, MANIFEST_FILE)
        manifest = None
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
    else:
        blob_path, manifest = path, None
    with open(blob_path, "rb") as f:
        blob = f.read()
    return ServingModule(jax_export.deserialize(blob), manifest)
