"""ood_object_detection_tpu: TPU-native open-set / OOD object detection.

A from-scratch JAX / XLA / Pallas re-design of the capability surface of
DavidPetrus/ood_object_detection (an EfficientDet-based open-set detector):
EfficientNet backbones + BiFPN + class/box heads, on-device anchor labeling,
fused fixed-shape post-processing with hard/soft NMS and OOD scoring, SPMD
data-parallel training, and an episodic MAML-style open-set adaptation
harness.

The top-level names mirror the reference package surface
(effdet/a__init__.py): ``create_model``, ``DetBenchPredict`` /
``DetBenchTrain`` / ``unwrap_bench``, ``EfficientDet``,
``create_dataset`` / ``create_loader`` / ``create_parser``,
``create_evaluator`` + evaluator classes, and the config getters.
They resolve lazily (PEP 562) so ``import ood_object_detection_tpu``
stays cheap — jax/flax load only when a model-path name is touched.
"""

__version__ = "0.2.0"

from . import config, ops  # light imports (jax-free at module scope)

_LAZY = {
    # model / bench / factory
    "EfficientDet": ("ood_object_detection_tpu.models", "EfficientDet"),
    "DetBenchPredict": ("ood_object_detection_tpu.bench", "DetBenchPredict"),
    "DetBenchTrain": ("ood_object_detection_tpu.bench", "DetBenchTrain"),
    "unwrap_bench": ("ood_object_detection_tpu.bench", "unwrap_bench"),
    "create_model": ("ood_object_detection_tpu.factory", "create_model"),
    "create_model_from_config":
        ("ood_object_detection_tpu.factory", "create_model_from_config"),
    # data
    "create_dataset": ("ood_object_detection_tpu.data", "create_dataset"),
    "create_loader": ("ood_object_detection_tpu.data", "create_loader"),
    "create_parser": ("ood_object_detection_tpu.data", "create_parser"),
    "DetectionDataset":
        ("ood_object_detection_tpu.data", "DetectionDataset"),
    "SkipSubset": ("ood_object_detection_tpu.data", "SkipSubset"),
    # evaluation
    "create_evaluator":
        ("ood_object_detection_tpu.evaluation", "create_evaluator"),
    "CocoEvaluator": ("ood_object_detection_tpu.evaluation", "CocoEvaluator"),
    "PascalEvaluator":
        ("ood_object_detection_tpu.evaluation", "PascalEvaluator"),
    "OpenImagesEvaluator":
        ("ood_object_detection_tpu.evaluation", "OpenImagesEvaluator"),
    # config
    "get_efficientdet_config":
        ("ood_object_detection_tpu.config", "get_efficientdet_config"),
    "default_detection_model_configs":
        ("ood_object_detection_tpu.config", "default_detection_model_configs"),
    # checkpoint helpers (reference load_checkpoint / load_pretrained)
    "load_pytorch_checkpoint":
        ("ood_object_detection_tpu.utils.checkpoint_convert",
         "load_pytorch_checkpoint"),
    # serving export (self-contained StableHLO artifacts, jax.export)
    "export_predict": ("ood_object_detection_tpu.export", "export_predict"),
    "save_artifact": ("ood_object_detection_tpu.export", "save_artifact"),
    "load_artifact": ("ood_object_detection_tpu.export", "load_artifact"),
}


def __getattr__(name):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}")
    import importlib
    mod = importlib.import_module(target[0])
    value = getattr(mod, target[1])
    globals()[name] = value        # cache for next access
    return value


def __dir__():
    return sorted(list(globals()) + list(_LAZY))


__all__ = ["config", "ops", "__version__", *_LAZY]
