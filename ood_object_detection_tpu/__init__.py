"""ood_object_detection_tpu: TPU-native open-set / OOD object detection.

A from-scratch JAX / XLA / Pallas re-design of the capability surface of
DavidPetrus/ood_object_detection (an EfficientDet-based open-set detector):
EfficientNet backbones + BiFPN + class/box heads, on-device anchor labeling,
fused fixed-shape post-processing with hard/soft NMS and OOD scoring, SPMD
data-parallel training, and an episodic MAML-style open-set adaptation
harness.
"""

__version__ = "0.1.0"

from . import config, ops

__all__ = ["config", "ops", "__version__"]
