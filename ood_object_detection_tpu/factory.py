"""Model factory: name -> (bench|model, initialized variables).

Equivalent of reference create_model / create_model_from_config
(effdet/factory.py:7-54) plus checkpoint loading (effdet/helpers.py:14-23,
here via orbax — see train.checkpoint).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .bench import DetBenchPredict, DetBenchTrain
from .config.model_config import get_efficientdet_config
from .models.efficientdet import EfficientDet


def create_model(
        model_name: str = "tf_efficientdet_d1",
        bench_task: str = "",
        num_classes: Optional[int] = None,
        pretrained: bool = False,
        checkpoint_path: str = "",
        checkpoint_ema: bool = False,
        seed: int = 0,
        init_batch_size: int = 1,
        ood_method: Optional[str] = None,
        **config_overrides):
    """Build + initialize a model (optionally wrapped in a bench).

    Returns (bench_or_model, variables). ``bench_task`` in
    {'', 'train', 'predict'}; config_overrides go into the model config
    (reference config_kwargs tuple, factory.py:26). With
    ``pretrained=True`` and no checkpoint_path, the published release
    weights for model_name are downloaded + converted
    (reference load_pretrained, helpers.py:14-23). ``checkpoint_ema``
    selects EMA weights from torch checkpoints, like the reference's
    use_ema switch (factory.py:46-47).
    """
    config = get_efficientdet_config(model_name)
    if num_classes is not None:
        config = config.replace(num_classes=num_classes)
    if config_overrides:
        config = config.replace(**config_overrides)
    if pretrained and not checkpoint_path:
        from .utils.pretrained import download_checkpoint
        checkpoint_path = download_checkpoint(model_name)
    return create_model_from_config(
        config, bench_task=bench_task, checkpoint_path=checkpoint_path,
        checkpoint_ema=checkpoint_ema, seed=seed,
        init_batch_size=init_batch_size, ood_method=ood_method)


def create_model_from_config(
        config,
        bench_task: str = "",
        checkpoint_path: str = "",
        checkpoint_ema: bool = False,
        seed: int = 0,
        init_batch_size: int = 1,
        ood_method: Optional[str] = None):
    model = EfficientDet(config)
    h, w = config.image_size
    dummy = jnp.zeros((init_batch_size, h, w, 3), jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, dummy, training=False))(jax.random.key(seed))

    if checkpoint_path:
        if checkpoint_path.endswith((".pth", ".pt")):
            # reference-format torch checkpoint (helpers.py:14-23 capability)
            from .utils.checkpoint_convert import load_pytorch_checkpoint
            variables, _ = load_pytorch_checkpoint(
                checkpoint_path, variables, use_ema=checkpoint_ema)
        else:
            from .train.checkpoint import restore_variables
            variables = restore_variables(checkpoint_path, variables)

    if bench_task == "train":
        return DetBenchTrain(model), variables
    if bench_task == "predict":
        return DetBenchPredict(model, ood_method=ood_method), variables
    return model, variables
