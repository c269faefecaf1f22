"""Training hyperparameter config.

Capability parity with the reference's ``default_detection_train_config``
(effdet/config/train_config.py:4-34) plus the TPU-native additions (SPMD
mesh shape, orbax checkpointing, async eval).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class TrainConfig:
    # optimizer
    opt: str = "momentum"
    lr: float = 0.09
    momentum: float = 0.9
    weight_decay: float = 4e-5
    eps: float = 1e-3

    # schedule
    sched: str = "cosine"
    epochs: int = 300
    warmup_epochs: int = 5
    warmup_lr: float = 1e-4
    min_lr: float = 1e-5
    lr_noise: Optional[Tuple[float, float]] = None

    # regularization / stabilization
    clip_grad_norm: float = 10.0
    ema_decay: float = 0.9998        # moving_average_decay in the reference
    use_ema: bool = True
    # memory: recompute the class focal loss in bwd instead of saving its
    # [B,H,W,A*C]-scale residuals (~1.1 GB at D0@512 bs=128). Measured
    # ~8% slower at that shape (ops/losses.py docstring) — enable only
    # when activation memory, not speed, is the binding constraint.
    remat_cls_loss: bool = False

    # data
    batch_size: int = 32
    max_instances_per_image: int = 100
    workers: int = 4

    # SPMD
    mesh_shape: Tuple[int, ...] = (-1,)     # -1 = all devices on the data axis
    mesh_axis_names: Tuple[str, ...] = ("data",)

    # checkpointing (orbax)
    checkpoint_dir: str = "checkpoints"
    checkpoint_every_steps: int = 1000
    keep_checkpoints: int = 5
    async_checkpoint: bool = True

    # eval
    eval_every_steps: int = 500
    eval_metric: str = "map"

    # logging
    log_every_steps: int = 50


def default_detection_train_config() -> TrainConfig:
    return TrainConfig()
