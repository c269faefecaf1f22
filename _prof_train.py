import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import jax, jax.numpy as jnp, numpy as np

from ood_object_detection_tpu.config import (
    default_detection_train_config, get_efficientdet_config)
from ood_object_detection_tpu.models import EfficientDet
from ood_object_detection_tpu.ops.anchors import Anchors
from ood_object_detection_tpu.train import create_train_state, make_train_step

cfg = get_efficientdet_config("efficientdet_d0", num_classes=90).replace(
    compute_dtype="bfloat16")
model = EfficientDet(cfg)
anchors = Anchors.from_config(cfg)
tcfg = default_detection_train_config()
state, tx = create_train_state(model, tcfg, jax.random.key(0))
step = make_train_step(model, tx, anchors, tcfg, donate=False)

bs = 128
h, w = cfg.image_size
rng = np.random.default_rng(0)
m = 16
yx = rng.uniform(0, h - 64, (bs, m, 2)).astype(np.float32)
hw_box = rng.uniform(16, 64, (bs, m, 2)).astype(np.float32)
batch = {
    "image": jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)).astype(np.float32)),
    "bbox": jnp.asarray(np.concatenate([yx, yx + hw_box], -1)),
    "cls": jnp.asarray(rng.integers(1, 90, (bs, m)).astype(np.int32)),
}

ns, metrics = step(state, batch)
jax.block_until_ready(metrics["loss"])

logdir = sys.argv[1]
with jax.profiler.trace(logdir):
    for _ in range(4):
        ns, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
print("trace done", logdir)
