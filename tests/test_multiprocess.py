"""True multi-PROCESS tests of the multihost helpers.

parallel.process_merge / shared_random_seed and Evaluator(distributed=True)
are no-ops in a single process; here two CPU processes join a real
jax.distributed cluster over loopback so the process_allgather /
broadcast_one_to_all branches actually execute (reference analog: the
pickled Gloo gathers in effdet/distributed.py:139-209).

Skips gracefully if the runtime refuses distributed init (sandboxed CI).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, sys
rank, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
import numpy as np
from ood_object_detection_tpu.evaluation import PascalEvaluator
from ood_object_detection_tpu.parallel import (
    is_main_process, process_merge, shared_random_seed)

# process_merge: each rank contributes a rank-stamped array; every rank
# must see both
merged = process_merge({"x": np.full((1, 3), rank, np.float32)})
x = np.asarray(merged["x"])

# shared_random_seed: identical bits on both ranks
key_bits = np.asarray(jax.random.key_data(shared_random_seed()))

# distributed evaluator: each rank adds a DIFFERENT image; the merge must
# bring both into every rank's accumulator
ev = PascalEvaluator(num_classes=2, distributed=True)
det = np.zeros((1, 5, 6), np.float32)
det[0, 0] = [10, 10, 30, 30, 0.9, 1]          # xyxy, matches the GT below
bbox = np.zeros((1, 4, 4), np.float32)
bbox[0, 0] = [10, 10, 30, 30]                  # yxyx
cls = np.zeros((1, 4), np.int32)
cls[0, 0] = 1
ev.add_predictions(det, {"bbox": bbox, "cls": cls,
                         "img_id": np.asarray([100 + rank])})
res = ev.evaluate()

# sharded input pipeline (reference DistributedSampler split,
# effdet/data/loader.py:207-214): each rank must iterate a DISJOINT half
# of the dataset, and the distributed evaluator's merged mAP must cover
# the union of both ranks' shards
from ood_object_detection_tpu.data.dataset import (
    PrefetchLoader, SyntheticDetectionDataset)
ds = SyntheticDetectionDataset(num_images=10, image_size=(64, 64),
                               num_classes=2, max_boxes=2)
loader = PrefetchLoader(ds, batch_size=1, shuffle=False, workers=2,
                        drop_last=False, device_put=False,
                        process_index=rank, process_count=2)
shard_ids = []
ev2 = PascalEvaluator(num_classes=2, distributed=True)
for b in loader:
    shard_ids.extend(int(i) for i in np.asarray(b["img_id"]))
    # perfect detections of EVERY valid GT box (images carry 1-2 boxes;
    # detecting only the first leaves missed GT and mAP < 1)
    bsz, m = b["cls"].shape
    d = np.zeros((bsz, max(5, m), 6), np.float32)
    for j in range(m):
        valid = b["cls"][:, j] > 0
        y0, x0, y1, x1 = b["bbox"][:, j].T
        d[:, j] = np.stack([x0, y0, x1, y1,
                            np.where(valid, 0.9, 0.0),
                            b["cls"][:, j].astype(np.float32)], axis=1)
    ev2.add_predictions(d, {"bbox": b["bbox"], "cls": b["cls"],
                            "img_id": b["img_id"]})
res2 = ev2.evaluate()

json.dump({
    "rank": rank,
    "is_main": bool(is_main_process()),
    "merged_shape": list(x.shape),
    "merged_vals": sorted(float(v) for v in x[:, 0, 0].ravel()),
    "key_bits": [int(v) for v in key_bits.ravel()],
    "eval_images": sorted(int(k) for k in ev._eval._gt),
    "map": float(res["mAP@0.5IOU"]),
    "shard_ids": sorted(shard_ids),
    "shard_eval_images": sorted(int(k) for k in ev2._eval._gt),
    "shard_map": float(res2["mAP@0.5IOU"]),
}, open(out_path, "w"))
"""


@pytest.mark.slow
def test_two_process_allgather_and_distributed_evaluator(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ,
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH="/root/repo",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(r), port,
         str(tmp_path / f"rank{r}.json")],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for r in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers hung")
        outs.append((p.returncode, out, err))

    # the coordination service's shutdown race can exit nonzero after the
    # work is done — the result files are the ground truth
    if not all((tmp_path / f"rank{r}.json").exists() for r in (0, 1)):
        errs = "\n".join(err for _, _, err in outs)
        if "distributed" in errs.lower() or "initialize" in errs.lower() \
                or "grpc" in errs.lower():
            pytest.skip(f"runtime refused jax.distributed: {errs[-500:]}")
        pytest.fail(f"workers failed:\n{errs[-2000:]}")

    results = [json.load(open(tmp_path / f"rank{r}.json")) for r in (0, 1)]
    assert results[0]["is_main"] and not results[1]["is_main"]
    for r in results:
        # allgather stacked both processes' contributions
        assert r["merged_shape"] == [2, 1, 3]
        assert r["merged_vals"] == [0.0, 1.0]
        # both ranks' images merged into each accumulator
        assert r["eval_images"] == [100, 101]
        assert r["map"] == pytest.approx(1.0)
    # identical shared PRNG key on both ranks
    assert results[0]["key_bits"] == results[1]["key_bits"]
    # per-process loader sharding across REAL processes: disjoint halves
    # covering the dataset, and the distributed evaluator's merged mAP
    # covers the union of both ranks' shards
    s0, s1 = set(results[0]["shard_ids"]), set(results[1]["shard_ids"])
    assert s0.isdisjoint(s1), (s0, s1)
    assert len(s0 | s1) == 10
    for r in results:
        assert len(r["shard_eval_images"]) == 10
        assert r["shard_map"] == pytest.approx(1.0)
