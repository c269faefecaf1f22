"""Process-level test of the multihost pretrain loop (VERDICT r4 #5).

Two CPU processes join a real jax.distributed cluster and run the REAL
``train.pretrain.main()`` — per-process-sharded loaders, the mesh-sharded
SPMD train step spanning both processes, the count-weighted val-loss merge
(train/pretrain.py finish_val), the distributed evaluator, and the orbax
best-ckpt save (a cross-process collective: a rank-divergent best-val
decision would deadlock here — the reference analog is the rank-0-only
torch.save after an implicit allreduce, pretrain.py:296-298).

Asserts, from the two ranks' JSON metric logs:
* identical merged val loss on both ranks at every val point,
* identical best-ckpt (saved_best) decisions,
* the orbax checkpoint completed (no deadlock, files on disk),
* the two ranks' loader shards were disjoint and covered the dataset
  (reference DistributedSampler split, effdet/data/loader.py:207-214).
"""
import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, sys
rank, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=rank)
assert jax.process_count() == 2

import numpy as np
from ood_object_detection_tpu.train import pretrain

log_file = f"{out_dir}/rank{rank}_metrics.jsonl"
pretrain.main([
    "--exp", "mp_test",
    "--model", "efficientdet_d0",
    "--num-classes", "4",
    "--image-size", "128",
    "--fpn-repeats", "1",
    "--head-repeats", "1",
    "--batch-size", "2",
    "--steps", "4",
    "--val-freq", "2",
    "--val-steps", "2",
    "--log-freq", "1",
    "--workers", "1",
    "--lr", "0.01",
    "--warmup-steps", "2",
    "--data", "synthetic",
    "--eval-map",
    "--checkpoint-dir", f"{out_dir}/ckpt",
    "--per-cat-dir", f"{out_dir}/per_cat_{rank}",
    "--log-file", log_file,
])

# shard disjointness: the same per-process-sharded val loader the driver
# used (make_loaders) must give this rank a disjoint half of the dataset
from ood_object_detection_tpu.data import PrefetchLoader, SyntheticDetectionDataset
val_ds = SyntheticDetectionDataset(num_images=4, image_size=(128, 128),
                                   num_classes=4, seed=1)
loader = PrefetchLoader(val_ds, batch_size=2, shuffle=False, workers=1,
                        drop_last=False, device_put=False,
                        process_index=rank, process_count=2)
shard_ids = sorted(int(i) for b in loader for i in np.asarray(b["img_id"]))

json.dump({"rank": rank, "shard_ids": shard_ids},
          open(f"{out_dir}/rank{rank}_done.json", "w"))
"""


@pytest.mark.slow
def test_two_process_pretrain_val_merge_and_best_ckpt(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ,
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH="/root/repo",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_compilation_cache",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(r), port, str(tmp_path)],
        env=env, cwd="/root/repo",
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for r in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost pretrain hung (collective deadlock?)")
        outs.append((p.returncode, out, err))

    if not all((tmp_path / f"rank{r}_done.json").exists() for r in (0, 1)):
        errs = "\n".join(err for _, _, err in outs)
        if "distributed" in errs.lower() or "initialize" in errs.lower() \
                or "grpc" in errs.lower():
            pytest.skip(f"runtime refused jax.distributed: {errs[-500:]}")
        pytest.fail(f"workers failed:\n{errs[-3000:]}")

    logs = []
    for r in (0, 1):
        with open(tmp_path / f"rank{r}_metrics.jsonl") as f:
            logs.append([json.loads(line) for line in f if line.strip()])

    # identical merged val loss on every rank at every val point
    def val_rows(rows):
        return [(m["step"], m["val_loss"]) for m in rows if "val_loss" in m]
    v0, v1 = val_rows(logs[0]), val_rows(logs[1])
    assert v0, "no val points logged"
    assert v0 == v1, f"per-rank val losses diverged: {v0} vs {v1}"
    # the evaluator (distributed allgather) also agreed
    m0 = [(m["step"], m["val_mAP"]) for m in logs[0] if "val_mAP" in m]
    m1 = [(m["step"], m["val_mAP"]) for m in logs[1] if "val_mAP" in m]
    assert m0 == m1, f"per-rank mAP diverged: {m0} vs {m1}"

    # identical best-ckpt decisions (a divergence here deadlocks the
    # orbax save collective — caught above by the timeout)
    def best_rows(rows):
        return [(m["step"], m["saved_best"]) for m in rows
                if "saved_best" in m]
    assert best_rows(logs[0]) == best_rows(logs[1])
    assert best_rows(logs[0]), "no best-ckpt save happened"

    # orbax checkpoint completed on disk
    ckpts = os.listdir(tmp_path / "ckpt")
    assert ckpts, "no checkpoint written"

    # loader shards disjoint + covering
    done = [json.load(open(tmp_path / f"rank{r}_done.json")) for r in (0, 1)]
    s0, s1 = set(done[0]["shard_ids"]), set(done[1]["shard_ids"])
    assert s0.isdisjoint(s1)
    assert sorted(s0 | s1) == sorted(
        set(done[0]["shard_ids"] + done[1]["shard_ids"]))
    assert len(s0 | s1) == 4
