"""SPMD tests on the 8-device virtual CPU mesh (conftest forces it).

Covers the reference's distributed semantics (effdet/distributed.py +
DistributedSampler DDP training) in their TPU-native form: the sharded
train step must compute the same loss/grads as the single-device step,
and the collective helpers in parallel/mesh.py must merge shards exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ood_object_detection_tpu.config import (
    default_detection_train_config,
    get_efficientdet_config,
)
from ood_object_detection_tpu.models import EfficientDet
from ood_object_detection_tpu.ops.anchors import Anchors
from ood_object_detection_tpu.parallel import (
    all_gather_detections,
    create_mesh,
    data_sharding,
    reduce_dict,
    shard_batch,
    shared_random_seed,
)
from ood_object_detection_tpu.train import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh")


def _tiny_setup():
    cfg = get_efficientdet_config("efficientdet_d0", num_classes=4).replace(
        image_size=(128, 128), fpn_cell_repeats=1, box_class_repeats=1)
    tcfg = default_detection_train_config()
    model = EfficientDet(cfg)
    anchors = Anchors.from_config(cfg)
    state, tx = create_train_state(model, tcfg, jax.random.key(0))
    r = np.random.default_rng(7)
    batch = {
        "image": r.normal(0, 1, (8, 128, 128, 3)).astype(np.float32),
        "bbox": np.tile(
            np.array([[12.0, 8.0, 70.0, 66.0]] + [[0.0, 0.0, 0.0, 0.0]] * 7,
                     np.float32), (8, 1, 1)),
        "cls": np.tile(np.array([1] + [-1] * 7, np.int32), (8, 1)),
    }
    return model, tx, anchors, tcfg, state, batch


@pytest.fixture(scope="module")
def spmd():
    """Tiny model + the single-device step result all mesh tests compare to."""
    model, tx, anchors, tcfg, state, batch = _tiny_setup()
    step1 = make_train_step(model, tx, anchors, tcfg, mesh=None, donate=False)
    new_state, metrics = step1(state, batch)
    ref = {k: float(v) for k, v in metrics.items()}
    ref_params = jax.tree.map(np.asarray, new_state.params)
    return dict(model=model, tx=tx, anchors=anchors, tcfg=tcfg, state=state,
                batch=batch, ref_metrics=ref, ref_params=ref_params)


def _assert_matches_single_device(spmd, mesh, spatial_axis):
    step = make_train_step(spmd["model"], spmd["tx"], spmd["anchors"],
                           spmd["tcfg"], mesh=mesh, donate=False,
                           spatial_axis=spatial_axis)
    new_state, metrics = step(spmd["state"], spmd["batch"])
    ref = spmd["ref_metrics"]
    for k in ("loss", "class_loss", "box_loss", "grad_norm"):
        np.testing.assert_allclose(float(metrics[k]), ref[k], rtol=2e-4,
                                   err_msg=k)
    assert float(metrics["num_positives"]) == ref["num_positives"]
    # updated params identical too (the DDP-equivalence guarantee)
    flat_new = jax.tree.leaves(jax.tree.map(np.asarray, new_state.params))
    flat_ref = jax.tree.leaves(spmd["ref_params"])
    for a, b in zip(flat_new, flat_ref):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)


def test_train_step_8way_data_parallel(spmd):
    mesh = create_mesh((8,), ("data",))
    _assert_matches_single_device(spmd, mesh, spatial_axis=None)


def test_train_step_4x2_data_spatial(spmd):
    mesh = create_mesh((4, 2), ("data", "spatial"))
    _assert_matches_single_device(spmd, mesh, spatial_axis="spatial")


def test_create_mesh_infers_remaining():
    mesh = create_mesh((-1, 2), ("data", "spatial"))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "spatial")


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh((8,), ("data",))
    batch = {"image": np.zeros((16, 4, 4, 3), np.float32),
             "cls": np.zeros((16, 5), np.int32)}
    placed = shard_batch(mesh, batch)
    for v in placed.values():
        assert v.sharding == data_sharding(mesh)
        # each device holds B/8 rows
        assert v.addressable_shards[0].data.shape[0] == 2


def test_all_gather_detections_merges_shards():
    mesh = create_mesh((8,), ("data",))
    dets = np.arange(8 * 2 * 3 * 6, dtype=np.float32).reshape(16, 3, 6)

    @jax.jit
    def gather(d):
        return jax.shard_map(
            lambda x: all_gather_detections(x, "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P(),
            check_vma=False)(d)

    out = np.asarray(gather(jax.device_put(dets, data_sharding(mesh))))
    # tiled all-gather over the batch axis reassembles the global batch
    np.testing.assert_array_equal(out, dets)


def test_reduce_dict_averages_across_mesh():
    mesh = create_mesh((8,), ("data",))
    per_shard = np.arange(8, dtype=np.float32)  # shard i holds value i

    @jax.jit
    def reduce(x):
        return jax.shard_map(
            lambda v: reduce_dict({"m": v[0]}, "data", average=True),
            mesh=mesh, in_specs=P("data"), out_specs=P())(x)

    out = reduce(jax.device_put(per_shard, data_sharding(mesh)))
    np.testing.assert_allclose(float(out["m"]), per_shard.mean(), rtol=1e-6)

    @jax.jit
    def reduce_sum(x):
        return jax.shard_map(
            lambda v: reduce_dict({"m": v[0]}, "data", average=False),
            mesh=mesh, in_specs=P("data"), out_specs=P())(x)

    out = reduce_sum(jax.device_put(per_shard, data_sharding(mesh)))
    np.testing.assert_allclose(float(out["m"]), per_shard.sum(), rtol=1e-6)


def test_shared_random_seed_deterministic_broadcast():
    base = jax.random.key(123)
    k1 = shared_random_seed(base)
    k2 = shared_random_seed(base)
    np.testing.assert_array_equal(jax.random.key_data(k1),
                                  jax.random.key_data(k2))
    # and it is actually usable as a key
    v = jax.random.uniform(k1, (3,))
    assert v.shape == (3,)


def test_sharded_predict_matches_single_device(rng):
    """DetBenchPredict.sharded: data-parallel shard_map predict on the
    8-device virtual mesh == the unsharded predict (per-device Pallas/
    interpret NMS on local shards, params replicated, no collectives)."""
    import jax.numpy as jnp

    from ood_object_detection_tpu.factory import create_model
    from ood_object_detection_tpu.parallel import create_mesh

    bench, variables = create_model(
        "efficientdet_d0", bench_task="predict", num_classes=5,
        image_size=(128, 128), ood_method="energy")
    mesh = create_mesh((8,), ("data",))
    x = rng.uniform(0, 1, (8, 128, 128, 3)).astype(np.float32)

    dets_ref, ood_ref = bench.forward_with_ood(variables, jnp.asarray(x))
    step = bench.sharded(mesh)
    dets_sh, ood_sh = step(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(dets_sh), np.asarray(dets_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ood_sh), np.asarray(ood_ref),
                               rtol=1e-4, atol=1e-4)
