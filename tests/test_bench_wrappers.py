import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ood_object_detection_tpu.bench import DetBenchPredict, DetBenchTrain, unwrap_bench
from ood_object_detection_tpu.config import get_efficientdet_config
from ood_object_detection_tpu.factory import create_model
from ood_object_detection_tpu.models import EfficientDet


@pytest.fixture(scope="module")
def tiny():
    bench, variables = create_model(
        "efficientdet_d0", bench_task="train", num_classes=4,
        image_size=(128, 128), fpn_cell_repeats=1, box_class_repeats=1)
    return bench, variables


def test_train_bench_loss_and_detections(tiny):
    bench, variables = tiny
    x = jnp.zeros((2, 128, 128, 3))
    target = {
        "bbox": jnp.asarray(np.tile(
            np.array([[[10, 10, 60, 60]] + [[0, 0, 0, 0]] * 7], np.float32),
            (2, 1, 1))),
        "cls": jnp.asarray(np.tile(np.array([[1] + [-1] * 7], np.int32), (2, 1))),
    }
    out = bench(variables, x, target, training=False, eval_detections=True)
    assert np.isfinite(float(out["loss"]))
    assert out["detections"].shape == (2, 100, 6)


def test_train_bench_precomputed_labels(tiny):
    bench, variables = tiny
    bench2 = DetBenchTrain(bench.model, create_labeler=False)
    A = bench.anchors.total_anchors
    target = {
        "label_cls": jnp.full((2, A), -1, jnp.int32),
        "label_bbox": jnp.zeros((2, A, 4)),
        "label_num_positives": jnp.zeros((2,)),
    }
    out = bench2(variables, jnp.zeros((2, 128, 128, 3)), target,
                 training=False)
    assert np.isfinite(float(out["loss"]))


def test_predict_bench_img_info_rescale(tiny):
    bench, variables = tiny
    pred = DetBenchPredict(bench.model)
    x = jnp.zeros((1, 128, 128, 3))
    d1 = pred(variables, x)
    d2 = pred(variables, x, img_info={
        "img_scale": jnp.asarray([[2.0]]),
        "img_size": jnp.asarray([[1000.0, 1000.0]])})
    v = np.asarray(d1)[0, :, 4] > 0
    if v.any():
        np.testing.assert_allclose(
            np.asarray(d2)[0, v, :4], np.asarray(d1)[0, v, :4] * 2.0,
            rtol=1e-4)


def test_unwrap_bench(tiny):
    bench, _ = tiny
    assert isinstance(unwrap_bench(bench), EfficientDet)
