import pytest

from ood_object_detection_tpu.config import (
    bifpn_graph,
    efficientdet_model_param_dict,
    get_efficientdet_config,
    get_fpn_config,
    pan_graph,
    qufpn_graph,
)


def test_zoo_has_all_reference_models():
    expected = {
        "efficientdet_d0", "efficientdet_d1", "efficientdet_d2",
        "efficientdet_d3", "efficientdet_d4", "efficientdet_d5",
        "resdet50", "cspresdet50", "cspresdext50", "cspresdext50pan",
        "cspdarkdet53", "mixdet_m", "mixdet_l", "mobiledetv2_110d",
        "mobiledetv2_120d", "mobiledetv3_large", "efficientdet_q0",
        "efficientdet_q1", "efficientdet_q2", "efficientdet_w0",
        "efficientdet_es", "efficientdet_em", "efficientdet_lite0",
        "tf_efficientdet_d0", "tf_efficientdet_d1", "tf_efficientdet_d2",
        "tf_efficientdet_d3", "tf_efficientdet_d4", "tf_efficientdet_d5",
        "tf_efficientdet_d6", "tf_efficientdet_d7", "tf_efficientdet_d7x",
        "tf_efficientdet_lite0", "tf_efficientdet_lite1",
        "tf_efficientdet_lite2", "tf_efficientdet_lite3",
        "tf_efficientdet_lite4",
    }
    assert expected <= set(efficientdet_model_param_dict.keys())


def test_d0_config_values():
    cfg = get_efficientdet_config("efficientdet_d0")
    assert cfg.image_size == (512, 512)
    assert cfg.fpn_channels == 64
    assert cfg.fpn_cell_repeats == 3
    assert cfg.box_class_repeats == 3
    assert cfg.pad_type == ""
    assert not cfg.redundant_bias
    assert cfg.num_levels == 5
    assert cfg.num_anchors_per_location == 9


def test_d7x_max_level():
    cfg = get_efficientdet_config("tf_efficientdet_d7x")
    assert cfg.max_level == 8
    assert cfg.num_levels == 6
    assert cfg.fpn_name == "bifpn_sum"


def test_overrides():
    cfg = get_efficientdet_config("efficientdet_d0", num_classes=20)
    assert cfg.num_classes == 20
    cfg2 = cfg.replace(image_size=(256, 256))
    assert cfg2.image_size == (256, 256)
    assert cfg.image_size == (512, 512)  # original untouched


def test_bifpn_graph_p3p7():
    """BiFPN P3-P7 has 8 combine nodes: 4 top-down then 4 bottom-up."""
    g = bifpn_graph(3, 7)
    assert len(g.nodes) == 8
    # top-down: levels 6,5,4,3
    assert [n.reduction for n in g.nodes[:4]] == [64, 32, 16, 8]
    # bottom-up: levels 4,5,6,7
    assert [n.reduction for n in g.nodes[4:]] == [16, 32, 64, 128]
    # node 0 (P6 td) consumes backbone P6 (id 3) and P7 (id 4)
    assert g.nodes[0].inputs_offsets == (3, 4)
    # node 3 (P3 td) consumes backbone P3 (id 0) and P4-td (id 7)
    assert g.nodes[3].inputs_offsets == (0, 7)
    # node 4 (P4 bu) consumes backbone P4, P4-td, and P3-td
    assert g.nodes[4].inputs_offsets == (1, 7, 8)
    # final node (P7 bu) consumes backbone P7 and P6-bu
    assert g.nodes[-1].inputs_offsets == (4, 11)


def test_pan_and_qufpn_node_counts():
    assert len(pan_graph(3, 7).nodes) == 10      # 5 td + 5 bu
    assert len(qufpn_graph(3, 7).nodes) == 21    # 4+4+5+4+... quad layout


def test_get_fpn_config_names():
    for name in ["bifpn_sum", "bifpn_attn", "bifpn_fa", "pan_sum", "pan_fa",
                 "qufpn_sum", "qufpn_fa"]:
        g = get_fpn_config(name)
        assert len(g.nodes) > 0
    assert get_fpn_config(None).nodes == bifpn_graph(3, 7).nodes


def test_qufpn_last_nodes_increasing_reduction():
    g = qufpn_graph(3, 7)
    quad = g.nodes[-5:]
    assert [n.reduction for n in quad] == [8, 16, 32, 64, 128]


@pytest.mark.parametrize("name", ["efficientdet_d0", "tf_efficientdet_d4"])
def test_config_hashable_fields(name):
    cfg = get_efficientdet_config(name)
    hash(cfg.aspect_ratios)
    hash(cfg.image_size)


def test_top_level_api_surface():
    """Top-level package mirrors the reference exports
    (effdet/a__init__.py) via lazy PEP 562 resolution."""
    import ood_object_detection_tpu as pkg
    for name in ("EfficientDet", "DetBenchPredict", "DetBenchTrain",
                 "unwrap_bench", "create_model", "create_dataset",
                 "create_loader", "create_parser", "create_evaluator",
                 "get_efficientdet_config", "load_pytorch_checkpoint"):
        assert callable(getattr(pkg, name)), name
    assert "create_model" in dir(pkg)
