from .anchors import Anchors, generate_anchor_boxes, get_feat_sizes
from .box_coder import decode_box_outputs, decode_boxes, encode_boxes
from .boxes import (
    clip_boxes_xyxy,
    clip_boxes_yxyx,
    pairwise_iou_xyxy,
    pairwise_iou_yxyx,
    xyxy_to_yxyx,
    yxyx_to_xyxy,
)
from .losses import (
    DetectionLoss,
    box_only_loss_flat,
    class_loss_flat,
    cosine_loss,
    detection_loss_flat,
    detection_loss_levels,
    focal_loss_legacy,
    huber_loss,
    l2_loss,
    levels_to_flat,
    new_focal_loss,
    one_hot,
    smooth_l1_loss,
)
from .nms import batched_nms, batched_soft_nms, nms_fixed, soft_nms_fixed
from .ood import energy_score, max_logit_score, msp_score, ood_score
from .post_process import batch_detection, generate_detections, post_process
from .target_assigner import (
    AnchorLabeler,
    LabelResult,
    argmax_match,
    batch_label_anchors,
    label_anchors,
)
from .pallas_nms import pallas_batched_nms
