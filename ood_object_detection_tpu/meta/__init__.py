from .clustering import (
    ClusterResult,
    cluster_pseudo_targets,
    cosine_hinge_loss,
    projection_losses,
    weighted_median,
)
from .config import MetaConfig
from .episode import (
    MetaTrainer,
    make_meta_optimizer,
    maml_episode_detections,
    maml_episode_loss,
    projection_phase_loss,
)
from .inner_loop import (
    init_inner_lrs,
    inner_adapt,
    sgd_fast_update,
    support_pseudo_loss,
)
from .projection import (
    ANCHOR_ENC,
    CELL_ENC,
    LEVEL_ENC,
    ProjectionNet,
    build_anchor_features,
    confidence_topk,
)
