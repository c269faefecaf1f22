from .backbone import (
    BACKBONE_DEFS,
    BackboneDef,
    BlockSpec,
    GenericBackbone,
    ResNetBackbone,
    create_backbone,
    round_channels,
)
from .bifpn import BiFpn, BiFpnLayer, Fnode, FpnCombine
from .anchor_net import AnchorNet
from .efficientdet import EfficientDet
from .heads import HeadNet
from .layers import (
    ConvBnAct,
    ResampleFeatureMap,
    SeparableConv,
    SqueezeExcite,
    get_act,
    interpolate,
)
