from .common import ConvBlock, Conv3x3, ResidualConvUnit
from .resnet import ResnetEncoder
from .depth_decoder import DepthDecoder
from .pose import PoseDecoder, PoseCNN
from .attention import AttentionConv, AttentionStem, ResidualAttentionUnit
from .attention_resnet import (
    ResnetEncoderAttention,
    AttentionResNet,
    AttentionResNet18,
    AttentionResNet26,
    AttentionResNet38,
    AttentionResNet50,
)
from .fusion import (
    FeatureFusionBlock,
    FeatureFusionBlock_v2,
    FeatureFusionBlock_v3,
    UpscalePS,
    Fusion,
    Fusion_v3,
    GRUFusionBlock,
    GRUFusionBlock_v2,
)
from .recurrent import (
    ConvGRUCell,
    ConvLSTMCell,
    ConvGRUBlocks,
    Head,
    make_gru,
    GRU_HIDDEN_SPECS,
)
from .dpt import DPTDepthModel, get_mean_attention_map
