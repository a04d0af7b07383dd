from .layers import Attention, FeedForward, Transformer, TransformerBlock, drop_path
from .heads import ArcFace, CosFace, DINOHead, SFace, SoftmaxHead, cosface_logits
from .mobilenet import MobileDINO, MobileNetV3, MobileNetV3Backbone
from .partfvit import (
    LandmarkProvider,
    LandmarkRegressor,
    OverlapViT,
    PartFViT,
    PartFViTConfig,
    minmax_rescale_landmarks,
)
from .iresnet import (
    IBasicBlock,
    IResNet,
    PReLU,
    iresnet18,
    iresnet34,
    iresnet50,
    iresnet100,
    iresnet200,
)
from .dino_vit import (
    VisionTransformer,
    interpolate_pos_encoding,
    vit_base,
    vit_small,
    vit_tiny,
)

__all__ = [
    "Attention",
    "FeedForward",
    "Transformer",
    "TransformerBlock",
    "drop_path",
    "ArcFace",
    "CosFace",
    "DINOHead",
    "SFace",
    "SoftmaxHead",
    "cosface_logits",
    "MobileDINO",
    "MobileNetV3",
    "MobileNetV3Backbone",
    "LandmarkProvider",
    "LandmarkRegressor",
    "OverlapViT",
    "PartFViT",
    "PartFViTConfig",
    "minmax_rescale_landmarks",
    "IBasicBlock",
    "IResNet",
    "PReLU",
    "iresnet18",
    "iresnet34",
    "iresnet50",
    "iresnet100",
    "iresnet200",
    "VisionTransformer",
    "interpolate_pos_encoding",
    "vit_base",
    "vit_small",
    "vit_tiny",
]
