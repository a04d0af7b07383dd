from .layers import Attention, FeedForward, Transformer, TransformerBlock, drop_path
from .heads import ArcFace, CosFace, DINOHead, SFace, SoftmaxHead, cosface_logits
from .mobilenet import MobileNetV3, MobileNetV3Backbone
from .partfvit import (
    LandmarkProvider,
    LandmarkRegressor,
    OverlapViT,
    PartFViT,
    PartFViTConfig,
    minmax_rescale_landmarks,
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
    "MobileNetV3",
    "MobileNetV3Backbone",
    "LandmarkProvider",
    "LandmarkRegressor",
    "OverlapViT",
    "PartFViT",
    "PartFViTConfig",
    "minmax_rescale_landmarks",
]
