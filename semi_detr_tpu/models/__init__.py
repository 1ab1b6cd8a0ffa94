from .attention import LegacyMultiheadAttention
from .dino_head import DinoConfig, DINODetector
from .ssod import Projector, SsodConfig

__all__ = ["DinoConfig", "DINODetector", "LegacyMultiheadAttention",
           "Projector", "SsodConfig"]
