from .dino_head import DinoConfig, DINODetector
from .ssod import Projector, SsodConfig

__all__ = ["DinoConfig", "DINODetector", "Projector", "SsodConfig"]
