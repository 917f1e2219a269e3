from .detector import MaskRCNN, ModelConfig

__all__ = ["MaskRCNN", "ModelConfig"]
