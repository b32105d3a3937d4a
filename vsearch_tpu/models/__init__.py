"""Model families: BERT backbone, VDR/DPR text encoders, cross-modal
ViT/text encoders."""
from .bert import BertConfig, BertModel
from .vdr import VDREncoder, VDREncoderConfig, VDRModule
from .dpr import DPREncoder, DPREncoderConfig, DPRModule
from .registry import ENCODER_TYPES, CONFIG_TYPES, get_encoder_classes

__all__ = [
    "BertConfig", "BertModel",
    "VDREncoder", "VDREncoderConfig", "VDRModule",
    "DPREncoder", "DPREncoderConfig", "DPRModule",
    "ENCODER_TYPES", "CONFIG_TYPES", "get_encoder_classes",
]
