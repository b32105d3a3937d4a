"""Encoder registry: string type -> (config class, encoder class).

Counterpart of reference src/ir/encoder/types.py:8-21.
"""
from .dpr import DPREncoder, DPREncoderConfig
from .vdr import VDREncoder, VDREncoderConfig


def _lazy_crossmodal():
    from .crossmodal_text import VDRTextEncoder, VDRTextEncoderConfig
    from .crossmodal_image import VDRImageEncoder, VDRImageEncoderConfig
    ENCODER_TYPES["vdr_crossmodal_text"] = VDRTextEncoder
    ENCODER_TYPES["vdr_crossmodal_image"] = VDRImageEncoder
    CONFIG_TYPES["vdr_crossmodal_text"] = VDRTextEncoderConfig
    CONFIG_TYPES["vdr_crossmodal_image"] = VDRImageEncoderConfig


ENCODER_TYPES = {
    "vdr": VDREncoder,
    "dpr": DPREncoder,
}

CONFIG_TYPES = {
    "vdr": VDREncoderConfig,
    "dpr": DPREncoderConfig,
}


def get_encoder_classes(type_name: str):
    if type_name not in ENCODER_TYPES and type_name.startswith(
            "vdr_crossmodal"):
        _lazy_crossmodal()
    return CONFIG_TYPES[type_name], ENCODER_TYPES[type_name]
