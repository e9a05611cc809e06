from emr2a_tpu.encoders.base import BaseEncoder
from emr2a_tpu.encoders.biomedclip_encoder import BioMedCLIPEncoder, BioMedCLIPLEncoder
from emr2a_tpu.encoders.clip_encoder import CLIPEncoder
from emr2a_tpu.encoders.dino_encoder import DINOEncoder
from emr2a_tpu.encoders.fake import FakeEncoder
from emr2a_tpu.encoders.factory import create_encoder
from emr2a_tpu.encoders.vit_encoder import ViTEncoder


def __getattr__(name):
    # Reference-compatible class names (encoders/__init__.py in the
    # reference); the 2B/8B thinking encoders were byte-identical there
    # and are one configurable class here.  Lazy so importing the
    # package doesn't pull the Qwen stack.
    if name in ("Qwen3VL8BThinkingEncoder", "Qwen3VL2BThinkingEncoder",
                "Qwen3VLEncoder"):
        from emr2a_tpu.encoders.qwen3_vl_encoder import Qwen3VLEncoder
        return Qwen3VLEncoder
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "BaseEncoder",
    "BioMedCLIPEncoder",
    "BioMedCLIPLEncoder",
    "CLIPEncoder",
    "DINOEncoder",
    "FakeEncoder",
    "ViTEncoder",
    "Qwen3VL8BThinkingEncoder",
    "Qwen3VL2BThinkingEncoder",
    "Qwen3VLEncoder",
    "create_encoder",
]
