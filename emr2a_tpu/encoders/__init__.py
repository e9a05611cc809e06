from emr2a_tpu.encoders.base import BaseEncoder
from emr2a_tpu.encoders.biomedclip_encoder import BioMedCLIPEncoder, BioMedCLIPLEncoder
from emr2a_tpu.encoders.clip_encoder import CLIPEncoder
from emr2a_tpu.encoders.dino_encoder import DINOEncoder
from emr2a_tpu.encoders.fake import FakeEncoder
from emr2a_tpu.encoders.factory import create_encoder
from emr2a_tpu.encoders.vit_encoder import ViTEncoder

__all__ = [
    "BaseEncoder",
    "BioMedCLIPEncoder",
    "BioMedCLIPLEncoder",
    "CLIPEncoder",
    "DINOEncoder",
    "FakeEncoder",
    "ViTEncoder",
    "create_encoder",
]
