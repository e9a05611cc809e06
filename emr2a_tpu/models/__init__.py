from emr2a_tpu.models.vit import (
    BIOMEDCLIP_VIT_B16,
    CLIP_VIT_B16_VISION,
    CLIP_VIT_L14_336_VISION,
    HF_VIT_B16,
    TIMM_VIT_B16,
    ViTConfig,
    VisionTransformer,
)
from emr2a_tpu.models.text import (
    BertConfig,
    BertEncoder,
    CLIPTextConfig,
    CLIPTextTransformer,
)
from emr2a_tpu.models.clip import (
    BioMedCLIPConfig,
    BioMedCLIPImageTower,
    BioMedCLIPTextTower,
    CLIPConfig,
    CLIPImageTower,
    CLIPTextTower,
)

__all__ = [
    "ViTConfig", "VisionTransformer",
    "CLIP_VIT_B16_VISION", "CLIP_VIT_L14_336_VISION", "HF_VIT_B16",
    "TIMM_VIT_B16", "BIOMEDCLIP_VIT_B16",
    "BertConfig", "BertEncoder", "CLIPTextConfig", "CLIPTextTransformer",
    "CLIPConfig", "CLIPImageTower", "CLIPTextTower",
    "BioMedCLIPConfig", "BioMedCLIPImageTower", "BioMedCLIPTextTower",
]
