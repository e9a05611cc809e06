"""Configuration dataclasses.

Same public surface as the reference's ``config/`` package
(``/root/reference/config/base_config.py:6``, ``encoder_config.py:6``,
``llm_config.py:6``), extended with TPU-specific knobs (mesh shape,
dtype policy) that the reference — single-GPU torch — has no equivalent
for.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple


@dataclass
class BaseConfig:
    """Project-wide paths, seed and the bilingual disease-label maps.

    Reference parity: config/base_config.py:6-30.  ``device`` is kept for
    CLI compatibility but means a JAX platform name here.
    """

    project_root: Path = field(default_factory=lambda: Path("."))
    data_root: Path = field(default_factory=lambda: Path("./data"))
    output_dir: Path = field(default_factory=lambda: Path("./outputs"))
    features_dir: Path = field(default_factory=lambda: Path("./outputs/features"))
    logs_dir: Path = field(default_factory=lambda: Path("./outputs/logs"))
    models_dir: Path = field(default_factory=lambda: Path("./outputs/models"))
    results_dir: Path = field(default_factory=lambda: Path("./outputs/results"))
    device: str = "tpu"
    seed: int = 42

    # 4-class pneumonia subtyping: directory name -> Chinese display label.
    disease_labels: Dict[str, str] = field(default_factory=lambda: {
        "bing_du_xing_fei_yan": "病毒性肺炎",
        "正常胸部CT图像": "正常",
        "PJP": "PJP肺炎",
        "细菌性": "细菌性肺炎",
    })

    # Inverse map: display label -> directory name.
    label_dir_map: Dict[str, str] = field(default_factory=lambda: {
        "病毒性肺炎": "bing_du_xing_fei_yan",
        "正常": "正常胸部CT图像",
        "PJP肺炎": "PJP",
        "细菌性肺炎": "细菌性",
    })


@dataclass
class MeshConfig:
    """TPU device-mesh layout (net-new vs the reference; SURVEY.md §2.2).

    ``data`` shards batches (slices at embed time, the case DB at
    retrieval time); ``model`` shards large towers (Qwen3-VL 8B).
    """

    axis_names: Tuple[str, ...] = ("data", "model")
    # -1 means "all remaining devices on this axis".
    mesh_shape: Tuple[int, ...] = (-1, 1)
    # Dtype policy: params/computation bf16 on the MXU, accumulation f32.
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"
    accum_dtype: str = "float32"


@dataclass
class EncoderConfig:
    """Encoder selection and slice-sampling knobs.

    Reference parity: config/encoder_config.py:6-44.
    """

    encoder_type: str = "qwen3_vl_8b"

    model_path: Optional[Path] = None
    model_name: Optional[str] = None

    sample_n: int = 4
    sample_mode: str = "even"
    variance_size: int = 64

    text_mode: str = "hybrid"

    target_layers: List[int] = field(default_factory=lambda: [-3, -2, -1])

    # TPU additions: batch size fed to the jitted forward and the mesh.
    batch_size: int = 256
    mesh: MeshConfig = field(default_factory=MeshConfig)

    qwen3_vl_8b_config: dict = field(default_factory=lambda: {"model_path": None})
    qwen3_vl_2b_config: dict = field(default_factory=lambda: {"model_path": None})
    vit_config: dict = field(default_factory=lambda: {
        "model_name": "vit_base_patch16_224",
        "model_path": None,
    })
    biomedclip_config: dict = field(default_factory=lambda: {"model_path": None})
    clip_config: dict = field(default_factory=lambda: {"model_path": None})
    dino_config: dict = field(default_factory=lambda: {"model_path": None})


@dataclass
class LLMConfig:
    """VLM/LLM generation knobs. Reference parity: config/llm_config.py:6-39."""

    llm_type: str = "qwen3_vl_8b_thinking"

    model_path: Optional[Path] = None

    max_new_tokens: int = 512
    temperature: float = 0.2
    top_p: float = 0.9

    mesh: MeshConfig = field(default_factory=MeshConfig)

    qwen3_vl_8b_thinking_config: dict = field(default_factory=lambda: {"model_path": None})
    qwen3_vl_2b_thinking_config: dict = field(default_factory=lambda: {"model_path": None})
    openai_config: dict = field(default_factory=lambda: {
        "api_key": None,
        "model": "gpt-4-vision-preview",
    })
    biomedclip_config: dict = field(default_factory=lambda: {"model_path": None})
    clip_config: dict = field(default_factory=lambda: {"model_path": None})
    dino_config: dict = field(default_factory=lambda: {"model_path": None})
