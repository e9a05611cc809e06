from emr2a_tpu.training.sharding_rules import param_shardings
from emr2a_tpu.training.clip_trainer import (
    ContrastiveTrainer,
    clip_contrastive_loss,
)

__all__ = ["param_shardings", "ContrastiveTrainer", "clip_contrastive_loss"]
