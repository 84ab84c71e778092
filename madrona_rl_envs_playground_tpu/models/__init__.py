"""Policy/value network families (CleanRL + MAPPO)."""

from .cleanrl import CleanRLNetwork, MLPTower, action_and_value
from .common import dist_entropy, dist_log_prob, dist_sample, masked_categorical_logits
from .mappo_nets import (
    ACTLayer,
    CNNBase,
    MLPBase,
    ModelConfig,
    RNNLayer,
    R_Actor,
    R_Critic,
)

__all__ = [
    "CleanRLNetwork",
    "MLPTower",
    "action_and_value",
    "dist_entropy",
    "dist_log_prob",
    "dist_sample",
    "masked_categorical_logits",
    "ACTLayer",
    "CNNBase",
    "MLPBase",
    "ModelConfig",
    "RNNLayer",
    "R_Actor",
    "R_Critic",
]
