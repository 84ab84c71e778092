"""MAPPO stack: config, buffer, policy, trainer (R_MAPPO), runner (MainPlayer)."""

from .buffer import (
    MAPPOBuffer,
    after_update,
    chooseinsert,
    compute_returns,
    init_buffer,
    insert,
)
from .config import MAPPOConfig, config_from_args, get_config
from .policy import MAPPOPolicy, PolicyState
from .runner import MAPPORunner
from .trainer import RMAPPOTrainer, TrainerState
from .valuenorm import (
    ValueNormState,
    init_valuenorm,
    popart_update,
    vn_denormalize,
    vn_normalize,
    vn_update,
)

__all__ = [
    "MAPPOBuffer",
    "after_update",
    "chooseinsert",
    "compute_returns",
    "init_buffer",
    "insert",
    "MAPPOConfig",
    "config_from_args",
    "get_config",
    "MAPPOPolicy",
    "PolicyState",
    "MAPPORunner",
    "RMAPPOTrainer",
    "TrainerState",
    "ValueNormState",
    "init_valuenorm",
    "popart_update",
    "vn_denormalize",
    "vn_normalize",
    "vn_update",
]
