"""Training algorithms: CleanRL-style PPO agent, fused self-play PPO, MAPPO."""

from .cleanrl_ppo import CleanPPOAgent, active_masked_gae
from .selfplay import SelfPlayConfig, SelfPlayPPO, credit_rewards

__all__ = [
    "CleanPPOAgent",
    "active_masked_gae",
    "SelfPlayConfig",
    "SelfPlayPPO",
    "credit_rewards",
]
