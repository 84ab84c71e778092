"""Vector multi-agent API — the PantheonRL-extension layer, on-device."""

from .agents import RandomVectorAgent, VectorAgent
from .asyncvectorenv import AsyncVectorEnv
from .gym_interop import BalanceVecGym, CartpoleVecGym
from .spaces import Box, Discrete, MultiBinary, MultiDiscrete
from .vectorenv import PlayerException, SyncVectorEnv, TpuVecEnv, VectorMultiAgentEnv
from .vectorobservation import VectorObservation

__all__ = [
    "BalanceVecGym",
    "CartpoleVecGym",
    "AsyncVectorEnv",
    "RandomVectorAgent",
    "VectorAgent",
    "Box",
    "Discrete",
    "MultiBinary",
    "MultiDiscrete",
    "PlayerException",
    "SyncVectorEnv",
    "TpuVecEnv",
    "VectorMultiAgentEnv",
    "VectorObservation",
]
