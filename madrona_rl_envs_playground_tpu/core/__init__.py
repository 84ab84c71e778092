from . import rng
from .batch import Simulator, batched_reset, batched_step
from .types import BatchState, StepOutput

__all__ = ["rng", "Simulator", "batched_reset", "batched_step", "BatchState", "StepOutput"]
