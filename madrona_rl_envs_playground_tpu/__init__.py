"""TPU-native batch-simulated multi-agent RL framework.

A from-scratch re-expression of the capabilities of the Madrona RL env suite
(Cartpole, Acrobot, Balance Beam, Hanabi, two Overcooked variants + PantheonRL
vector API + CleanRL-PPO/MAPPO training) as pure-JAX lockstep simulators over
struct-of-arrays state, vmapped/pjit-ed across thousands of env instances,
with Pallas kernels for the hot observation-encoding paths.
"""

__version__ = "0.1.0"
