"""MAPPO configuration (reference ``train/config.py`` defaults).

One dataclass instead of the reference's ~75-flag argparse namespace; the
``get_config()`` helper exposes the same flag names on an argparse parser for
CLI parity.  Defaults follow the reference exactly (e.g. ``use_valuenorm``
True / ``use_popart`` False, ppo_epoch 15, max_grad_norm 10.0, huber 10.0,
hidden 512 x layer_N 2 + ReLU + feature-layernorm, lr = critic_lr = 5e-4).
"""

from __future__ import annotations

import argparse
import dataclasses

from ...models.mappo_nets import ModelConfig


@dataclasses.dataclass(frozen=True)
class MAPPOConfig:
    # rollout
    episode_length: int = 200
    n_rollout_threads: int = 1
    num_env_steps: float = 10e6
    # network
    hidden_size: int = 512
    layer_N: int = 2
    use_ReLU: bool = True
    use_orthogonal: bool = True
    use_feature_normalization: bool = True
    gain: float = 0.01
    use_naive_recurrent_policy: bool = False
    use_recurrent_policy: bool = False
    recurrent_N: int = 1
    data_chunk_length: int = 10
    # Feed grid-shaped [W, H, C] observations so the policy base resolves to
    # CNNBase (reference train/MAPPO/utils/cnn.py — there the selection is
    # implicit from a 3-D obs space; here the envs expose flat obs so the
    # reshape is flag-gated).  Only the overcooked family carries a grid
    # factorization (env.width/height/num_channels).
    use_cnn_obs: bool = False
    # optimizer
    lr: float = 5e-4
    critic_lr: float = 5e-4
    opti_eps: float = 1e-5
    weight_decay: float = 0.0
    use_linear_lr_decay: bool = False
    # ppo
    ppo_epoch: int = 15
    clip_param: float = 0.2
    num_mini_batch: int = 1
    # Mesh-friendly minibatching for num_mini_batch>1 (feed-forward):
    # instead of the reference's random FLAT permutation over T*M (which
    # merges the sharded env axis and all-gathers the whole buffer to every
    # device each epoch — ~1.2 GB/update at Colab scale,
    # docs/multihost_projection.md), draw minibatches as randomly-permuted
    # TIMESTEP bands: each minibatch is [T/nmb, M, ...] with the env axis
    # intact, so GSPMD keeps the buffers sharded and the only collectives
    # are the gradient all-reduces.  Default OFF to preserve the
    # reference's exact sampling semantics; requires episode_length %
    # num_mini_batch == 0.
    shard_local_minibatch: bool = False
    entropy_coef: float = 0.01
    value_loss_coef: float = 1.0
    use_max_grad_norm: bool = True
    max_grad_norm: float = 10.0
    use_gae: bool = True
    gamma: float = 0.99
    gae_lambda: float = 0.95
    use_proper_time_limits: bool = False
    use_huber_loss: bool = True
    huber_delta: float = 10.0
    use_clipped_value_loss: bool = True
    use_popart: bool = False
    use_valuenorm: bool = True
    use_value_active_masks: bool = True
    use_policy_active_masks: bool = True
    # run
    seed: int = 1
    save_interval: int = 1
    log_interval: int = 5
    # eval (reference train/config.py --use_eval/--eval_interval/
    # --eval_episodes/--n_eval_rollout_threads): periodic deterministic
    # evaluation during training via runner.evaluate (the fused-scan
    # tester).  eval_episodes is a TOTAL episode budget spread over the
    # training envs (>= 1 scan episode).
    use_eval: bool = False
    eval_interval: int = 25
    eval_episodes: int = 32
    n_eval_rollout_threads: int = 1
    # render (reference --use_render/--render_episodes/--save_gifs/--ifi/
    # --n_render_rollout_threads): after training, export a browser replay
    # (utils/demo_export.py play/replay HTML for the overcooked family, a
    # trajectory JSON elsewhere) instead of the reference's gif pipeline.
    use_render: bool = False
    render_episodes: int = 5
    save_gifs: bool = False
    ifi: float = 0.1
    n_render_rollout_threads: int = 1
    # rollout collection backend: "auto" steps the fused Pallas megakernel
    # on TPU where the env has one (train/fused_collect.py), jnp elsewhere;
    # "pallas"/"jnp" force.  Trajectories are bit-identical either way.
    rollout_backend: str = "auto"

    def model_config(self) -> ModelConfig:
        return ModelConfig(
            hidden_size=self.hidden_size,
            layer_N=self.layer_N,
            use_relu=self.use_ReLU,
            use_orthogonal=self.use_orthogonal,
            use_feature_normalization=self.use_feature_normalization,
            gain=self.gain,
            use_recurrent_policy=(
                self.use_recurrent_policy or self.use_naive_recurrent_policy
            ),
            recurrent_N=self.recurrent_N,
            use_popart=self.use_popart,
        )


def get_config() -> argparse.ArgumentParser:
    """Argparse mirror of the reference ``train/config.py:get_config``."""
    p = argparse.ArgumentParser(description="MAPPO (TPU-native)")
    for f in dataclasses.fields(MAPPOConfig):
        name = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool):
            if f.default:
                p.add_argument(name, dest=f.name, action="store_false")
            else:
                p.add_argument(name, dest=f.name, action="store_true")
            p.set_defaults(**{f.name: f.default})
        else:
            p.add_argument(name, type=type(f.default), default=f.default)
    # env selection flags from the reference trainer surface
    p.add_argument("--env_name", type=str, default="overcooked")
    p.add_argument("--over_layout", type=str, default="simple")
    p.add_argument("--run_dir", type=str, default="runs/mappo")
    p.add_argument("--model_dir", type=str, default=None)
    return p


def config_from_args(args) -> MAPPOConfig:
    kw = {f.name: getattr(args, f.name) for f in dataclasses.fields(MAPPOConfig)}
    return MAPPOConfig(**kw)
