"""MAPPO actor/critic networks (TPU-native flax).

Architecture parity with the reference MAPPO stack:

* ``MLPBase`` — optional feature LayerNorm, then Dense->act->LayerNorm x
  (1 + layer_N) (``train/MAPPO/utils/mlp.py``).
* ``CNNBase`` — one 3x3 VALID conv (hidden/2 ch) -> flatten -> two Dense
  (``train/MAPPO/utils/cnn.py``; input arrives [..., W, H, C]).
* ``RNNLayer`` — ``recurrent_N``-layer GRU whose hidden state is zeroed where
  ``masks==0`` before each step, followed by LayerNorm
  (``train/MAPPO/utils/rnn.py:24-80`` — the reference's segment-wise unroll
  is mathematically the per-step mask-multiply done here, expressed as
  ``lax.scan`` for TPU).
* ``ACTLayer`` — masked categorical head, illegal logits -1e10
  (``train/MAPPO/utils/act.py``, ``utils/distributions.py``; all reference
  envs use Discrete action spaces).
* ``R_Actor`` / ``R_Critic`` — base -> optional RNN -> head
  (``train/MAPPO/r_actor_critic.py:12-165``).

Orthogonal init with ReLU/Tanh gain, zero bias, output gain ``args.gain``
(default 0.01), matching ``utils/util.py::init``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import constant, orthogonal, xavier_uniform

Array = jnp.ndarray

_MASK_NEG = -1e10  # reference train/MAPPO/utils/distributions.py


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Subset of the reference's ``get_config()`` flags that shape networks
    (``train/config.py``): hidden_size, layer_N, use_ReLU, use_orthogonal,
    use_feature_normalization, gain, use_recurrent_policy, recurrent_N,
    use_popart."""

    hidden_size: int = 64
    layer_N: int = 1
    use_relu: bool = True
    use_orthogonal: bool = True
    use_feature_normalization: bool = True
    gain: float = 0.01
    use_recurrent_policy: bool = False
    recurrent_N: int = 1
    use_popart: bool = True


def _act_fn(use_relu: bool):
    return nn.relu if use_relu else nn.tanh


def _gain(use_relu: bool) -> float:
    # torch.nn.init.calculate_gain('relu') = sqrt(2), 'tanh' = 5/3
    return 2.0**0.5 if use_relu else 5.0 / 3.0


def _kernel_init(cfg: ModelConfig, scale: Optional[float] = None):
    if cfg.use_orthogonal:
        return orthogonal(_gain(cfg.use_relu) if scale is None else scale)
    return xavier_uniform()


class MLPBase(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        x = x.astype(jnp.float32)
        if cfg.use_feature_normalization:
            x = nn.LayerNorm()(x)
        act = _act_fn(cfg.use_relu)
        for _ in range(1 + cfg.layer_N):
            x = nn.Dense(
                cfg.hidden_size, kernel_init=_kernel_init(cfg), bias_init=constant(0.0)
            )(x)
            x = nn.LayerNorm()(act(x))
        return x


class CNNBase(nn.Module):
    """Input [..., W, H, C] as the reference feeds it (obs reshaped to
    (W, H, C) then movedim to channels-first for torch; here NHWC native)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        act = _act_fn(cfg.use_relu)
        x = x.astype(jnp.float32)
        x = nn.Conv(
            cfg.hidden_size // 2,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="VALID",
            kernel_init=_kernel_init(cfg),
            bias_init=constant(0.0),
        )(x)
        x = act(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        for _ in range(2):
            x = nn.Dense(
                cfg.hidden_size, kernel_init=_kernel_init(cfg), bias_init=constant(0.0)
            )(x)
            x = act(x)
        return x


class RNNLayer(nn.Module):
    cfg: ModelConfig

    def setup(self):
        self.cells = [
            nn.GRUCell(
                self.cfg.hidden_size,
                kernel_init=_kernel_init(self.cfg, scale=1.0),
                recurrent_kernel_init=orthogonal(1.0),
                bias_init=constant(0.0),
                name=f"gru{i}",
            )
            for i in range(self.cfg.recurrent_N)
        ]
        self.norm = nn.LayerNorm()

    def step(self, x: Array, hxs: Array, masks: Array) -> Tuple[Array, Array]:
        """One timestep. x [N, H]; hxs [N, L, H]; masks [N] (0 resets hidden)."""
        new_h = []
        m = masks.astype(jnp.float32)[:, None]
        for i, cell in enumerate(self.cells):
            h, x = cell(hxs[:, i] * m, x)
            new_h.append(h)
        return self.norm(x), jnp.stack(new_h, axis=1)

    def unroll(self, xs: Array, hxs: Array, masks: Array) -> Tuple[Array, Array]:
        """Sequence form. xs [T, N, H]; hxs [N, L, H]; masks [T, N]."""

        def body(mdl, h, inp):
            x_t, m_t = inp
            out, h = mdl.step(x_t, h, m_t)
            return h, out

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        hxs, outs = scan(self, hxs, (xs, masks))
        return outs, hxs


class ACTLayer(nn.Module):
    cfg: ModelConfig
    num_actions: int

    @nn.compact
    def __call__(self, x: Array, available_actions: Optional[Array]) -> Array:
        logits = nn.Dense(
            self.num_actions,
            kernel_init=_kernel_init(self.cfg, scale=self.cfg.gain),
            bias_init=constant(0.0),
        )(x)
        if available_actions is not None:
            logits = jnp.where(available_actions, logits, _MASK_NEG)
        return logits


def _make_base(cfg: ModelConfig, obs_shape: Sequence[int]):
    return CNNBase(cfg) if len(obs_shape) == 3 else MLPBase(cfg)


def get_critic_head(critic_params) -> dict:
    """Return the critic value-head params ({'kernel': [H,1], 'bias': [1]}).

    Loud structured accessor for PopArt head surgery — fails with a clear
    message if a critic refactor moves/renames the head, instead of silently
    training with stale normalization."""
    try:
        head = critic_params["params"][R_Critic.HEAD_NAME]
        kernel, bias = head["kernel"], head["bias"]
    except (KeyError, TypeError) as e:
        raise KeyError(
            f"critic params have no '{R_Critic.HEAD_NAME}' head "
            f"(top-level keys: {list(critic_params.get('params', {}))}). "
            "PopArt rescales this layer in place; update R_Critic.HEAD_NAME "
            "if the head was renamed."
        ) from e
    if kernel.ndim != 2 or kernel.shape[-1] != 1 or bias.shape != (1,):
        raise ValueError(
            f"critic head '{R_Critic.HEAD_NAME}' has unexpected shapes "
            f"kernel={kernel.shape} bias={bias.shape}; PopArt expects a "
            "Dense(1) head."
        )
    return head


class R_Actor(nn.Module):
    cfg: ModelConfig
    obs_shape: Tuple[int, ...]
    num_actions: int

    def setup(self):
        self.base = _make_base(self.cfg, self.obs_shape)
        if self.cfg.use_recurrent_policy:
            self.rnn = RNNLayer(self.cfg)
        self.act = ACTLayer(self.cfg, self.num_actions)

    def __call__(self, obs, rnn_states, masks, available_actions=None):
        """Single-step logits. obs [..., F] with any leading batch dims
        (the sharded num_mini_batch=1 update keeps [T, M]); rnn_states
        [..., L, H]; masks [...].  Returns (logits [..., A], rnn_states')."""
        x = self.base(obs.reshape(obs.shape[:-1] + tuple(self.obs_shape)))
        if self.cfg.use_recurrent_policy:
            x, rnn_states = self.rnn.step(x, rnn_states, masks)
        return self.act(x, available_actions), rnn_states

    def unroll(self, obs, rnn_states, masks, available_actions=None):
        """Sequence logits for recurrent training. obs [T, N, ...];
        masks [T, N]. Returns (logits [T, N, A], rnn_states')."""
        T, N = obs.shape[:2]
        x = self.base(obs.reshape((T, N) + tuple(self.obs_shape)))
        if self.cfg.use_recurrent_policy:
            x, rnn_states = self.rnn.unroll(x, rnn_states, masks)
        return self.act(x, available_actions), rnn_states


class R_Critic(nn.Module):
    cfg: ModelConfig
    obs_shape: Tuple[int, ...]

    # Param-tree name of the value head.  PopArt head surgery
    # (train/mappo/trainer.py) rescales this layer's kernel/bias in place,
    # so the name is pinned here (passed to nn.Dense explicitly) rather
    # than relying on the setup attribute name.
    HEAD_NAME = "v_out"

    def setup(self):
        self.base = _make_base(self.cfg, self.obs_shape)
        if self.cfg.use_recurrent_policy:
            self.rnn = RNNLayer(self.cfg)
        # v_out init: orthogonal default gain 1.0 (reference uses plain init_
        # without gain for the critic head, r_actor_critic.py:143-147).
        self.v_out = nn.Dense(
            1, kernel_init=_kernel_init(self.cfg, scale=1.0),
            bias_init=constant(0.0), name=self.HEAD_NAME,
        )

    def __call__(self, cent_obs, rnn_states, masks):
        x = self.base(cent_obs.reshape(cent_obs.shape[:-1] + tuple(self.obs_shape)))
        if self.cfg.use_recurrent_policy:
            x, rnn_states = self.rnn.step(x, rnn_states, masks)
        return self.v_out(x)[..., 0], rnn_states

    def unroll(self, cent_obs, rnn_states, masks):
        T, N = cent_obs.shape[:2]
        x = self.base(cent_obs.reshape((T, N) + tuple(self.obs_shape)))
        if self.cfg.use_recurrent_policy:
            x, rnn_states = self.rnn.unroll(x, rnn_states, masks)
        return self.v_out(x)[..., 0], rnn_states
