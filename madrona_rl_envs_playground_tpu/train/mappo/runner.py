"""MAPPO self-play runner — the MainPlayer analog, TPU-native.

The reference ``MainPlayer`` (``train/MAPPO/main_player.py:185-309``) drives
the env from Python step-by-step, with a ``CentralizedAgent`` partner routing
seat-1 inference through the same policy into shared turn buffers
(``train/partner_agents.py:18-75``).  Behaviorally that is: one policy acts
for every seat each step, trajectories for all (env, seat) streams fill a
shared buffer, then R_MAPPO trains on it.

Here the entire collect phase is ONE jitted ``lax.scan`` over
``episode_length`` env steps (policy forward for all seats batched), the
buffer is assembled from the scan outputs, and GAE + the PPO update run
jitted as well.  Checkpointing mirrors ``main_player.py:311-325``
(actor/critic params saved per ``save_interval``; ``restore`` loads them).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.batch import batched_reset, batched_step
from ...models.common import dist_sample
from ...utils.logger import ScalarLogger
from .buffer import MAPPOBuffer, compute_returns, init_buffer
from .config import MAPPOConfig
from .policy import MAPPOPolicy
from .trainer import RMAPPOTrainer

Array = jnp.ndarray


class MAPPORunner:
    def __init__(self, cfg: MAPPOConfig, env, run_dir: Optional[str] = None,
                 mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.env = env
        self.N = cfg.n_rollout_threads
        self.A = env.num_agents
        obs_shape = (env.obs_size,)
        share_obs_shape = (env.state_size,)
        if cfg.use_cnn_obs:
            # grid envs only: flat obs is (x, y, c)-ordered, so the [W,H,C]
            # reshape inside R_Actor/R_Critic recovers the spatial layout the
            # reference CNN sees (utils/cnn.py input (W, H, C))
            if not hasattr(env, "width"):
                raise ValueError(
                    f"--use_cnn_obs needs a grid env (width/height/"
                    f"num_channels); {type(env).__name__} has flat obs only")
            obs_shape = (env.width, env.height, env.num_channels)
            if env.state_size == env.obs_size:
                share_obs_shape = obs_shape
        self.policy = MAPPOPolicy(
            cfg,
            obs_shape=obs_shape,
            share_obs_shape=share_obs_shape,
            num_actions=env.num_actions,
            seed=cfg.seed,
        )
        self.trainer = RMAPPOTrainer(cfg, self.policy)
        self.run_dir = run_dir
        self.logger = ScalarLogger(run_dir) if run_dir else None

        self._key = jax.random.PRNGKey(cfg.seed)
        self.bstate, self.out = batched_reset(env, self.N)
        if mesh is not None:
            # Shard the env batch over the mesh; XLA propagates the layout
            # through the collect scan and derives the gradient all-reduce
            # from the (replicated params, sharded batch) shardings.
            from ...parallel.mesh import shard_batch_pytree

            self.bstate = shard_batch_pytree(self.bstate, mesh)
            self.out = shard_batch_pytree(self.out, mesh)
        mc = cfg.model_config()
        L = mc.recurrent_N
        H = mc.hidden_size if mc.use_recurrent_policy else 1
        self._rnn = jnp.zeros((self.N * self.A, L, H))
        self._rnnc = jnp.zeros((self.N * self.A, L, H))
        self._masks = jnp.ones((self.N * self.A,))

        # Fused megakernel collection (see train/fused_collect.py): the
        # T-step scan below steps the Pallas kernel instead of batched_step,
        # with pack/unpack transposes once per collect.
        self._fused = None
        if cfg.rollout_backend != "jnp":
            from ..fused_collect import make_fused_collect

            if cfg.rollout_backend == "pallas" or jax.default_backend() == "tpu":
                self._fused = make_fused_collect(env, self.N, mesh=mesh)

        self._collect = jax.jit(self._collect_impl)
        self._compute = jax.jit(self._compute_impl)

    # ------------------------------------------------------------------
    def _collect_impl(self, pstate, bstate, out0, rnn0, rnnc0, masks0, key):
        """One episode_length rollout; returns buffer arrays + final carry."""
        cfg = self.cfg
        N, A = self.N, self.A
        B = N * A

        fused = self._fused
        if fused is not None:
            env_step = fused.step
            bstate = fused.pack(bstate)
        else:
            env_step = lambda ec, a: batched_step(env=self.env, bstate=ec,
                                                  actions=a)

        def step_fn(carry, _):
            bstate, out, rnn, rnnc, masks, key = carry
            key, ak = jax.random.split(key)
            obs = out.obs.reshape(B, -1)   # native dtype; bases cast to f32
            sobs = out.state_obs.reshape(B, -1)
            avail = out.action_mask.reshape(B, -1)
            active = out.active.reshape(B)

            values, actions, logp, rnn2, rnnc2 = self.policy.get_actions(
                pstate, ak, sobs, obs, rnn, rnnc, masks, avail
            )
            bstate2, out2 = env_step(bstate, actions.reshape(N, A))
            done = out2.done  # [N]
            done_b = jnp.repeat(done[:, None], A, axis=1).reshape(B)
            masks2 = 1.0 - done_b.astype(jnp.float32)
            # reset rnn states on episode end (main_player.py:248-257)
            rnn3 = rnn2 * masks2[:, None, None]
            rnnc3 = rnnc2 * masks2[:, None, None]

            ys = dict(
                share_obs=sobs, obs=obs, rnn=rnn, rnnc=rnnc,
                actions=actions, logp=logp, values=values,
                rewards=out2.reward.astype(jnp.float32).reshape(B),
                masks=masks, active=active.astype(jnp.float32), avail=avail,
                done=done,
            )
            return (bstate2, out2, rnn3, rnnc3, masks2, key), ys

        (bstate, out, rnn, rnnc, masks, key), tr = jax.lax.scan(
            step_fn, (bstate, out0, rnn0, rnnc0, masks0, key), None,
            length=cfg.episode_length,
        )
        if fused is not None:
            bstate = fused.unpack(bstate)
        return bstate, out, rnn, rnnc, masks, key, tr

    def _compute_impl(self, tstate, buf, out, rnnc, masks):
        B = self.N * self.A
        sobs = out.state_obs.reshape(B, -1)
        next_value = self.policy.get_values(tstate.policy, sobs, rnnc, masks)
        vn = tstate.vn if (self.cfg.use_popart or self.cfg.use_valuenorm) else None
        return compute_returns(
            buf, next_value.reshape(B), vn,
            self.cfg.gamma, self.cfg.gae_lambda, self.cfg.use_gae,
            self.cfg.use_proper_time_limits,
        )

    def _tr_to_buffer(self, tr, final_masks, final_active) -> MAPPOBuffer:
        cfg, N, A = self.cfg, self.N, self.A
        T = cfg.episode_length
        mc = cfg.model_config()
        # non-recurrent runs don't need the [T+1, N, A, L, H] hidden-state
        # buffers; shrink them to width 1 (they stay in the pytree for shape
        # compatibility)
        rnn_h = mc.hidden_size if mc.use_recurrent_policy else 1
        buf = init_buffer(
            T, N, A, self.env.obs_size, self.env.state_size,
            self.env.num_actions, mc.recurrent_N, rnn_h,
            obs_dtype=self.env.obs_dtype,
        )
        # the collect scan already emits [T, M, ...] (M = N * A) — the same
        # merged layout the buffer stores, so the fill is copy-shaped
        return buf.replace(
            share_obs=buf.share_obs.at[:-1].set(tr["share_obs"]),
            obs=buf.obs.at[:-1].set(tr["obs"]),
            rnn_states=buf.rnn_states.at[:-1].set(tr["rnn"]),
            rnn_states_critic=buf.rnn_states_critic.at[:-1].set(tr["rnnc"]),
            actions=tr["actions"],
            action_log_probs=tr["logp"],
            value_preds=buf.value_preds.at[:-1].set(tr["values"]),
            rewards=tr["rewards"],
            # Slot T gets the post-collect carry mask: the reference
            # SharedReplayBuffer.insert writes masks[step+1] every step, so
            # masks[T] = done-after-the-final-step there.  compute_returns
            # reads buf.masks[1:]; without this the terminal transition of a
            # horizon-aligned episode would wrongly bootstrap gamma*V(reset
            # obs) of the NEXT episode.
            masks=buf.masks.at[:-1].set(tr["masks"])
                          .at[-1].set(final_masks.reshape(N * A)),
            active_masks=buf.active_masks.at[:-1].set(tr["active"])
                          .at[-1].set(final_active.reshape(N * A)),
            available_actions=buf.available_actions.at[:-1].set(tr["avail"]),
        )

    # ------------------------------------------------------------------
    def run(self, episodes: Optional[int] = None):
        cfg = self.cfg
        steps_per_episode = cfg.episode_length * self.N
        if episodes is None:
            episodes = int(cfg.num_env_steps) // steps_per_episode
        t0 = time.time()
        last_info = None
        for ep in range(episodes):
            lrs = self.policy.lr_for(ep, episodes)
            self._key, ck, tk = jax.random.split(self._key, 3)
            (self.bstate, self.out, self._rnn, self._rnnc, self._masks, _, tr) = (
                self._collect(
                    self.trainer.state.policy, self.bstate, self.out,
                    self._rnn, self._rnnc, self._masks, ck,
                )
            )
            buf = self._tr_to_buffer(
                tr, self._masks,
                self.out.active.astype(jnp.float32),
            )
            buf = self._compute(self.trainer.state, buf, self.out, self._rnnc, self._masks)
            self.trainer.state, info = self.trainer.train(
                self.trainer.state, buf, tk,
                (jnp.float32(lrs[0]), jnp.float32(lrs[1])),
            )
            last_info = info

            # average per-episode score: team reward summed over the episode
            # (seat 0's reward stream; rewards are shared across seats)
            ep_rew = float(jnp.sum(tr["rewards"].reshape(-1, self.N, self.A)[:, :, 0]) / self.N)
            steps = (ep + 1) * steps_per_episode
            if self.logger is not None:
                self.logger.add_scalar("mappo/average_episode_rewards", ep_rew, steps)
                for k, v in info.items():
                    self.logger.add_scalar(f"mappo/{k}", float(v), steps)
                self.logger.flush()
            if (ep + 1) % cfg.log_interval == 0 or ep == episodes - 1:
                fps = steps / (time.time() - t0)
                print(
                    f"episode {ep + 1}/{episodes} steps={steps} "
                    f"avg_ep_reward={ep_rew:.2f} "
                    f"vloss={float(info['value_loss']):.4f} "
                    f"ent={float(info['dist_entropy']):.3f} FPS={fps:,.0f}"
                )
            if self.run_dir and (ep + 1) % cfg.save_interval == 0:
                self.save()
            if cfg.use_eval and (ep + 1) % cfg.eval_interval == 0:
                score = self.evaluate(
                    episodes=max(1, cfg.eval_episodes // self.N))
                if self.logger is not None:
                    self.logger.add_scalar("mappo/eval_score", score, steps)
                    self.logger.flush()
                print(f"eval @ episode {ep + 1}: deterministic score "
                      f"{score:.3f}")
        return last_info

    # ---- checkpointing (main_player.py:311-325, widened) ---------------
    def save(self, path: Optional[str] = None):
        """The reference saves actor/critic state_dicts only; this also
        persists both optimizer states and the ValueNorm stats so a
        restored run RESUMES training rather than restarting Adam."""
        path = path or self.run_dir
        os.makedirs(path, exist_ok=True)
        pol = self.trainer.state.policy
        blob = {
            "actor_params": jax.device_get(pol.actor_params),
            "critic_params": jax.device_get(pol.critic_params),
            "actor_opt": jax.device_get(pol.actor_opt),
            "critic_opt": jax.device_get(pol.critic_opt),
            "vn": jax.device_get(self.trainer.state.vn),
        }
        with open(os.path.join(path, "checkpoint.pkl"), "wb") as f:
            pickle.dump(blob, f)

    def restore(self, path: Optional[str] = None):
        path = path or self.run_dir
        with open(os.path.join(path, "checkpoint.pkl"), "rb") as f:
            blob = pickle.load(f)
        pol = self.trainer.state.policy.replace(
            actor_params=blob["actor_params"], critic_params=blob["critic_params"]
        )
        if "actor_opt" in blob:  # older checkpoints: params only
            pol = pol.replace(actor_opt=blob["actor_opt"],
                              critic_opt=blob["critic_opt"])
        self.trainer.state = self.trainer.state.replace(policy=pol, vn=blob["vn"])

    # ---- deterministic eval (train/tester.py analog) ------------------
    def evaluate(self, episodes: int = 1, deterministic: bool = True) -> float:
        """Fused eval: the whole ``episodes * episode_length`` rollout is one
        jitted ``lax.scan`` (the reference's tester.py steps host-side; a
        host-driven loop through the TPU tunnel is the known ~100x-slow
        path, so eval is scanned exactly like collect)."""
        cached = getattr(self, "_eval_cache", None)
        if cached is not None and cached[0] == (episodes, deterministic):
            return cached[1]()
        cfg = self.cfg
        N, A = self.N, self.A
        B = N * A
        mc = cfg.model_config()
        T = episodes * cfg.episode_length
        bstate0, out0 = batched_reset(self.env, N, start_episode=10_000_000)
        rnn0 = jnp.zeros((B, mc.recurrent_N, mc.hidden_size))
        masks0 = jnp.ones((B,))
        key = jax.random.PRNGKey(cfg.seed + 777)

        def eval_rollout(pstate, bstate, out, rnn, masks, key):
            def step_fn(carry, _):
                bstate, out, rnn, masks, key = carry
                key, ak = jax.random.split(key)
                obs = out.obs.reshape(B, -1).astype(jnp.float32)
                avail = out.action_mask.reshape(B, -1)
                logits, rnn2 = self.policy.actor.apply(
                    pstate.actor_params, obs, rnn, masks, avail
                )
                if deterministic:
                    actions = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                else:
                    actions = dist_sample(ak, logits)
                bstate2, out2 = batched_step(self.env, bstate, actions.reshape(N, A))
                done_b = jnp.repeat(out2.done[:, None], A, 1).reshape(B).astype(jnp.float32)
                carry2 = (bstate2, out2, rnn2 * (1 - done_b)[:, None, None],
                          1 - done_b, key)
                return carry2, out2.reward[:, 0].sum()

            _, rews = jax.lax.scan(
                step_fn, (bstate, out, rnn, masks, key), None, length=T
            )
            return rews.sum()

        jitted = jax.jit(eval_rollout)

        def run_once():
            total = jitted(
                self.trainer.state.policy, bstate0, out0, rnn0, masks0, key
            )
            return float(total) / (episodes * N)

        # periodic use_eval calls reuse the compiled scan
        self._eval_cache = ((episodes, deterministic), run_once)
        return run_once()
