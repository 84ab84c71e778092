"""Fused self-play PPO: rollout + credit assignment + GAE + update in ONE jit.

This is the TPU-native flagship training path, the fast-path analog of the
reference's centralized self-play drivers
(``pantheonrl_extension/centralized_agent.py``, ``hanabi_agent.py``) and of
the MAPPO Colab configuration: one policy controls every seat, trajectories
from all (env, seat) streams train it jointly.

Where the reference drives the env from Python step-by-step and trains in a
separate torch loop, here a single jitted function runs a ``lax.scan`` of
``num_steps`` env steps (policy forward for all seats batched together), then
applies the multi-agent credit rules and PPO epochs — no host round trips.
Under a ``jax.sharding.Mesh`` the env axis is sharded and XLA inserts the
gradient all-reduce automatically.

Credit semantics preserved from the reference agents
(``vectoragent.py:197-219``, ``centralized_agent.py:288-322``):
* every (env, seat) stream records a slot every step; rewards earned while a
  seat is inactive flow back to its last active slot;
* rewards arriving after an episode boundary but before the seat's first
  action of the new episode are dropped;
* GAE runs with the active-mask rules of ``active_masked_gae``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.batch import batched_reset, batched_step
from ..models.cleanrl import CleanRLNetwork
from ..models.common import (
    dist_entropy,
    dist_entropy_t,
    dist_log_prob,
    dist_log_prob_t,
    dist_sample,
)
from .cleanrl_ppo import Rollout, active_masked_gae, plain_gae

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SelfPlayConfig:
    num_steps: int = 128
    gamma: float = 0.99
    gae_lambda: float = 0.95
    update_epochs: int = 4
    num_minibatches: int = 1
    lr: float = 2.5e-4
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    clip_coef: float = 0.2
    clip_vloss: bool = True
    norm_adv: bool = True
    max_grad_norm: float = 0.5
    hidden: int = 512
    num_layers: int = 3
    # bfloat16 compute for the actor/critic matmuls (params/optimizer stay
    # f32, logits/values cast back to f32 before softmax/losses).  The PPO
    # update phase is ~90%% of train_step and MXU-rate-bound; bf16 runs the
    # matmuls at the systolic-array rate.  Off by default for strict parity
    # with the reference's f32 torch nets.
    use_bf16: bool = False
    # Rollout collection backend: "auto" uses the fused Pallas megakernel
    # (train/fused_collect.py) on TPU where one exists for the env, the jnp
    # batched_step otherwise; "pallas"/"jnp" force it.  The collected
    # trajectories are bit-identical either way (tests/test_fused_collect.py) —
    # this only changes how many HBM round-trips one env step costs.
    rollout_backend: str = "auto"
    # Value-loss variant.  "clipped_mse" follows the decentralized driver
    # (reference ``vectoragent.py:330-346``, gated by clip_vloss/vf_coef).
    # "smooth_l1" reproduces the centralized self-play driver
    # (``centralized_agent.py:381``): huber(beta=1) value loss, no vf_coef,
    # and the ENTIRE loss scaled x128 (``centralized_agent.py:384``) —
    # equivalent to a 128x learning-rate-ish gradient scale the reference
    # ships with; reproduced verbatim for parity.
    value_loss: str = "clipped_mse"


def credit_rewards(rewards: Array, active: Array, dones: Array) -> Tuple[Array, Array]:
    """Apply the reference's inactive-reward routing to raw per-step rewards.

    rewards/active: [T, M] (M = env*seat streams); dones: [T, M] (per-stream
    episode done at that step).  Returns (credited [T, M], slot_dones [T, M])
    where credited[t] is the total reward attributed to the action recorded at
    slot t and slot_dones[t] is the done flag delivered between slots t-1 and
    t (the reference's ``next_done`` at record time, ``vectoragent.py:288``).
    """

    # new_game state at the moment rewards are delivered at step t:
    # cleared when the seat acts at t, set after any done.
    def fwd(ng, xs):
        a_t, d_t = xs
        ng_at_update = jnp.where(a_t, False, ng)
        return ng_at_update | d_t, ng_at_update

    _, ng = jax.lax.scan(fwd, jnp.zeros(rewards.shape[1:], jnp.bool_),
                         (active, dones))
    kept = jnp.where(ng, 0.0, rewards)

    # Reverse accumulation: each step's kept reward flows to the most recent
    # active slot at or before it.
    def rev(acc, xs):
        r_t, a_t = xs
        acc = acc + r_t
        credited_t = jnp.where(a_t, acc, 0.0)
        acc = jnp.where(a_t, 0.0, acc)
        return acc, credited_t

    _, credited = jax.lax.scan(rev, jnp.zeros(rewards.shape[1:], rewards.dtype),
                               (kept, active), reverse=True)

    # Slot-done = done delivered just before this slot (shift by one).
    slot_dones = jnp.concatenate(
        [jnp.zeros((1,) + dones.shape[1:], dones.dtype), dones[:-1]], axis=0
    )
    return credited, slot_dones


class SelfPlayPPO:
    """Owns params/optimizer and the single jitted ``train_step``.

    ``train_step(state, key) -> (state, metrics)`` advances ``cfg.num_steps``
    env steps and runs the PPO update.  ``state`` is a pytree
    (params, opt_state, bstate, last_out) so it can be device_put onto a
    sharded mesh once and stay there.
    """

    def __init__(self, env, num_envs: int, cfg: SelfPlayConfig = SelfPlayConfig(),
                 seed: int = 0, mesh=None):
        self.env = env
        self.num_envs = num_envs
        self.cfg = cfg
        self.net = CleanRLNetwork(
            num_actions=env.num_actions, hidden=cfg.hidden,
            num_layers=cfg.num_layers,
            dtype=jnp.bfloat16 if cfg.use_bf16 else None,
        )

        key = jax.random.PRNGKey(seed)
        key, pk = jax.random.split(key)
        params = self.net.init(
            pk,
            jnp.zeros((1, env.obs_size)),
            jnp.zeros((1, env.state_size)),
            jnp.ones((1, env.num_actions), jnp.bool_),
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr, eps=1e-5),
        )
        opt_state = self.tx.init(params)
        bstate, out = batched_reset(env, num_envs)
        self.state = {
            "params": params,
            "opt_state": opt_state,
            "bstate": bstate,
            "out": out,
            "key": key,
        }
        if mesh is not None:
            from ..parallel.mesh import put_selfplay_state

            self.state = put_selfplay_state(self.state, mesh)
        # Fused megakernel collection.  On a mesh, the kernel is shard_map-ed
        # over the env axis where exact (overcooked); other envs keep the
        # XLA-sharded jnp path (see make_fused_collect).
        self._fused = None
        if cfg.rollout_backend != "jnp":
            from .fused_collect import make_fused_collect

            on_tpu = jax.default_backend() == "tpu"
            if cfg.rollout_backend == "pallas" or on_tpu:
                self._fused = make_fused_collect(env, num_envs, mesh=mesh)
        # Static structure hints (EnvBase.state_is_obs / .masked): envs whose
        # state_obs aliases obs store ONE trajectory buffer instead of two,
        # and envs that always emit all-ones mask/active skip storing them
        # and skip the credit-routing scan entirely — the r5 trace showed
        # the duplicate obs store + constant mask/active stores were ~40% of
        # the rollout loop at the published 8k config.
        self._alias = bool(getattr(env, "state_is_obs", False))
        self._masked = bool(getattr(env, "masked", True))
        # Rollout obs stays in the env's native dtype (int8 for the grid
        # envs): r5 traces showed XLA fuses the per-epoch widening into the
        # first-layer matmul reads, while storing wide costs a materialized
        # cast copy per rollout step AND doubles the epoch read traffic.
        self._store_dtype = None
        # Lane-resident (feature-major) training path: the env kernel, the
        # policy towers, the trajectory buffers, and the PPO epochs all keep
        # the batch on the TPU lane axis (obs [F, B] columns, apply_t).
        self._cols = (self._fused is not None
                      and getattr(self._fused, "step_cols", None) is not None
                      # the cols buffers chunk on the T axis only
                      and cfg.num_steps % cfg.num_minibatches == 0)
        # No donation: StepOutput.obs/state_obs may alias one buffer (envs
        # where state==obs), and donating an aliased pytree is an error.
        self.train_step = jax.jit(self._train_step)

    # ------------------------------------------------------------------
    def _policy(self, params, key, out):
        """Batched forward for all seats. out fields [N, P, ...]."""
        N, P = out.active.shape
        # int8 obs feed the towers directly — MLPTower casts to its
        # compute dtype (bf16 under use_bf16) at entry, so an f32 copy here
        # would only add an extra materialized cast
        obs = out.obs.reshape(N * P, -1)
        st = obs if self._alias else out.state_obs.reshape(N * P, -1)
        mask = (out.action_mask.reshape(N * P, -1) if self._masked else None)
        logits, value = self.net.apply(params, obs, st, mask)
        action = dist_sample(key, logits)
        logp = dist_log_prob(logits, action)
        return (
            action.reshape(N, P),
            logp.reshape(N, P),
            value.reshape(N, P),
        )

    def _rollout(self, state):
        """Phase 1: the ``num_steps`` env+policy scan.  Returns the advanced
        env state/out/key and the stacked trajectory buffers [T, N*P, ...]."""
        cfg = self.cfg
        env = self.env
        N = self.num_envs
        P = env.num_agents

        fused = self._fused
        if self._cols:
            return self._rollout_cols(state, fused)
        if fused is not None:
            env_step = fused.step
            carry0 = fused.pack(state["bstate"])
        else:
            env_step = lambda ec, a: batched_step(env, ec, a)
            carry0 = state["bstate"]

        def rollout_body(carry, _):
            ecarry, out, key = carry
            key, ak = jax.random.split(key)
            action, logp, value = self._policy(state["params"], ak, out)
            ecarry2, out2 = env_step(ecarry, action)
            # store every slice flattened to [N*P, ...]: stacked buffers are
            # then [T, N*P, feat], which tiles cleanly on TPU.  Keeping the
            # seat axis separate puts (P, feat) in the tiled minor dims and
            # pads int8 obs 2.5x / f32 [N, P=2] rows 64x — at 32k envs that
            # alone OOMs the 16G HBM (s8[64,32768,2,520] padded 2.03G->5G).
            M_ = N * P
            obs_s = out.obs.reshape(M_, -1)
            if self._store_dtype is not None:
                obs_s = obs_s.astype(self._store_dtype)
            ys = {
                "obs": obs_s,
                "action": action.reshape(M_),
                "logp": logp.reshape(M_),
                "value": value.reshape(M_),
                "reward": out2.reward.astype(jnp.float32).reshape(M_),
                "done": jnp.repeat(out2.done[:, None], P, 1).reshape(M_),
            }
            if not self._alias:
                st_s = out.state_obs.reshape(M_, -1)
                if self._store_dtype is not None:
                    st_s = st_s.astype(self._store_dtype)
                ys["state_obs"] = st_s
            if self._masked:
                ys["mask"] = out.action_mask.reshape(M_, -1)
                ys["active"] = out.active.reshape(M_)
            return (ecarry2, out2, key), ys

        (ecarry, out, key), tr = jax.lax.scan(
            rollout_body,
            (carry0, state["out"], state["key"]),
            None,
            length=cfg.num_steps,
        )
        bstate = fused.unpack(ecarry) if fused is not None else ecarry
        return bstate, out, key, tr

    def _rollout_cols(self, state, fused):
        """Lane-resident rollout over a ``step_cols`` kernel: obs (and for
        masked envs the centralized state, action mask and active flags)
        flow kernel -> [F, B] feature-major columns -> transposed policy
        towers (``models/cleanrl.apply_t``) AND the trajectory store, with
        the batch on the TPU lane axis the whole way.  The generic body's
        env-major [N, P, F] carry cost a ~320 us/step relayout chain at 8k
        envs (r5 traces).

        Column order is b = p*N + n; actions are SAMPLED in the generic
        path's row orientation (one tiny [A, B] transpose) so each (env,
        seat) stream draws the identical gumbel noise — trajectories match
        the generic body per stream, buffers differ only by stream order
        (all downstream reductions are order-invariant)."""
        from ..core.types import StepOutput
        from ..models.cleanrl import apply_t

        cfg = self.cfg
        env = self.env
        N = self.num_envs
        P = env.num_agents
        M = N * P
        A = env.num_actions
        masked = self._masked
        aliased = self._alias

        carry0 = fused.pack(state["bstate"])
        # initial cols from the env-major StepOutput, once per train_step
        out0 = state["out"]
        fcols = lambda a: a.transpose(2, 1, 0).reshape(a.shape[-1], M)
        cols0 = {"obs": fcols(out0.obs)}
        if not aliased:
            cols0["state"] = fcols(out0.state_obs)
        if masked:
            cols0["mask"] = fcols(out0.action_mask)
            cols0["active"] = out0.active.transpose().reshape(M)

        def body(carry, _):
            ecarry, cols, key = carry
            key, ak = jax.random.split(key)
            logits_t, value = apply_t(
                state["params"], self.net, cols["obs"],
                mask_t=cols.get("mask"), x_critic=cols.get("state"))
            logits_rows = (logits_t.reshape(A, P, N)
                           .transpose(2, 1, 0).reshape(M, A))
            action_m = dist_sample(ak, logits_rows)          # [M] n-major
            action_pn = action_m.reshape(N, P).transpose()   # [P, N]
            action_b = action_pn.reshape(M)                  # p-major
            logp = dist_log_prob_t(logits_t, action_b)
            ecarry2, cols2 = fused.step_cols(
                ecarry, action_pn.astype(jnp.int32))
            ys = {
                "obs_cols": cols["obs"],
                "action": action_b,
                "logp": logp,
                "value": value,
                "reward": cols2["reward"],
                "done": jnp.broadcast_to(cols2["done"][None],
                                         (P, N)).reshape(M),
            }
            if not aliased:
                ys["state_cols"] = cols["state"]
            if masked:
                ys["mask_cols"] = cols["mask"]
                ys["active"] = cols["active"]
            carry_cols = {k: cols2[k] for k in cols0}
            return (ecarry2, carry_cols, key), ys

        (ecarry, cols_last, key), tr = jax.lax.scan(
            body, (carry0, cols0, state["key"]), None, length=cfg.num_steps)
        bstate = fused.unpack(ecarry)

        tonm = lambda a: a.reshape(a.shape[0], P, N).transpose(2, 1, 0)
        obs_nm = tonm(cols_last["obs"])
        out = StepOutput(
            obs=obs_nm,
            state_obs=(obs_nm if aliased else tonm(cols_last["state"])),
            action_mask=(tonm(cols_last["mask"]) if masked
                         else jnp.ones((N, P, A), jnp.bool_)),
            active=(cols_last["active"].reshape(P, N).transpose() if masked
                    else jnp.ones((N, P), jnp.bool_)),
            reward=tr["reward"][-1].reshape(P, N)
            .transpose().astype(env.reward_dtype),
            done=tr["done"][-1].reshape(P, N)[0],
        )
        return bstate, out, key, tr

    def _advantage(self, params, tr, out):
        """Phase 2: credit routing + bootstrap + GAE + advantage norm +
        minibatch chunking.  Returns (chunks, stats) where stats carries the
        masked-mean ingredients for the reward/value metrics."""
        cfg = self.cfg
        N = self.num_envs
        P = self.env.num_agents
        T = cfg.num_steps
        M = N * P

        if self._masked:
            credited, slot_dones = credit_rewards(
                tr["reward"], tr["active"], tr["done"]
            )
        else:
            # every seat acts every step: the inactive-reward routing is the
            # identity and slot-dones are the one-step-shifted dones — no
            # sequential scans needed
            credited = tr["reward"]
            slot_dones = jnp.concatenate(
                [jnp.zeros((1, M), tr["done"].dtype), tr["done"][:-1]], axis=0
            )

        # Rollout buffers stay in the env's native obs dtype.  In the cols
        # path obs is [T, F, B] feature-major (batch on lanes) and states
        # is None — the towers read obs for both actor and critic.
        cols = "obs_cols" in tr
        buf = Rollout(
            obs=tr["obs_cols"] if cols else tr["obs"],
            states=(tr.get("state_cols") if cols
                    else (tr["obs"] if self._alias else tr["state_obs"])),
            actions=tr["action"],
            action_masks=tr.get("mask_cols") if cols else tr.get("mask"),
            logprobs=tr["logp"],
            rewards=credited,
            dones=slot_dones,
            active=tr.get("active"),
            values=tr["value"],
        )

        # Bootstrap values from the post-rollout observation.
        if cols:
            from ..models.cleanrl import value_t

            sobs_cols = out.state_obs.transpose(2, 1, 0).reshape(-1, M)
            next_value = value_t(params, self.net, sobs_cols)
            next_done = jnp.broadcast_to(out.done[None], (P, N)).reshape(M)
        else:
            final_state_obs = out.state_obs.reshape(M, -1)
            next_value = self.net.apply(
                params, final_state_obs, method=CleanRLNetwork.get_value
            )
            next_done = jnp.repeat(out.done[:, None], P, axis=1).reshape(M)

        if self._masked:
            # stream order is p-major in the cols path, n-major otherwise
            final_active = (out.active.transpose().reshape(M) if cols
                            else out.active.reshape(M))
            advantages, returns, active = active_masked_gae(
                buf, next_value, next_done, final_active,
                cfg.gamma, cfg.gae_lambda
            )
        else:
            # all-active specialization: log-depth associative-scan GAE
            # (train/cleanrl_ppo.plain_gae) instead of T sequential steps
            advantages, returns = plain_gae(
                buf.rewards, buf.dones, buf.values, next_value, next_done,
                cfg.gamma, cfg.gae_lambda
            )
            active = None

        # Everything below stays [T, M, ...] — M is the (sharded) env axis
        # and merging it with T (the old flat()) produced a sharding GSPMD
        # cannot express, which silently all-gathered the ENTIRE rollout
        # buffer to every device each PPO epoch (~0.5 GB/update at 8k envs
        # — measured from the compiled sharded HLO).  Dense layers map over
        # all leading axes, and the masked means are order-invariant, so
        # the update is unchanged while grads reduce with one small psum.
        if active is None:
            b_active = None
            n_active = float(T * M)
            masked_mean = lambda x: jnp.mean(x)
        else:
            b_active = active.astype(jnp.float32)
            n_active = jnp.maximum(b_active.sum(), 1.0)
            masked_mean = lambda x: (x * b_active).sum() / n_active

        b_adv = advantages
        if cfg.norm_adv:
            m = masked_mean(b_adv)
            var = masked_mean((b_adv - m) ** 2)
            std = jnp.sqrt(var * n_active / jnp.maximum(n_active - 1.0, 1.0))
            b_adv = (b_adv - m) / (std + 1e-8)

        # Minibatching (timestep bands) bounds the update's activation
        # memory — the full T*N*P batch with a 512-wide tower can exceed
        # HBM at large env counts.  nmb=1 reproduces the reference's
        # full-batch behavior.  Chunks slice the T axis only (identical
        # rows to the old T-major flat chunking), never the env axis.
        nmb = cfg.num_minibatches
        batch = (buf.obs, buf.states, buf.actions, buf.action_masks,
                 buf.logprobs, b_adv, returns, buf.values, b_active)
        if T % nmb == 0:
            chunks = jax.tree_util.tree_map(
                lambda x: x.reshape((nmb, T // nmb) + x.shape[1:]), batch
            )
        else:
            # legacy fallback for nmb that doesn't divide T: the old
            # T-major flat chunking (drops the remainder rows).  This
            # merges the env axis — fine single-device, but on a mesh it
            # forces an all-gather of the buffers; pick nmb | T for
            # sharded runs (docs/multihost_projection.md).
            mb = T * M // nmb
            chunks = jax.tree_util.tree_map(
                lambda x: x.reshape((T * M,) + x.shape[2:])[: nmb * mb]
                .reshape((nmb, mb) + x.shape[2:]),
                batch,
            )
        stats = {
            "mean_step_reward": masked_mean(credited),
            "mean_value": masked_mean(buf.values),
        }
        return chunks, stats

    def _update(self, params, opt_state, chunks):
        """Phase 3: the PPO epochs/minibatch scan.  Pure function of
        (params, opt_state, chunks); returns the last epoch's aux losses."""
        cfg = self.cfg

        def mb_loss(p, chunk):
            (c_obs, c_states, c_actions, c_masks, c_logprobs, c_adv,
             c_returns, c_values, c_active) = chunk
            if c_active is None:
                mmean = lambda x: jnp.mean(x)
            else:
                n_act = jnp.maximum(c_active.sum(), 1.0)
                mmean = lambda x: (x * c_active).sum() / n_act
            if self._cols:
                from ..models.cleanrl import apply_t

                # c_obs [Tc, F, B] feature-major; towers contract F, the
                # batch stays on lanes through the whole epoch
                logits_t, newvalue = apply_t(p, self.net, c_obs,
                                             mask_t=c_masks,
                                             x_critic=c_states)
                newlogprob = dist_log_prob_t(logits_t, c_actions)
                entropy = dist_entropy_t(logits_t)
            else:
                logits, newvalue = self.net.apply(p, c_obs, c_states, c_masks)
                newlogprob = dist_log_prob(logits, c_actions)
                entropy = dist_entropy(logits)
            logratio = newlogprob - c_logprobs
            ratio = jnp.exp(logratio)
            pg = mmean(
                jnp.maximum(
                    -c_adv * ratio,
                    -c_adv * jnp.clip(ratio, 1 - cfg.clip_coef, 1 + cfg.clip_coef),
                )
            )
            if cfg.value_loss == "smooth_l1":
                # centralized_agent.py:381 — huber(beta=1) on the value head,
                # no vf_coef, whole loss x128 (:384).
                err = newvalue - c_returns
                a = jnp.abs(err)
                vl = mmean(jnp.where(a < 1.0, 0.5 * err * err, a - 0.5))
                ent = mmean(entropy)
                total = (pg - cfg.ent_coef * ent + vl) * 128.0
            else:
                if cfg.clip_vloss:
                    vl = 0.5 * mmean(
                        jnp.maximum(
                            (newvalue - c_returns) ** 2,
                            (
                                c_values
                                + jnp.clip(newvalue - c_values, -cfg.clip_coef, cfg.clip_coef)
                                - c_returns
                            )
                            ** 2,
                        )
                    )
                else:
                    vl = 0.5 * mmean((newvalue - c_returns) ** 2)
                ent = mmean(entropy)
                total = pg - cfg.ent_coef * ent + vl * cfg.vf_coef
            kl = mmean((ratio - 1) - logratio)
            return total, (pg, vl, ent, kl)

        def epoch_body(carry, _):
            params, opt_state = carry

            def mb_body(carry2, chunk):
                params, opt_state = carry2
                (loss, aux), grads = jax.value_and_grad(mb_loss, has_aux=True)(
                    params, chunk
                )
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), auxes = jax.lax.scan(
                mb_body, (params, opt_state), chunks
            )
            return (params, opt_state), jax.tree_util.tree_map(jnp.mean, auxes)

        (params, opt_state), auxes = jax.lax.scan(
            epoch_body,
            (params, opt_state),
            None,
            length=cfg.update_epochs,
        )
        return params, opt_state, auxes

    def _train_step(self, state, _=None):
        """rollout -> advantage -> update, composed in one jit (XLA fuses
        across the phase seams; the split exists so
        ``scripts/profile_train_step.py`` can compile and time each phase
        on its own)."""
        bstate, out, key, tr = self._rollout(state)
        chunks, stats = self._advantage(state["params"], tr, out)
        params, opt_state, auxes = self._update(
            state["params"], state["opt_state"], chunks
        )

        metrics = {
            "pg_loss": auxes[0][-1],
            "v_loss": auxes[1][-1],
            "entropy": auxes[2][-1],
            "approx_kl": auxes[3][-1],
            **stats,
        }
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "bstate": bstate,
            "out": out,
            "key": key,
        }
        return new_state, metrics

    # ---- checkpointing -------------------------------------------------
    def save(self, path: str, with_env_state: bool = True) -> None:
        """params + optimizer + RNG key always; by default also the batched
        env state, making a restore a TRUE mid-stream resume (the reference
        checkpoints params only).  ``with_env_state=False`` writes a
        portable policy-only checkpoint (loadable at any num_envs)."""
        from ..utils.checkpoint import save_pytree

        keys = ["params", "opt_state", "key"]
        if with_env_state:
            keys += ["bstate", "out"]
        save_pytree(path, {k: self.state[k] for k in keys})

    def load(self, path: str) -> None:
        from ..utils.checkpoint import load_pytree

        blob = load_pytree(path)
        saved_n = next(
            (int(l.shape[0]) for l in jax.tree_util.tree_leaves(
                blob.get("bstate", ())) if getattr(l, "ndim", 0) >= 1),
            self.num_envs,
        )
        if "bstate" in blob and saved_n != self.num_envs:
            # env-state from a different batch size: policy-only restore
            blob.pop("bstate")
            blob.pop("out", None)
        self.state.update({k: jax.device_put(v) for k, v in blob.items()})

    # ------------------------------------------------------------------
    def run(self, num_updates: int, log_every: int = 0, logger=None):
        metrics = None
        for u in range(num_updates):
            self.state, metrics = self.train_step(self.state)
            if log_every and (u + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                if logger is not None:
                    for k, v in m.items():
                        logger.add_scalar(f"selfplay/{k}", v, u + 1)
                else:
                    print(f"update {u + 1}: {m}")
        return metrics
