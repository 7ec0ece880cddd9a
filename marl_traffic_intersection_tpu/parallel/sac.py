"""Off-policy SAC learner over the batched env: one fully-jitted step.

Net-new (the reference ships no training code — SURVEY.md §4). Complements the
on-policy PPO learner with the standard continuous-control off-policy recipe
(Haarnoja et al., 2018): twin Q critics with polyak targets, reparameterized
tanh-Gaussian actor, automatic temperature tuning to a target entropy.

TPU-native design:

  - **On-device ring replay buffer**: preallocated fixed-shape arrays in HBM,
    donated through the jitted step so XLA updates them in place. Each env
    step inserts a (num_envs x num_agents)-row chunk; the capacity is rounded
    to a chunk multiple so every insert is one aligned
    ``lax.dynamic_update_slice`` — no scatter, no host round-trip.
  - **Twin critics as a stacked ensemble**: two Q param sets stacked on a
    leading axis, applied under ``jax.vmap`` — one batched matmul stack
    instead of two kernels per layer.
  - **Fused collect+update**: ``train_step`` runs ``steps_per_call`` iterations
    of [env step -> buffer insert -> gradient update] inside one
    ``lax.scan`` — a single XLA program per call, same shape discipline as
    the PPO learner.
  - Uniform replay sampling is one batched gather per update (a (batch,)
    index row-gather from HBM — fine on the learner side; the gather-free
    rules of PERF.md apply to the per-step *simulation* hot path, not here).

Warmup is handled inside the compiled program: updates are masked to zero
until the buffer holds ``warmup`` transitions (no data-dependent Python
control flow under jit).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..envs.vector import VectorEnv
from ..models.sac import QCritic, SquashedGaussianActor, sample_squashed


@dataclass(frozen=True)
class SACConfig:
    gamma: float = 0.99
    tau: float = 0.005           # polyak target rate
    lr: float = 3e-4
    alpha_lr: float = 3e-4
    init_alpha: float = 0.2
    target_entropy: float | None = None   # default: -act_dim
    batch_size: int = 256
    buffer_capacity: int = 1 << 19        # transitions (rounded to chunk)
    warmup: int = 2048                    # transitions before updates start
    steps_per_call: int = 8               # env steps (and updates) per jit call


class ReplayBuffer(NamedTuple):
    obs: jnp.ndarray        # (C, 127)
    action: jnp.ndarray     # (C, 2)
    reward: jnp.ndarray     # (C,)
    next_obs: jnp.ndarray   # (C, 127)
    done: jnp.ndarray       # (C,) f32 bootstrap cut
    ptr: jnp.ndarray        # i32, in chunks
    size: jnp.ndarray       # i32, transitions currently valid


class SACState(NamedTuple):
    actor_params: Any
    q_params: Any            # stacked twin (leading axis 2)
    q_target: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    q_opt: Any
    alpha_opt: Any
    buffer: ReplayBuffer
    update_count: jnp.ndarray


class SACLearner:
    def __init__(self, vec_env: VectorEnv, cfg: SACConfig = SACConfig(),
                 actor: SquashedGaussianActor | None = None,
                 critic: QCritic | None = None):
        self.env = vec_env
        self.cfg = cfg
        self.actor = actor or SquashedGaussianActor()
        self.critic = critic or QCritic()
        self.n_agents = vec_env.env.config.num_agents
        self.chunk = vec_env.num_envs * self.n_agents
        # capacity rounded UP to a chunk multiple so inserts stay aligned
        cap = max(cfg.buffer_capacity, self.chunk)
        self.capacity = ((cap + self.chunk - 1) // self.chunk) * self.chunk
        self.actor_tx = optax.adam(cfg.lr)
        self.q_tx = optax.adam(cfg.lr)
        self.alpha_tx = optax.adam(cfg.alpha_lr)
        self.target_entropy = (cfg.target_entropy
                               if cfg.target_entropy is not None
                               else -float(self.actor.act_dim))

    # ----------------------------------------------------------------- init
    def init(self, key) -> SACState:
        ko, kq1, kq2 = jax.random.split(key, 3)
        obs = jnp.zeros((1, 127), jnp.float32)
        act = jnp.zeros((1, self.actor.act_dim), jnp.float32)
        actor_params = self.actor.init(ko, obs)
        q_params = jax.vmap(lambda k: self.critic.init(k, obs, act))(
            jnp.stack([kq1, kq2]))
        C = self.capacity
        buffer = ReplayBuffer(
            obs=jnp.zeros((C, 127), jnp.float32),
            action=jnp.zeros((C, self.actor.act_dim), jnp.float32),
            reward=jnp.zeros((C,), jnp.float32),
            next_obs=jnp.zeros((C, 127), jnp.float32),
            done=jnp.zeros((C,), jnp.float32),
            ptr=jnp.int32(0), size=jnp.int32(0))
        return SACState(
            actor_params=actor_params, q_params=q_params,
            q_target=jax.tree.map(jnp.copy, q_params),
            log_alpha=jnp.log(jnp.float32(self.cfg.init_alpha)),
            actor_opt=self.actor_tx.init(actor_params),
            q_opt=self.q_tx.init(q_params),
            alpha_opt=self.alpha_tx.init(jnp.float32(0.0)),
            buffer=buffer, update_count=jnp.int32(0))

    # --------------------------------------------------------------- buffer
    def _insert(self, buf: ReplayBuffer, obs, action, reward, next_obs,
                done) -> ReplayBuffer:
        """Insert one (chunk,)-row transition block at the aligned ring slot."""
        start = buf.ptr * self.chunk
        upd = lambda a, v: jax.lax.dynamic_update_slice_in_dim(a, v, start, 0)
        n_chunks = self.capacity // self.chunk
        return ReplayBuffer(
            obs=upd(buf.obs, obs), action=upd(buf.action, action),
            reward=upd(buf.reward, reward), next_obs=upd(buf.next_obs, next_obs),
            done=upd(buf.done, done),
            ptr=(buf.ptr + 1) % n_chunks,
            size=jnp.minimum(buf.size + self.chunk, self.capacity))

    def _sample(self, buf: ReplayBuffer, key, n: int):
        idx = jax.random.randint(key, (n,), 0, jnp.maximum(buf.size, 1))
        return (buf.obs[idx], buf.action[idx], buf.reward[idx],
                buf.next_obs[idx], buf.done[idx])

    # --------------------------------------------------------------- update
    def _q_apply(self, q_params, obs, action):
        return jax.vmap(self.critic.apply, in_axes=(0, None, None))(
            q_params, obs, action)                         # (2, batch)

    def _update(self, ts: SACState, key) -> tuple:
        cfg = self.cfg
        ks, ka, kt = jax.random.split(key, 3)
        obs, action, reward, next_obs, done = self._sample(
            ts.buffer, ks, cfg.batch_size)
        alpha = jnp.exp(ts.log_alpha)

        # targets
        mean2, log_std2 = self.actor.apply(ts.actor_params, next_obs)
        a2, logp2 = sample_squashed(kt, mean2, log_std2)
        q2 = self._q_apply(ts.q_target, next_obs, a2).min(0) - alpha * logp2
        y = reward + cfg.gamma * (1.0 - done) * q2

        def q_loss_fn(q_params):
            q = self._q_apply(q_params, obs, action)       # (2, batch)
            return ((q - y[None, :]) ** 2).mean(), q.mean()

        (q_loss, mean_q), q_grads = jax.value_and_grad(
            q_loss_fn, has_aux=True)(ts.q_params)

        def actor_loss_fn(actor_params):
            mean, log_std = self.actor.apply(actor_params, obs)
            a_pi, logp_pi = sample_squashed(ka, mean, log_std)
            q_pi = self._q_apply(ts.q_params, obs, a_pi).min(0)
            return (alpha * logp_pi - q_pi).mean(), logp_pi.mean()

        (actor_loss, mean_logp), a_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True)(ts.actor_params)

        def alpha_loss_fn(log_alpha):
            return -(jnp.exp(log_alpha)
                     * (jax.lax.stop_gradient(mean_logp)
                        + self.target_entropy))

        alpha_loss, al_grad = jax.value_and_grad(alpha_loss_fn)(ts.log_alpha)

        # mask everything until warmup transitions are in the buffer
        ready = (ts.buffer.size >= self.cfg.warmup).astype(jnp.float32)
        scale = lambda g: jax.tree.map(lambda x: x * ready, g)

        q_updates, q_opt = self.q_tx.update(scale(q_grads), ts.q_opt,
                                            ts.q_params)
        q_params = optax.apply_updates(ts.q_params, q_updates)
        a_updates, actor_opt = self.actor_tx.update(scale(a_grads),
                                                    ts.actor_opt,
                                                    ts.actor_params)
        actor_params = optax.apply_updates(ts.actor_params, a_updates)
        al_updates, alpha_opt = self.alpha_tx.update(al_grad * ready,
                                                     ts.alpha_opt,
                                                     ts.log_alpha)
        log_alpha = optax.apply_updates(ts.log_alpha, al_updates)

        tau = cfg.tau * ready
        q_target = jax.tree.map(lambda t, p: t + tau * (p - t),
                                ts.q_target, q_params)

        metrics = dict(q_loss=q_loss, actor_loss=actor_loss,
                       alpha=jnp.exp(log_alpha), mean_q=mean_q,
                       entropy=-mean_logp,
                       buffer_size=ts.buffer.size.astype(jnp.float32))
        ts = ts._replace(actor_params=actor_params, q_params=q_params,
                         q_target=q_target, log_alpha=log_alpha,
                         actor_opt=actor_opt, q_opt=q_opt,
                         alpha_opt=alpha_opt,
                         update_count=ts.update_count + 1)
        return ts, metrics

    # ------------------------------------------------------ demo collection
    def collect(self, ts: SACState, env_state, obs, key, policy_fn,
                steps: int):
        """Fill the replay ring with ``steps`` env steps from an arbitrary
        policy — demonstration seeding (SACfD-style warm start from e.g. a
        trained PPO actor). No gradient updates; same aligned chunk inserts
        as train_step, so it jits into one scan. ``policy_fn(key, obs) ->
        action`` must be traceable."""
        def one(carry, _):
            ts, env_state, obs, key = carry
            key, ka = jax.random.split(key)
            action = policy_fn(ka, obs)
            env_state2, out = self.env.step(env_state, action)
            done = (out.terminated | out.truncated)[:, None] | out.done
            flat = lambda x: x.reshape((self.chunk,) + x.shape[2:])
            buf = self._insert(ts.buffer, flat(obs), flat(action),
                               flat(out.reward), flat(out.obs),
                               flat(done.astype(jnp.float32)))
            return (ts._replace(buffer=buf), env_state2, out.obs, key), None

        (ts, env_state, obs, key), _ = jax.lax.scan(
            one, (ts, env_state, obs, key), None, length=steps)
        return ts, env_state, obs, key

    # ----------------------------------------------------------- train step
    def train_step(self, ts: SACState, env_state, obs, key):
        """steps_per_call x [env step -> insert -> update]. Pure; jit with
        donate_argnums=(0, 1) so buffer and env state update in place."""
        def one(carry, _):
            ts, env_state, obs, key = carry
            key, ka, ku = jax.random.split(key, 3)
            mean, log_std = self.actor.apply(ts.actor_params, obs)
            action, _ = sample_squashed(ka, mean, log_std)
            env_state2, out = self.env.step(env_state, action)
            done = (out.terminated | out.truncated)[:, None] | out.done
            flat = lambda x: x.reshape((self.chunk,) + x.shape[2:])
            buf = self._insert(ts.buffer, flat(obs), flat(action),
                               flat(out.reward), flat(out.obs),
                               flat(done.astype(jnp.float32)))
            ts, metrics = self._update(ts._replace(buffer=buf), ku)
            metrics["mean_reward"] = out.reward.mean()
            return (ts, env_state2, out.obs, key), metrics

        (ts, env_state, obs, key), metrics = jax.lax.scan(
            one, (ts, env_state, obs, key), None,
            length=self.cfg.steps_per_call)
        return ts, env_state, obs, key, jax.tree.map(lambda x: x[-1], metrics)

    # ------------------------------------------------------------- sharding
    def jit_train_step(self, mesh=None, model_kind: str = "sac"):
        """jit the train step, optionally with mesh shardings (same contract
        as PPOLearner.jit_train_step): env batch AND the HBM replay ring
        sharded over 'data', actor params on the 'sac' TP rule, twin-stacked
        Q params on 'sac_q' (feature-dim megatron splits behind the twin
        axis — parallel/mesh.py). The ring's row axis is a chunk multiple of
        the env batch, so each insert's dynamic_update_slice block nests
        inside one data shard whenever dp divides n_chunks; sampling is one
        cross-shard row gather per update (256x129 floats — params-scale
        traffic, negligible next to the rollout)."""
        if mesh is None:
            return jax.jit(self.train_step, donate_argnums=(0, 1))
        from .mesh import (data_sharding, hybrid_data_sharding,
                           param_shardings, replicate)
        # shard-local NPC tier conds in the rollout (see PPOLearner)
        if self.env.mesh is not mesh:
            self.env = self.env.with_mesh(mesh)

        def fn(ts, env_state, obs, key):
            return self.train_step(ts, env_state, obs, key)

        dsh = hybrid_data_sharding(mesh) if "replica" in mesh.axis_names \
            else data_sharding(mesh)
        rep = replicate(mesh)

        def shard_ts(ts: SACState) -> SACState:
            ash = param_shardings(mesh, ts.actor_params, model_kind)
            qsh = param_shardings(mesh, ts.q_params, "sac_q")
            buf = ts.buffer
            row = lambda x: jax.device_put(x, dsh)   # (C, ...) ring rows
            return ts._replace(
                actor_params=jax.tree.map(jax.device_put, ts.actor_params, ash),
                q_params=jax.tree.map(jax.device_put, ts.q_params, qsh),
                q_target=jax.tree.map(jax.device_put, ts.q_target, qsh),
                log_alpha=jax.device_put(ts.log_alpha, rep),
                actor_opt=jax.device_put(ts.actor_opt, rep),
                q_opt=jax.device_put(ts.q_opt, rep),
                alpha_opt=jax.device_put(ts.alpha_opt, rep),
                buffer=ReplayBuffer(
                    obs=row(buf.obs), action=row(buf.action),
                    reward=row(buf.reward), next_obs=row(buf.next_obs),
                    done=row(buf.done),
                    ptr=jax.device_put(buf.ptr, rep),
                    size=jax.device_put(buf.size, rep)),
                update_count=jax.device_put(ts.update_count, rep))

        def shard_env(env_state, obs):
            put = lambda x: jax.device_put(x, dsh)
            return jax.tree.map(put, env_state), jax.device_put(obs, dsh)

        return jax.jit(fn, donate_argnums=(0, 1)), shard_ts, shard_env
