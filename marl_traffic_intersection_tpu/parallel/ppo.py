"""PPO learner over the batched env: one fully-jitted train step.

Net-new learner side of the TPU framework (the reference ships no training
code). One ``train_step`` fuses rollout + GAE + minibatched clipped-PPO update
into a single XLA program:

  - rollout: ``lax.scan`` over T env steps; policy forward is one batched
    matmul stack over (B_envs x N_agents) decisions — MXU work;
  - GAE: reverse ``lax.scan``;
  - update: epochs x minibatches via ``lax.scan``; minibatches slice the time
    axis so the env-batch axis keeps its ``data`` sharding (no all-to-all);
  - distribution: the loss mean contracts the sharded batch axis, so XLA
    inserts the gradient psum over ICI automatically — no explicit pmean.

Every agent is treated as an independent decision-maker with a shared policy
(standard parameter-shared MARL); per-agent rewards come straight from the env.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..envs.vector import VectorEnv
from ..models.actor_critic import logp_and_entropy, sample_action


@dataclass(frozen=True)
class PPOConfig:
    rollout_len: int = 128
    update_epochs: int = 4
    num_minibatches: int = 4   # minibatches slice the time axis
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    critic_warmup: int = 0     # train_step calls with the actor loss masked
                               # (fresh-critic fine-tunes, e.g. MAPPO warm
                               # starts from a decentralized checkpoint)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    update_count: jnp.ndarray


class Transition(NamedTuple):
    obs: jnp.ndarray        # (B, N, 127)
    raw_action: jnp.ndarray # (B, N, 2) pre-tanh
    logp: jnp.ndarray       # (B, N)
    value: jnp.ndarray      # (B, N)
    reward: jnp.ndarray     # (B, N)
    ep_done: jnp.ndarray    # (B,) episode boundary (terminated|truncated)
    agent_done: jnp.ndarray # (B, N) per-agent done (crash->respawn / success)
    status: jnp.ndarray     # (B, N) i32 per-agent STATUS_*


class PPOLearner:
    def __init__(self, vec_env: VectorEnv, model, cfg: PPOConfig = PPOConfig()):
        self.env = vec_env
        self.model = model
        self.cfg = cfg
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr),
        )

    def init(self, key) -> TrainState:
        obs_dim = 127
        if getattr(self.model, "needs_agent_axis", False):
            # centralized-critic families pool over the agent axis (-2);
            # param shapes are agent-count-independent, so init with the
            # env's N only for trace validity
            n = self.env.env.config.num_agents
            init_obs = jnp.zeros((1, n, obs_dim), jnp.float32)
        else:
            init_obs = jnp.zeros((1, obs_dim), jnp.float32)
        params = self.model.init(key, init_obs)
        return TrainState(params=params, opt_state=self.tx.init(params),
                          update_count=jnp.int32(0))

    # ------------------------------------------------------------------ rollout
    def _rollout(self, params, env_state, obs, key):
        def step_fn(carry, _):
            env_state, obs, key = carry
            key, ka = jax.random.split(key)
            mean, log_std, value = self.model.apply(params, obs)
            action, raw = sample_action(ka, mean, log_std)
            logp, _ = logp_and_entropy(mean, log_std, raw)
            env_state2, out = self.env.step(env_state, action)
            tr = Transition(obs=obs, raw_action=raw, logp=logp, value=value,
                            reward=out.reward,
                            ep_done=out.terminated | out.truncated,
                            agent_done=out.done,
                            status=out.status)
            return (env_state2, out.obs, key), tr

        (env_state, obs, key), traj = jax.lax.scan(
            step_fn, (env_state, obs, key), None, length=self.cfg.rollout_len)
        _, _, last_value = self.model.apply(params, obs)
        return env_state, obs, key, traj, last_value

    # ---------------------------------------------------------------------- gae
    def _gae(self, traj: Transition, last_value):
        cfg = self.cfg
        # Value-bootstrap cuts at episode ends AND per-agent done events: a
        # crash respawns the agent at its spawn (reference semantics), so the
        # next state starts a new "life" — bootstrapping across it would
        # credit the fresh spawn's value to the pre-crash action.
        done = traj.ep_done[..., None] | traj.agent_done       # (T, B, N)
        done_f = done.astype(jnp.float32)

        def back(carry, inp):
            gae, next_value = carry
            reward, value, d = inp
            nonterm = 1.0 - d
            delta = reward + cfg.gamma * next_value * nonterm - value
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterm * gae
            return (gae, value), gae

        (_, _), advs = jax.lax.scan(
            back, (jnp.zeros_like(last_value), last_value),
            (traj.reward, traj.value, done_f),
            reverse=True)
        return advs, advs + traj.value

    # ------------------------------------------------------------------- update
    def _loss(self, params, batch, actor_on=1.0):
        cfg = self.cfg
        obs, raw, old_logp, adv, ret, old_value = batch
        mean, log_std, value = self.model.apply(params, obs)
        logp, entropy = logp_and_entropy(mean, log_std, raw)
        ratio = jnp.exp(logp - old_logp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv_n
        pg2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv_n
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_clip = old_value + jnp.clip(value - old_value, -cfg.clip_eps, cfg.clip_eps)
        v_loss = 0.5 * jnp.maximum((value - ret) ** 2, (v_clip - ret) ** 2).mean()
        ent = entropy.mean()
        # actor_on gates the policy terms (critic-warmup phases); traced, so
        # flipping it never recompiles
        total = actor_on * (pg_loss - cfg.ent_coef * ent) + cfg.vf_coef * v_loss
        metrics = dict(pg_loss=pg_loss, v_loss=v_loss, entropy=ent,
                       approx_kl=(old_logp - logp).mean())
        return total, metrics

    def _update(self, ts: TrainState, traj: Transition, advs, rets, key):
        cfg = self.cfg
        T = cfg.rollout_len
        mb = cfg.num_minibatches
        assert T % mb == 0

        data = (traj.obs, traj.raw_action, traj.logp, advs, rets, traj.value)

        def epoch(carry, _):
            ts, key = carry
            key, kp = jax.random.split(key)
            perm = jax.random.permutation(kp, T)  # shuffle time only: env axis
            shuffled = jax.tree.map(lambda x: x[perm], data)  # keeps data sharding
            mbs = jax.tree.map(
                lambda x: x.reshape(mb, T // mb, *x.shape[1:]), shuffled)

            def minibatch(ts, batch):
                # update_count ticks per minibatch; critic_warmup is in
                # train_step units
                per_step = cfg.update_epochs * cfg.num_minibatches
                actor_on = (ts.update_count
                            >= cfg.critic_warmup * per_step).astype(jnp.float32)
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(ts.params, batch, actor_on)
                updates, opt_state = self.tx.update(grads, ts.opt_state, ts.params)
                params = optax.apply_updates(ts.params, updates)
                return TrainState(params, opt_state, ts.update_count + 1), metrics

            ts, metrics = jax.lax.scan(minibatch, ts, mbs)
            return (ts, key), metrics

        (ts, _), metrics = jax.lax.scan(epoch, (ts, key), None,
                                        length=cfg.update_epochs)
        return ts, jax.tree.map(lambda x: x.mean(), metrics)

    # --------------------------------------------------------------- train step
    def train_step(self, ts: TrainState, env_state, obs, key):
        """One rollout + PPO update. Pure; jit/shard at will."""
        key, kr, ku = jax.random.split(key, 3)
        env_state, obs, _, traj, last_value = self._rollout(ts.params, env_state,
                                                            obs, kr)
        advs, rets = self._gae(traj, last_value)
        ts, metrics = self._update(ts, traj, advs, rets, ku)
        from ..core.constants import (STATUS_CRASH_CAR, STATUS_CRASH_LINE,
                                      STATUS_CRASH_WALL, STATUS_SUCCESS)
        st = traj.status
        metrics = dict(metrics,
                       mean_reward=traj.reward.mean(),
                       mean_value=traj.value.mean(),
                       success_rate=(st == STATUS_SUCCESS).mean(),
                       crash_rate=((st == STATUS_CRASH_CAR)
                                   | (st == STATUS_CRASH_WALL)
                                   | (st == STATUS_CRASH_LINE)).mean())
        return ts, env_state, obs, key, metrics

    def jit_train_step(self, mesh=None, model_kind: str = "mlp"):
        """jit the train step, optionally with mesh shardings: env batch on
        'data', params on 'model' per param_shardings."""
        if mesh is None:
            return jax.jit(self.train_step)
        from .mesh import (data_sharding, hybrid_data_sharding,
                           param_shardings, replicate)
        # bind the mesh into the venv so the rollout's NPC tier conds are
        # shard-local (traffic mode stays collective-free under the mesh —
        # envs/vector.py VectorEnv docstring); no-op re-bind if already bound
        if self.env.mesh is not mesh:
            self.env = self.env.with_mesh(mesh)

        def fn(ts, env_state, obs, key):
            return self.train_step(ts, env_state, obs, key)

        # multi-slice hybrid mesh: batch spans the DCN replica axis too
        dsh = hybrid_data_sharding(mesh) if "replica" in mesh.axis_names \
            else data_sharding(mesh)
        rep = replicate(mesh)

        def shard_ts(ts):
            psh = param_shardings(mesh, ts.params, model_kind)
            return TrainState(
                params=jax.tree.map(jax.device_put, ts.params, psh),
                opt_state=jax.device_put(ts.opt_state, rep),
                update_count=jax.device_put(ts.update_count, rep),
            )

        def shard_env(env_state, obs):
            put = lambda x: jax.device_put(x, dsh)
            return jax.tree.map(put, env_state), jax.device_put(obs, dsh)

        return jax.jit(fn, donate_argnums=(1,)), shard_ts, shard_env
