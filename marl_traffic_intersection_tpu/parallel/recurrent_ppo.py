"""Truncated-BPTT PPO for the recurrent (GRU) model family.

Differences from the feedforward learner (ppo.py):

  - the rollout scan carries the GRU hidden state, zeroing it at agent life
    boundaries (crash respawn / success / episode auto-reset) so memory never
    leaks across lives;
  - the pre-step hidden state of every timestep is stored in the trajectory;
  - minibatches are **contiguous time chunks** (not shuffled timesteps):
    each chunk replays the GRU from its stored entry hidden state
    (stop-gradient — standard truncated BPTT), so gradients flow through up
    to chunk_len steps of memory. Chunk *order* is shuffled per epoch.

Sharding story is unchanged: chunks slice the time axis, the env-batch axis
keeps its ``data`` sharding, the hidden state is (B, N, H) and shards with
the batch. One fully-jitted train step.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.actor_critic import logp_and_entropy, sample_action
from .ppo import PPOConfig, PPOLearner, TrainState


class RecTransition(NamedTuple):
    obs: jnp.ndarray        # (B, N, 127)
    h_in: jnp.ndarray       # (B, N, H) pre-step hidden
    raw_action: jnp.ndarray # (B, N, 2)
    logp: jnp.ndarray       # (B, N)
    value: jnp.ndarray      # (B, N)
    reward: jnp.ndarray     # (B, N)
    ep_done: jnp.ndarray    # (B,)
    agent_done: jnp.ndarray # (B, N)
    done: jnp.ndarray       # (B, N) combined: resets the hidden next step
    status: jnp.ndarray     # (B, N)


class RecurrentPPOLearner(PPOLearner):
    """PPOLearner with a GRU policy. ``train_step(ts, env_state, obs, h, key)``."""

    def init(self, key) -> TrainState:
        obs = jnp.zeros((1, 127), jnp.float32)
        h = self.model.initial_hidden(1)
        params = self.model.init(key, obs, h)
        return TrainState(params=params, opt_state=self.tx.init(params),
                          update_count=jnp.int32(0))

    def initial_hidden(self):
        return self.model.initial_hidden(self.env.num_envs,
                                         self.env.env.config.num_agents)

    # ------------------------------------------------------------------ rollout
    def _rollout(self, params, env_state, obs, h, key):
        def step_fn(carry, _):
            env_state, obs, h, key = carry
            key, ka = jax.random.split(key)
            mean, log_std, value, h2 = self.model.apply(params, obs, h)
            action, raw = sample_action(ka, mean, log_std)
            logp, _ = logp_and_entropy(mean, log_std, raw)
            env_state2, out = self.env.step(env_state, action)
            done = out.done | (out.terminated | out.truncated)[:, None]
            h_next = h2 * (1.0 - done.astype(jnp.float32))[..., None]
            tr = RecTransition(obs=obs, h_in=h, raw_action=raw, logp=logp,
                               value=value, reward=out.reward,
                               ep_done=out.terminated | out.truncated,
                               agent_done=out.done, done=done,
                               status=out.status)
            return (env_state2, out.obs, h_next, key), tr

        (env_state, obs, h, key), traj = jax.lax.scan(
            step_fn, (env_state, obs, h, key), None,
            length=self.cfg.rollout_len)
        _, _, last_value, _ = self.model.apply(params, obs, h)
        return env_state, obs, h, key, traj, last_value

    # --------------------------------------------------------------- chunk loss
    def _loss(self, params, batch, actor_on=1.0):
        cfg = self.cfg
        obs, h0, done, raw, old_logp, adv, ret, old_value = batch
        # replay the GRU over the chunk from the (stop-gradient) entry hidden
        def scan_fn(h, inp):
            obs_t, done_t = inp
            mean, log_std, value, h2 = self.model.apply(params, obs_t, h)
            h_next = h2 * (1.0 - done_t.astype(jnp.float32))[..., None]
            # log_std is state-independent (shape (2,)); broadcast so the
            # stacked (chunk, ...) leaves line up with mean's batch dims
            return h_next, (mean, jnp.broadcast_to(log_std, mean.shape), value)

        _, (mean, log_std, value) = jax.lax.scan(
            scan_fn, jax.lax.stop_gradient(h0), (obs, done))
        logp, entropy = logp_and_entropy(mean, log_std, raw)
        ratio = jnp.exp(logp - old_logp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv_n
        pg2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv_n
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_clip = old_value + jnp.clip(value - old_value,
                                      -cfg.clip_eps, cfg.clip_eps)
        v_loss = 0.5 * jnp.maximum((value - ret) ** 2, (v_clip - ret) ** 2).mean()
        ent = entropy.mean()
        # actor_on gates the policy terms (PPOConfig.critic_warmup), same
        # contract as the base learner
        total = (actor_on * (pg_loss - cfg.ent_coef * ent)
                 + cfg.vf_coef * v_loss)
        metrics = dict(pg_loss=pg_loss, v_loss=v_loss, entropy=ent,
                       approx_kl=(old_logp - logp).mean())
        return total, metrics

    # ------------------------------------------------------------------- update
    def _update(self, ts: TrainState, traj: RecTransition, advs, rets, key):
        cfg = self.cfg
        T = cfg.rollout_len
        mb = cfg.num_minibatches
        assert T % mb == 0
        chunk = T // mb

        def to_chunks(x):  # (T, ...) -> (mb, chunk, ...)
            return x.reshape(mb, chunk, *x.shape[1:])

        data = (to_chunks(traj.obs),
                traj.h_in[::chunk],                 # (mb, B, N, H) entry hiddens
                to_chunks(traj.done),
                to_chunks(traj.raw_action), to_chunks(traj.logp),
                to_chunks(advs), to_chunks(rets), to_chunks(traj.value))

        def epoch(carry, _):
            ts, key = carry
            key, kp = jax.random.split(key)
            perm = jax.random.permutation(kp, mb)   # shuffle chunk order only
            shuffled = jax.tree.map(lambda x: x[perm], data)

            def minibatch(ts, batch):
                per_step = cfg.update_epochs * cfg.num_minibatches
                actor_on = (ts.update_count >= cfg.critic_warmup
                            * per_step).astype(jnp.float32)
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(ts.params, batch, actor_on)
                updates, opt_state = self.tx.update(grads, ts.opt_state,
                                                    ts.params)
                params = optax.apply_updates(ts.params, updates)
                return TrainState(params, opt_state,
                                  ts.update_count + 1), metrics

            ts, metrics = jax.lax.scan(minibatch, ts, shuffled)
            return (ts, key), metrics

        (ts, _), metrics = jax.lax.scan(epoch, (ts, key), None,
                                        length=cfg.update_epochs)
        return ts, jax.tree.map(lambda x: x.mean(), metrics)

    # --------------------------------------------------------------- train step
    def train_step(self, ts: TrainState, env_state, obs, h, key):
        key, kr, ku = jax.random.split(key, 3)
        env_state, obs, h, _, traj, last_value = self._rollout(
            ts.params, env_state, obs, h, kr)
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
        return ts, env_state, obs, h, key, metrics

    def jit_train_step(self, mesh=None, model_kind: str = "gru"):
        if mesh is None:
            return jax.jit(self.train_step, donate_argnums=(1, 3))
        from .mesh import (data_sharding, hybrid_data_sharding,
                           param_shardings, replicate)
        # Bind the mesh into the venv (same rebind as PPO/SAC): traffic-mode
        # NPC tier predicates become shard-local under shard_map instead of
        # per-step cross-device all-reduces.
        if self.env.mesh is not mesh:
            self.env = self.env.with_mesh(mesh)

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

        def shard_env(env_state, obs, h):
            put = lambda x: jax.device_put(x, dsh)
            return jax.tree.map(put, env_state), put(obs), put(h)

        return (jax.jit(self.train_step, donate_argnums=(1, 3)),
                shard_ts, shard_env)
