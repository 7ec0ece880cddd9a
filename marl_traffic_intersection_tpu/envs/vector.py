"""Batched environment: vmap over a leading env axis, with auto-reset.

This is the net-new scaling axis of the TPU rebuild (the reference is strictly
single-instance — SURVEY.md §2): thousands of independent intersections step
in lockstep under one jit. Each env instance is fully independent, so stepping
needs zero cross-device communication; shard the env axis over a mesh's
``data`` axis (see parallel/mesh.py) and collectives only appear in the
learner.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import DT_DEFAULT
from ..core.env import EnvState, IntersectionEnv, StepOutput


def _tiers(cfg, m: int):
    """The NPC slot-prefix tier ladder shared by ``_stepped``/``_observed``.

    npc_tier == 0 disables tiering, > 0 pins one tier, < 0 (auto) uses two
    nested tiers [m//4, m//2] (at density 1.0 the steady state is ~2-4 alive
    with a measured batch max of 6 over 1024 envs, so the m//4 = 8-slot
    program runs nearly every tick). Tiers outside (0, m) are dropped.
    """
    if cfg.npc_tier == 0:
        tiers = []
    elif cfg.npc_tier > 0:
        tiers = [cfg.npc_tier]
    else:
        tiers = [m // 4, m // 2]
    return sorted({t for t in tiers if 0 < t < m})


class VectorEnv:
    """vmap-batched IntersectionEnv.

    route_pool: int32 array of route ids egos are sampled from at (auto-)reset.
    Defaults to the reference's default ego-route mapping (utils.py:29-52).

    mesh: optional ``jax.sharding.Mesh``. When given, ``step`` runs under
    ``jax.shard_map`` with the env batch split over the mesh's data axes
    (``('replica','data')`` on a hybrid mesh, else ``'data'``), which makes
    the NPC slot-prefix tier decision SHARD-LOCAL: each device reduces the
    tier predicate over its own batch shard and picks its own ``lax.cond``
    branch, so the traffic-mode step stays collective-free under the mesh
    (no per-step cross-device all-reduce, no globally synchronized cond —
    one hot env on one device no longer forces every device to the
    full-width program). Without a mesh the behavior is unchanged. Results
    are bitwise identical either way: every tier branch is bitwise equal to
    the full-width program (tests/test_npc_tier.py), so which branch each
    device picks cannot affect the output.
    """

    def __init__(self, env: IntersectionEnv, num_envs: int,
                 route_pool: Optional[np.ndarray] = None, auto_reset: bool = True,
                 mesh=None):
        self.env = env
        self.num_envs = num_envs
        self.auto_reset = auto_reset
        if route_pool is None:
            from ..core.routes import default_ego_routes
            pool = env.table.route_ids(
                default_ego_routes(max(env.config.num_agents, 12), env.config.num_lanes))
            route_pool = np.unique(pool)
        self.route_pool = jnp.asarray(route_pool, jnp.int32)
        self.mesh = mesh
        if mesh is not None:
            axes = tuple(a for a in ("replica", "data") if a in mesh.axis_names)
            assert axes, f"mesh has no replica/data axis: {mesh.axis_names}"
            self._data_axes = axes
            n_shards = int(np.prod([mesh.shape[a] for a in axes]))
            assert num_envs % n_shards == 0, (
                f"num_envs={num_envs} must divide over {n_shards} data shards")

    def with_mesh(self, mesh) -> "VectorEnv":
        """A copy of this VectorEnv bound to ``mesh`` (see class docstring)."""
        return VectorEnv(self.env, self.num_envs,
                         route_pool=np.asarray(self.route_pool),
                         auto_reset=self.auto_reset, mesh=mesh)

    # single-env reset (state only) with routes sampled from the pool.
    # Sampled WITHOUT replacement when the pool allows: duplicate routes mean
    # identical spawn points -> agents overlap at spawn and crash-respawn-crash
    # forever (the default route pool has one route per IN lane, so distinct
    # routes guarantee distinct spawns).
    def _reset_state_one(self, key) -> EnvState:
        krt, kst = jax.random.split(key)
        n = self.env.config.num_agents
        pool = self.route_pool
        p = pool.shape[0]
        if p < n:
            rids = jax.random.choice(krt, pool, (n,), replace=True)
        else:
            # uniform n-subset without replacement via n rounds of masked
            # argmin over iid uniforms (same distribution as
            # jax.random.choice(replace=False), which lowers to a full sort —
            # XLA stages (B, pool) sort copies in every auto-reset step)
            u = jax.random.uniform(krt, (p,))
            rows = []
            taken = jnp.zeros((p,), bool)
            for _ in range(n):
                d = jnp.where(taken, jnp.inf, u)
                oh = d == jnp.min(d)
                oh &= jnp.cumsum(oh.astype(jnp.int32)) == 1
                taken |= oh
                rows.append(jnp.sum(jnp.where(oh, pool, 0), dtype=jnp.int32))
            rids = jnp.stack(rows)
        return self.env.reset_state(kst, rids)

    def reset(self, key) -> Tuple[EnvState, jnp.ndarray]:
        """Batched reset. Returns (state, obs) with leading dim num_envs."""
        keys = jax.random.split(key, self.num_envs)
        state = jax.vmap(self._reset_state_one)(keys)
        return state, jax.vmap(self.env.observe)(state)

    # --------------------------------------------- NPC slot-prefix tiering
    #
    # NPC spawns always write the FIRST free slot (core/npc.py npc_try_spawn),
    # so the alive set concentrates in a low slot prefix: at density 1.0 the
    # steady state is ~4 alive of 32 slots and a slot index >= 16 requires 17
    # simultaneously-alive NPCs in one env — essentially never. When no env in
    # the batch can touch a tail slot this tick, stepping a [:, :tier] slice
    # of the NPC pool is bitwise identical to the full-width program (dead
    # slots only ever contribute through alive-masked reductions, and the
    # step never writes a dead slot), while the ghost-scan planning tensors
    # (tier^2*160 vs M^2*160), the NPC-NPC SAT matrix, the interaction graph,
    # and the lidar/neighbor obstacle sets all shrink ~4x. A batch-level
    # lax.cond picks the full program whenever (a) any tail slot is alive or
    # (b) any env's first `tier` slots are all occupied (a spawn could then
    # write a tail slot). Exactness is unconditional: the fallback IS the
    # full program. (VERDICT r2 task 1: cheaper exact conflict test.)

    def _stepped(self, state: EnvState, actions, dt, with_obs: bool):
        step_fn = jax.vmap(partial(self.env.step, dt=dt, with_obs=with_obs))
        cfg = self.env.config
        if not cfg.traffic_flow:
            return step_fn(state, actions)
        tiers = _tiers(cfg, state.npc.alive.shape[1])

        def run_sliced(st, tier):
            small = st._replace(npc=jax.tree.map(
                lambda a: a[:, :tier] if a.ndim >= 2 else a, st.npc))
            ns, out = step_fn(small, actions)
            # tail slots are untouched by the step under the predicate
            npc_full = jax.tree.map(
                lambda s, o: jnp.concatenate([s, o[:, tier:]], axis=1)
                if o.ndim >= 2 else s,
                ns.npc, st.npc)
            return ns._replace(npc=npc_full), out

        def run(remaining, st):
            if not remaining:
                return step_fn(st, actions)
            tier = remaining[0]
            alive = st.npc.alive
            too_big = jnp.any(alive[:, tier:]) | \
                jnp.any(jnp.all(alive[:, :tier], axis=-1))
            return jax.lax.cond(
                too_big,
                lambda s: run(remaining[1:], s),
                lambda s: run_sliced(s, tier),
                st)

        return run(tiers, state)

    def _observed(self, state: EnvState):
        """Batched observe with the same NPC slot-prefix tiering as
        ``_stepped``: the neighbor pool only reads alive slots, so when no
        env has an alive NPC beyond the smallest tier the (B, N, n+M)
        neighbor sweep runs on the sliced pool bitwise-identically
        (profiling: observe was ~2.5 ms of the 6.5 ms B=4096 traffic step
        — the largest stage left outside the cond)."""
        obs_fn = jax.vmap(self.env.observe)
        cfg = self.env.config
        if not cfg.traffic_flow:
            return obs_fn(state)
        tiers = _tiers(cfg, state.npc.alive.shape[1])

        def run(remaining, st):
            if not remaining:
                return obs_fn(st)
            tier = remaining[0]
            # observe never spawns, so (unlike _stepped) a full head prefix
            # cannot push writes into the tail: alive-beyond-tier is the
            # whole predicate
            too_big = jnp.any(st.npc.alive[:, tier:])
            return jax.lax.cond(
                too_big,
                lambda s: run(remaining[1:], s),
                lambda s: obs_fn(s._replace(npc=jax.tree.map(
                    lambda a: a[:, :tier] if a.ndim >= 2 else a, s.npc))),
                st)

        return run(tiers, state)

    def jit_step(self, dt=DT_DEFAULT, donate: bool = True):
        """Jitted per-call step for eager driving loops.

        Donating the state argument lets XLA update the (large, B-leading)
        EnvState buffers in place instead of copying them in and out each
        call — the dominant cost of the non-scan path (PERF.md). The caller
        must not reuse the state object passed in (the usual
        ``state, out = step(state, actions)`` pattern is safe).
        """
        fn = partial(self.step, dt=dt)
        return jax.jit(fn, donate_argnums=(0,) if donate else ())

    def step(self, state: EnvState, actions, dt=DT_DEFAULT,
             final_obs: bool = False):
        """Batched step; actions (B, N, 2). Auto-resets finished envs.

        final_obs=True additionally returns the TERMINAL observation of the
        stepped (pre-reset) state as a third value — the gymnasium SAME_STEP
        autoreset contract needs it for truncation bootstrapping. Costs one
        extra observe over the batch; the default path stays single-observe.

        With a bound mesh the whole body runs under ``jax.shard_map`` over
        the data axes (every input/output leaf is per-env with a leading
        batch dim), so the tier conds reduce over the local shard only.
        """
        if self.mesh is None:
            return self._step_body(state, actions, dt, final_obs)
        from jax.sharding import PartitionSpec as P
        spec = P(self._data_axes)
        body = lambda st, acts: self._step_body(st, acts, dt, final_obs)
        return jax.shard_map(body, mesh=self.mesh, in_specs=(spec, spec),
                             out_specs=spec)(state, actions)

    def _step_body(self, state: EnvState, actions, dt, final_obs: bool):
        if not self.auto_reset:
            return self._stepped(state, actions, dt, with_obs=True)

        # step without obs, merge in fresh states for finished envs, then
        # build the observation once on the merged state (equivalent to
        # observing stepped and fresh states separately, at half the cost)
        new_state, out = self._stepped(state, actions, dt, with_obs=False)
        ep_done = out.terminated | out.truncated                  # (B,)
        reset_keys = jax.vmap(lambda k: jax.random.split(k)[1])(new_state.key)
        fresh_state = jax.vmap(self._reset_state_one)(reset_keys)

        def pick(a, b):
            mask = ep_done.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(mask, a, b)

        merged = jax.tree.map(pick, fresh_state, new_state)
        obs = self._observed(merged)
        if final_obs:
            term_obs = self._observed(new_state)
            return merged, out._replace(obs=obs), term_obs
        return merged, out._replace(obs=obs)
