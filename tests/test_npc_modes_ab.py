"""Fast-vs-exact NPC mode: distributional A/B at batch scale.

`npc_mode='fast'` (one synchronous planning pass) is the training default;
`'exact'` reproduces the reference's sequential same-tick visibility. This
test pins that the two modes produce the same MACROSCOPIC traffic behavior
— spawn throughput, steady-state population, speed profile, collision-kill
rate — under identical injected spawn streams, with explicit tolerances.
The step-level divergence mechanism (same-tick pose deltas <= v_max px) is
bounded separately by test_npc.py::test_fast_mode_tracks_exact_mode; the
at-scale 1024x2000 TPU comparison lives in docs/NPC_MODES.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
from marl_traffic_intersection_tpu.envs.vector import VectorEnv

B = 64
STEPS = 500
DENSITY = 1.0


def _traffic_stats(mode: str, seed: int = 0):
    env = IntersectionEnv(EnvConfig(num_agents=1, traffic_flow=True,
                                    traffic_density=DENSITY, npc_mode=mode,
                                    max_steps=10 ** 9))
    venv = VectorEnv(env, num_envs=B, auto_reset=False)
    state, _ = jax.jit(venv.reset)(jax.random.PRNGKey(seed))
    acts = jnp.zeros((B, 1, 2))  # parked egos: pure NPC dynamics A/B

    def body(carry, _):
        state, prev_alive = carry
        state, out = venv.step(state, acts)
        alive = state.npc.alive                                # (B, M)
        spawns = (alive & ~prev_alive).sum()
        removals = (prev_alive & ~alive).sum()
        pop = alive.sum()
        v_sum = jnp.where(alive, state.npc.v, 0.0).sum()
        return (state, alive), (spawns, removals, pop, v_sum)

    @jax.jit
    def run(state):
        (state, _), outs = jax.lax.scan(
            body, (state, state.npc.alive), None, length=STEPS)
        return [o.sum() for o in outs[:2]] + [outs[2], outs[3]]

    spawns, removals, pop_t, v_t = jax.block_until_ready(run(state))
    pop_t = np.asarray(pop_t, np.float64)
    v_t = np.asarray(v_t, np.float64)
    # steady-state window (skip fill-up transient)
    w = slice(STEPS // 2, None)
    return dict(
        spawns=float(spawns),
        removals=float(removals),
        mean_pop=float(pop_t[w].mean() / B),
        mean_speed=float(v_t[w].sum() / np.maximum(pop_t[w].sum(), 1.0)),
    )


def test_fast_mode_matches_exact_distributionally():
    a = _traffic_stats("exact")
    b = _traffic_stats("fast")
    # identical spawn-decision streams (same keys); success can differ only
    # through blocking-position deltas — must stay within a few percent
    assert a["spawns"] > B * 2, a  # the A/B actually exercised traffic
    assert abs(a["spawns"] - b["spawns"]) / a["spawns"] < 0.05, (a, b)
    assert abs(a["removals"] - b["removals"]) / max(a["removals"], 1) < 0.06, (a, b)
    assert abs(a["mean_pop"] - b["mean_pop"]) / a["mean_pop"] < 0.05, (a, b)
    assert abs(a["mean_speed"] - b["mean_speed"]) / a["mean_speed"] < 0.05, (a, b)
