"""Route/path generation: unit tests + differential tests vs the C++ oracle."""
import numpy as np
import pytest

from marl_traffic_intersection_tpu.core import routes as R
from marl_traffic_intersection_tpu.core.constants import PATH_LEN


def test_layout_shape():
    for lanes in (2, 3):
        layout = R.build_lane_layout(lanes)
        assert len(layout["points"]) == 2 * 4 * lanes
        assert layout["dir_order"] == ["N", "E", "S", "W"]
        # IN_1 is the first N in-lane, offset 21 px left of center
        assert layout["points"]["IN_1"] == (375.0 - 21.0, 30.0)


def test_intents():
    layout = R.build_lane_layout(3)
    # N->S is straight, N->E left, N->W right (compass heading semantics)
    assert R.determine_intent(layout, "IN_1", "OUT_7") == R.INTENT_STRAIGHT
    assert R.determine_intent(layout, "IN_1", "OUT_4") == R.INTENT_LEFT
    assert R.determine_intent(layout, "IN_1", "OUT_10") == R.INTENT_RIGHT
    # same-direction fallback is LEFT (RouteGen.cpp:86)
    assert R.determine_intent(layout, "IN_1", "OUT_1") == R.INTENT_LEFT


def test_route_table_shapes():
    t = R.build_route_table(3)
    assert t.paths.shape == (144, PATH_LEN, 2)
    assert t.paths.dtype == np.float32
    assert t.traffic_route_ids.shape == (24,)  # straight + left per 12 in-lanes
    rid = t.route_id("IN_6", "OUT_2")
    s, e = t.route_name(rid)
    assert (s, e) == ("IN_6", "OUT_2")


@pytest.mark.oracle
def test_layout_points_vs_oracle():
    from .oracle import oracle as O

    for lanes in (2, 3):
        layout = R.build_lane_layout(lanes)
        for name, (x, y) in layout["points"].items():
            ox, oy = O.layout_point(lanes, name)
            assert (np.float32(x), np.float32(y)) == (ox, oy), name


@pytest.mark.oracle
def test_all_paths_vs_oracle():
    from .oracle import oracle as O

    for lanes in (2, 3):
        layout = R.build_lane_layout(lanes)
        n = 4 * lanes
        for si in range(n):
            for ei in range(n):
                start, end = f"IN_{si+1}", f"OUT_{ei+1}"
                ref_path, ref_intent = O.gen_path(lanes, start, end)
                intent = R.determine_intent(layout, start, end)
                assert intent == ref_intent, (start, end)
                path = R.generate_path(layout, lanes, intent, start, end)
                # Bit-exact for EVERY intent: straight/left are pure f32
                # arithmetic in reference op order, and right-turn arcs call
                # the host libm's cosf/sinf (what std::cos(float) resolves to).
                same = path.view(np.uint32) == np.asarray(ref_path, np.float32).view(np.uint32)
                assert same.all(), (start, end, np.abs(path - ref_path).max())


@pytest.mark.oracle
def test_traffic_routes_order_vs_oracle():
    """NPC spawn route list must match the reference order exactly
    (route_choice indices are injected into both sides)."""
    from .oracle import oracle as O

    for lanes in (2, 3):
        env = O.OracleEnv(num_lanes=lanes)
        ref = env.traffic_routes()
        layout = R.build_lane_layout(lanes)
        mine = R.default_traffic_routes(layout)
        assert mine == ref


@pytest.mark.oracle
def test_spawn_heading_vs_oracle():
    from .oracle import oracle as O

    t = R.build_route_table(3)
    # Spawn heading is atan2f on the first path segment — bit-exact via the
    # host-libm call in build_route_table (cpp/IntersectionEnv.cpp:88-92).
    for (start, end) in [("IN_6", "OUT_2"), ("IN_1", "OUT_7"), ("IN_1", "OUT_10"),
                         ("IN_3", "OUT_12"), ("IN_9", "OUT_6"), ("IN_12", "OUT_5")]:
        rid = t.route_id(start, end)
        env = O.OracleEnv(num_lanes=3)
        env.reset([(start, end)])
        ego = env.egos()[0]
        assert np.float32(t.spawn_heading[rid]).view(np.uint32) == np.float32(ego[3]).view(np.uint32), (start, end)
        assert (float(t.spawn_xy[rid, 0]), float(t.spawn_xy[rid, 1])) == (float(ego[0]), float(ego[1]))


def test_all_routes_step_smoke():
    """Every one of the 144 route ids resets and steps without NaNs and with
    sane geometry (spawn on-road, heading finite)."""
    import jax
    import jax.numpy as jnp
    from marl_traffic_intersection_tpu import EnvConfig, IntersectionEnv
    from marl_traffic_intersection_tpu.core.geometry import is_on_road

    env = IntersectionEnv(EnvConfig(num_agents=1))
    t = env.table
    assert np.isfinite(t.paths).all()
    assert np.isfinite(t.spawn_heading).all()
    on = np.asarray(is_on_road(t.spawn_xy[:, 0], t.spawn_xy[:, 1]))
    assert on.all()

    # batch all 144 routes as one vmapped reset+step
    rids = jnp.arange(t.paths.shape[0], dtype=jnp.int32)[:, None]  # (144, 1)
    keys = jax.random.split(jax.random.PRNGKey(0), t.paths.shape[0])
    states = jax.vmap(lambda k, r: env.reset_state(k, r))(keys, rids)
    st2, out = jax.vmap(lambda s: env.step(s, jnp.full((1, 2), 0.5)))(states)
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.reward)).all()
