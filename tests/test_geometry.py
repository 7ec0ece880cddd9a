"""Road geometry / line mask: exhaustive pixel tests vs rasterization + oracle."""
import numpy as np
import pytest

from marl_traffic_intersection_tpu.core import geometry as G
from marl_traffic_intersection_tpu.core.constants import HEIGHT, WIDTH


def test_line_mask_analytic_equals_raster():
    """The analytic is_line_pixel must be bit-identical to a direct
    rasterization of the reference drawing commands, over every pixel."""
    for lanes in (2, 3):
        grid = G.rasterize_line_mask(lanes)
        ys, xs = np.mgrid[0:HEIGHT, 0:WIDTH]
        got = np.asarray(G.is_line_pixel(xs.astype(np.int32), ys.astype(np.int32), lanes))
        assert np.array_equal(got, grid.astype(bool))


def test_is_on_road_basics():
    # center of intersection is road; far corner is grass
    assert bool(G.is_on_road(375.0, 375.0))
    assert not bool(G.is_on_road(5.0, 5.0))
    # out-of-canvas but inside the strip extension is still "road" analytically
    assert bool(G.is_on_road(375.0, -50.0))


@pytest.mark.oracle
def test_on_road_vs_oracle_grid():
    from .oracle import oracle as O

    rng = np.random.RandomState(0)
    pts = np.concatenate([
        rng.uniform(-50, 800, size=(4000, 2)).astype(np.float32),
        # dense sampling near all boundary radii/edges
        rng.uniform(120, 260, size=(2000, 2)).astype(np.float32),
    ])
    for lanes in (2, 3):
        mine = np.asarray(G.is_on_road(pts[:, 0], pts[:, 1], lanes))
        ref = np.array([O.on_road(lanes, float(x), float(y)) for x, y in pts], bool)
        assert np.array_equal(mine, ref)


@pytest.mark.oracle
def test_yellow_line_vs_oracle():
    from .oracle import oracle as O

    rng = np.random.RandomState(1)
    pts = rng.uniform(0, 750, size=(3000, 2)).astype(np.float32)
    near = np.stack([
        375.0 + rng.uniform(-4, 4, 3000),
        rng.uniform(0, 750, 3000),
    ], axis=1).astype(np.float32)
    allpts = np.concatenate([pts, near, near[:, ::-1]])
    for lanes in (2, 3):
        mine = np.asarray(G.hits_yellow_line(allpts[:, 0], allpts[:, 1], lanes))
        ref = np.array([O.yellow_line(lanes, float(x), float(y)) for x, y in allpts], bool)
        assert np.array_equal(mine, ref)


@pytest.mark.oracle
def test_line_pixel_vs_oracle_sampled():
    from .oracle import oracle as O

    rng = np.random.RandomState(2)
    xs = np.concatenate([rng.randint(-10, 760, 2000), 375 + rng.randint(-6, 7, 500)])
    ys = np.concatenate([rng.randint(-10, 760, 2000), 375 + rng.randint(-6, 7, 500)])
    for lanes in (2, 3):
        mine = np.asarray(G.is_line_pixel(xs.astype(np.int32), ys.astype(np.int32), lanes))
        ref = np.array([O.line_pixel(lanes, int(x), int(y)) for x, y in zip(xs, ys)], bool)
        assert np.array_equal(mine, ref)


def test_off_road_grid_fast_matches_is_on_road():
    """The symmetry-folded lidar road test must be bit-identical to
    ~is_on_road on every integer-valued coordinate a lidar sample can take
    (canvas plus the 250px-range overshoot band)."""
    for lanes in (2, 3):
        coords = np.arange(-300, WIDTH + 300, dtype=np.float32)
        xs, ys = np.meshgrid(coords, coords)
        ref = ~np.asarray(G.is_on_road(xs, ys, lanes))
        got = np.asarray(G.off_road_grid_fast(xs, ys, lanes))
        assert np.array_equal(got, ref)
