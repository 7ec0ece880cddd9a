"""Analytic road geometry and line-mask tests, vectorized for TPU.

The reference keeps three implementations of the road shape (analytic
RoadGeometry.h:19-58, pixel RoadMask.cpp:43-71 [dead code], and the renderer);
only the analytic one drives simulation, so that is what we implement — as
pure, broadcastable jnp functions usable under vmap/jit.

The yellow-line pixel mask (reference: cpp/LineMask.cpp:47-72) is a 750x750
uint8 grid of 8 axis-aligned thickness-2 segments. Instead of materializing
the grid and paying a gather per query, we express it analytically: the drawn
pixels are exactly two 3-px-wide vertical bands (x in [cx-3, cx-1] and
[cx+1, cx+3]) over y in [0, cy-stop] u [cy+stop, H-1], and the transpose for
horizontal bands. This is bit-identical to the rasterized mask (verified by
tests/test_geometry.py against a direct rasterization).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import CORNER_RADIUS, HEIGHT, LANE_WIDTH_PX, WIDTH

_CX = np.float32(WIDTH * 0.5)
_CY = np.float32(HEIGHT * 0.5)


def is_on_road(x, y, num_lanes: int = 3):
    """Analytic on-road test (reference: cpp/RoadGeometry.h:19-58).

    road = (vertical strip u horizontal strip u 4 corner squares) \\ 4 grass circles.
    Accepts float arrays of any broadcastable shape; returns bool array.
    """
    rw = np.float32(num_lanes * LANE_WIDTH_PX)
    cr = np.float32(CORNER_RADIUS)
    r2 = cr * cr

    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)

    # Grass circles subtract first (inside => off-road)
    gx = jnp.asarray([_CX - rw - cr, _CX + rw + cr, _CX - rw - cr, _CX + rw + cr], jnp.float32)
    gy = jnp.asarray([_CY - rw - cr, _CY - rw - cr, _CY + rw + cr, _CY + rw + cr], jnp.float32)
    dx = x[..., None] - gx
    dy = y[..., None] - gy
    in_grass = jnp.any(dx * dx + dy * dy <= r2, axis=-1)

    in_vertical = (x >= _CX - rw) & (x <= _CX + rw)
    in_horizontal = (y >= _CY - rw) & (y <= _CY + rw)

    in_x_band = ((x >= _CX - rw - cr) & (x <= _CX - rw)) | ((x >= _CX + rw) & (x <= _CX + rw + cr))
    in_y_band = ((y >= _CY - rw - cr) & (y <= _CY - rw)) | ((y >= _CY + rw) & (y <= _CY + rw + cr))
    in_corner = in_x_band & in_y_band

    return (~in_grass) & (in_vertical | in_horizontal | in_corner)


def off_road_grid_fast(x, y, num_lanes: int = 3):
    """``~is_on_road`` specialized for integer-valued float coords (lidar grid).

    Bit-exact to ``~is_on_road(x, y)`` whenever ``x``/``y`` are integer-valued
    float32 (the lidar samples are ``int()``-truncated pixel coords,
    cpp/Lidar.cpp:34-35): every quantity below is an integer (or integer sum
    of squares) well under 2**24, so all f32 arithmetic is exact. Folding the
    4-fold symmetry about the canvas center turns the reference's four
    grass-circle tests (RoadGeometry.h:19-58) into ONE distance test against
    the nearest circle center, and the corner-square bands into two compares —
    roughly halving the per-sample op count on the lidar hot path.
    """
    rw = np.float32(num_lanes * LANE_WIDTH_PX)
    cr = np.float32(CORNER_RADIUS)
    d = rw + cr                      # circle-center offset from canvas center
    r2 = cr * cr
    ax = jnp.abs(x - _CX)
    ay = jnp.abs(y - _CY)
    gx = ax - d
    gy = ay - d
    in_grass = gx * gx + gy * gy <= r2
    # (ax<=rw) | (ay<=rw) | corner-band: the band's lower bounds (ax>=rw) are
    # redundant under the union — if ax<rw the vertical strip already covers.
    # min/max-folded: (ax<=rw)|(ay<=rw) == min(ax,ay)<=rw and
    # (ax<=d)&(ay<=d) == max(ax,ay)<=d — two ops fewer per sample, decisions
    # identical (coords are finite; min/max on f32 are exact).
    on_rect = (jnp.minimum(ax, ay) <= rw) | (jnp.maximum(ax, ay) <= d)
    return in_grass | ~on_rect


def hits_yellow_line(x, y, num_lanes: int = 3):
    """Analytic center-line test (reference: cpp/RoadGeometry.h:60-67)."""
    rw = np.float32(num_lanes * LANE_WIDTH_PX)
    gap = np.float32(2.0)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    v = (jnp.abs(x - _CX) <= gap) & (jnp.abs(y - _CY) > rw)
    h = (jnp.abs(y - _CY) <= gap) & (jnp.abs(x - _CX) > rw)
    return v | h


def is_line_pixel(xi, yi, num_lanes: int = 3):
    """Pixel-exact yellow-line mask test on integer coordinates.

    Equivalent to LineMask::is_line (reference: cpp/LineMask.h:15-18 with the
    grid of cpp/LineMask.cpp:47-72): thickness-2 (half=1) segments drawn at
    cx±2 / cy±2, stopping ``rw + cr`` from the center. Out-of-bounds queries
    return False. Inputs are int32 arrays (callers must truncate floats toward
    zero first, matching the C++ ``int()`` casts at IntersectionEnv.cpp:262-277).
    """
    cx = WIDTH // 2
    cy = HEIGHT // 2
    rw = int(num_lanes * int(LANE_WIDTH_PX))
    cr = int(CORNER_RADIUS)
    stop = rw + cr

    xi = jnp.asarray(xi, jnp.int32)
    yi = jnp.asarray(yi, jnp.int32)

    in_bounds = (xi >= 0) & (xi < WIDTH) & (yi >= 0) & (yi < HEIGHT)

    # Vertical bands: lines at x = cx-2 and x = cx+2, each dilated by ±1 px.
    vband = ((xi >= cx - 3) & (xi <= cx - 1)) | ((xi >= cx + 1) & (xi <= cx + 3))
    # y spans [0, cy-stop] and [cy+stop, HEIGHT-1] inclusive (the y=HEIGHT
    # endpoint of the drawn segment is clipped by set_px bounds checking).
    vspan = (yi <= cy - stop) | (yi >= cy + stop)

    hband = ((yi >= cy - 3) & (yi <= cy - 1)) | ((yi >= cy + 1) & (yi <= cy + 3))
    hspan = (xi <= cx - stop) | (xi >= cx + stop)

    return in_bounds & ((vband & vspan) | (hband & hspan))


def road_obstacle_mask(num_lanes: int = 3) -> np.ndarray:
    """Pixel obstacle grid (1 = obstacle/grass, 0 = road).

    Parity port of the reference RoadMask (cpp/RoadMask.cpp:43-71): full-white
    grid, road cross cut out, four corner squares cut out; the corner grass
    circles are deliberately NOT re-applied (see the reference's comment at
    RoadMask.cpp:64-70). NOTE: this component is dead code in the reference —
    ``is_obstacle`` is never called (SURVEY.md §2 #5); the analytic
    ``is_on_road`` drives lidar/collision there and here. Provided for
    component parity and debug visualization.
    """
    grid = np.ones((HEIGHT, WIDTH), dtype=np.uint8)
    cx, cy = WIDTH // 2, HEIGHT // 2
    rw = int(round(num_lanes * LANE_WIDTH_PX))
    cr = int(round(CORNER_RADIUS))
    grid[:, cx - rw:cx + rw] = 0
    grid[cy - rw:cy + rw, :] = 0
    for x0, y0 in ((cx - rw - cr, cy - rw - cr), (cx + rw, cy - rw - cr),
                   (cx - rw - cr, cy + rw), (cx + rw, cy + rw)):
        grid[max(0, y0):y0 + cr, max(0, x0):x0 + cr] = 0
    return grid


def is_obstacle_pixel(xi, yi, num_lanes: int = 3):
    """Analytic equivalent of RoadMask::is_obstacle (cpp/RoadMask.h:15-18):
    out-of-bounds returns False (ray breaks, not a hit); otherwise inverse of
    the cross+corner-squares road cutout (no grass circles)."""
    cx, cy = WIDTH // 2, HEIGHT // 2
    rw = int(round(num_lanes * LANE_WIDTH_PX))
    cr = int(round(CORNER_RADIUS))
    xi = jnp.asarray(xi, jnp.int32)
    yi = jnp.asarray(yi, jnp.int32)
    in_bounds = (xi >= 0) & (xi < WIDTH) & (yi >= 0) & (yi < HEIGHT)
    in_cross = ((xi >= cx - rw) & (xi < cx + rw)) | ((yi >= cy - rw) & (yi < cy + rw))
    in_x = ((xi >= cx - rw - cr) & (xi < cx - rw)) | ((xi >= cx + rw) & (xi < cx + rw + cr))
    in_y = ((yi >= cy - rw - cr) & (yi < cy - rw)) | ((yi >= cy + rw) & (yi < cy + rw + cr))
    road = in_cross | (in_x & in_y)
    return in_bounds & ~road


def rasterize_line_mask(num_lanes: int = 3) -> np.ndarray:
    """Direct rasterization of the reference LineMask grid, for tests/rendering.

    Mirrors cpp/LineMask.cpp:14-72 exactly (host-side numpy; not used on the
    device hot path).
    """
    grid = np.zeros((HEIGHT, WIDTH), dtype=np.uint8)
    cx, cy = WIDTH // 2, HEIGHT // 2
    rw = int(num_lanes * int(LANE_WIDTH_PX))
    cr = int(CORNER_RADIUS)
    stop = rw + cr
    half = 1  # thickness 2 -> half = 1

    def vline(x, y0, y1):
        ya, yb = min(y0, y1), max(y0, y1)
        for xx in range(x - half, x + half + 1):
            if 0 <= xx < WIDTH:
                grid[max(0, ya): min(HEIGHT, yb + 1), xx] = 1

    def hline(y, x0, x1):
        xa, xb = min(x0, x1), max(x0, x1)
        for yy in range(y - half, y + half + 1):
            if 0 <= yy < HEIGHT:
                grid[yy, max(0, xa): min(WIDTH, xb + 1)] = 1

    vline(cx - 2, 0, cy - stop)
    vline(cx + 2, 0, cy - stop)
    vline(cx - 2, HEIGHT, cy + stop)
    vline(cx + 2, HEIGHT, cy + stop)
    hline(cy - 2, 0, cx - stop)
    hline(cy + 2, 0, cx - stop)
    hline(cy - 2, WIDTH, cx + stop)
    hline(cy + 2, WIDTH, cx + stop)
    return grid
