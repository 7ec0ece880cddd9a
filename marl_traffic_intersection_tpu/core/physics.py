"""Kinematic bicycle physics, OBB corners, SAT collision, path following.

Pure float32 jnp functions designed for vmap over agents and envs. The
reference semantics (cpp/Car.cpp:9-141) carry several bit-match-critical
quirks which are reproduced deliberately:

  1. ``acc = throttle * MAX_ACC``; steering is first-order-lagged toward the
     target with fixed gain 0.2 *per call*, not per second (Car.cpp:12-15).
  2. Exact-zero throttle triggers a 0.95 speed decay — a float equality test
     (Car.cpp:17-19).
  3. Only the speed update uses ``dt``; heading and position integrate per
     call without dt (Car.cpp:22, 27-30, 38-39) — callers substep to get
     real-time behavior (reference test.py:144-156).
  4. Speed clamped to [0, 8 px/frame]; heading wrapped to [-pi, pi); turning
     only when |v| > 0.1 (Car.cpp:23-35).
  5. Screen y is down but headings are y-up: ``y -= v * sin(heading)``
     (Car.cpp:39).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (
    CAR_LENGTH,
    CAR_WIDTH,
    MAX_ACC,
    MAX_STEERING_ANGLE,
    PHYSICS_MAX_SPEED,
    PI_F,
    WHEELBASE,
)

_PI = np.float32(PI_F)
_TWO_PI = np.float32(2.0) * _PI


def mul_unfused(a, b):
    """f32 product with its OWN rounding step (no FMA contraction) on CPU.

    The reference is built for baseline x86-64 (no FMA): every ``a*b + c``
    rounds the product and the sum separately. XLA's CPU backend lets LLVM
    contract the pair into a single-rounding FMA — a 1-ulp pose/sample drift
    per step that the lockstep suite surfaces as the EXACTNESS.md float
    tails. LLVM contracts even across ``optimization_barrier`` and
    f32<->s32 bitcast round-trips (verified empirically); routing the
    product through a data-dependent select is the one in-fusion pattern
    the emitter cannot look through. The TPU VPU rounds mul and add
    separately already (EXACTNESS.md device table), so the TPU hot path
    keeps the clean fused form.

    The select is VALUE-PRESERVING — finite products pass through
    bit-for-bit, ±Inf propagates exactly, NaN propagates (canonical
    payload) — but it is NOT a foldable identity: the untaken branch
    computes ``inf * sign(p)``, which LLVM cannot prove equal to p, so the
    select survives optimization and the mul feeding the add keeps its own
    rounding. (A plain ``where(isnan(p), nan, p)`` is a value identity and
    LLVM folds it away, silently resuming contraction — caught by the
    jit-vs-eager contraction canary in tests/test_physics.py, which fails
    loudly if any future compiler learns to fold this form too.)

    Platform dispatch happens at LOWERING time (``lax.platform_dependent``),
    not trace time: code explicitly compiled for CPU from a TPU-attached
    process (``jit(..., backend='cpu')``) still gets the guard, and the TPU
    lowering stays select-free (the guard would cost a few VPU ops per
    element on the roofline-bound lidar sample grid).
    """
    p = a * b

    def _guarded(q):
        return jnp.where(jnp.isfinite(q), q,
                         jnp.float32(jnp.inf) * jnp.sign(q))

    return jax.lax.platform_dependent(p, cpu=_guarded, default=lambda q: q)


def wrap_angle(a):
    """Wrap to [-pi, pi) with C ``fmod`` truncation semantics (Car.cpp:33-35)."""
    a = jnp.fmod(a + _PI, _TWO_PI)
    a = jnp.where(a < 0.0, a + _TWO_PI, a)
    return a - _PI


class CarPhysicsOut(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    v: jnp.ndarray
    heading: jnp.ndarray
    steering_angle: jnp.ndarray
    acc: jnp.ndarray


def car_physics_step(x, y, v, heading, steering_angle, throttle, steer, dt,
                     exact_trig: bool = False,
                     exact_acc: bool = False) -> CarPhysicsOut:
    """One physics tick, matching Car::update exactly (cpp/Car.cpp:9-40).

    All inputs are float32 arrays of a common broadcast shape (typically (N,)).

    exact_trig=True evaluates tan/cos/sin through ops/exact_trig.py — bit
    replicas of the host libm the compiled reference calls — instead of the
    device's transcendentals. This closes the last TPU-vs-oracle pose-drift
    tail (EXACTNESS.md: the chip's trig is ~1 ulp off glibc's, which over
    2000 steps flipped one config-4 lidar pixel). Opt-in: the emulated-f64
    trig costs ~10^4 VPU flops per evaluation, fine for single-env
    exactness verification, not for the 4096-env training path.
    """
    f32 = jnp.float32
    if exact_trig:
        from ..ops.exact_trig import (_div32, cosf_exact, sinf_exact,
                                      tanf_exact)
        _sin, _cos, _tan = sinf_exact, cosf_exact, tanf_exact
        _div = _div32   # TPU f32 division is a reciprocal refinement,
        #                 not IEEE-rounded; the reference's divss is
    else:
        _sin, _cos, _tan = jnp.sin, jnp.cos, jnp.tan
        _div = jnp.divide
    throttle = jnp.asarray(throttle, f32)
    steer = jnp.asarray(steer, f32)
    dt = jnp.asarray(dt, f32)

    # exact_acc barrier: with both MAX_ACC and dt compile-time constants,
    # XLA algsimp merges (throttle*15)*dt into one multiply by 0.25
    # whenever acc is single-use — the NPC path discards out.acc, so its v
    # update silently lost the reference's separate acc rounding (found by
    # the NPC-v bitstream diff; the EGO path was safe only because acc
    # also feeds the smooth reward). Gated on the exactness modes: the
    # barrier also blocks fusion in the hot step (~5% headline cost), and
    # the default training path never promised the last NPC-v ulp.
    acc = throttle * f32(MAX_ACC)
    if exact_acc:
        acc = jax.lax.optimization_barrier(acc)
    # mul_unfused on every a*b feeding an add OR sub: pins the reference's
    # separate product rounding on CPU (g++ baseline ISA emits no FMA; see
    # docstring). The target_steering product feeds the lag subtraction —
    # unguarded, LLVM contracts `steer*MAX - steering` into one fma and the
    # steering chain (trig-free, so otherwise bit-reproducible) drifts by
    # ulps, which the smooth reward term surfaces (EXACTNESS.md).
    target_steering = mul_unfused(steer, f32(MAX_STEERING_ANGLE))
    steering_angle = steering_angle + mul_unfused(
        target_steering - steering_angle, f32(0.2))

    # Exact float equality on throttle == 0 (Car.cpp:17-19)
    v = jnp.where(throttle == f32(0.0), v * f32(0.95), v)

    v = v + mul_unfused(acc, dt)
    v = jnp.clip(v, f32(0.0), f32(PHYSICS_MAX_SPEED))

    ang_vel = mul_unfused(_div(v, f32(WHEELBASE)), _tan(steering_angle))
    heading = jnp.where(jnp.abs(v) > f32(0.1), heading + ang_vel, heading)
    heading = wrap_angle(heading)

    x = x + mul_unfused(v, _cos(heading))
    y = y - mul_unfused(v, _sin(heading))
    return CarPhysicsOut(x, y, v, heading, steering_angle, acc)


def car_corners(x, y, heading, length=CAR_LENGTH, width=CAR_WIDTH):
    """OBB corner positions, shape (..., 4, 2) in reference order (Car.cpp:86-103)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    heading = jnp.asarray(heading, jnp.float32)
    hx = np.float32(width * 0.5)   # half width  (local 'ly' magnitude)
    hy = np.float32(length * 0.5)  # half length (local 'lx' magnitude)
    # Local (lx, ly) per corner: (hy,hx), (hy,-hx), (-hy,-hx), (-hy,hx)
    lx = jnp.asarray([hy, hy, -hy, -hy], jnp.float32)
    ly = jnp.asarray([hx, -hx, -hx, hx], jnp.float32)
    c = jnp.cos(heading)[..., None]
    s = jnp.sin(heading)[..., None]
    wx = x[..., None] + lx * c - ly * s
    wy = y[..., None] + lx * s + ly * c
    return jnp.stack([wx, wy], axis=-1)


def sat_overlap(corners_a, heading_a, corners_b, heading_b):
    """Separating-axis OBB collision test (reference: cpp/Car.cpp:105-141).

    corners_*: (..., 4, 2); heading_*: (...,). Returns bool (...,). The four
    separating axes are the two cars' body axes, exactly as the reference.
    """
    heading_a, heading_b = jnp.broadcast_arrays(
        jnp.asarray(heading_a, jnp.float32), jnp.asarray(heading_b, jnp.float32))
    ca, sa = jnp.cos(heading_a), jnp.sin(heading_a)
    cb, sb = jnp.cos(heading_b), jnp.sin(heading_b)
    axes = jnp.stack(
        [
            jnp.stack([ca, sa], axis=-1),
            jnp.stack([-sa, ca], axis=-1),
            jnp.stack([cb, sb], axis=-1),
            jnp.stack([-sb, cb], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 2)

    # Project both corner sets on each axis: (..., axes=4, corners=4).
    # Explicit mul+add instead of einsum: a dot_general would ride the MXU,
    # whose default bf16 pass rounds the operands — collision decisions near
    # the boundary would silently diverge from the f32 reference on TPU.
    def proj(corners):
        return (corners[..., None, :, 0] * axes[..., :, None, 0]
                + corners[..., None, :, 1] * axes[..., :, None, 1])

    pa = proj(corners_a)
    pb = proj(corners_b)
    min_a, max_a = pa.min(axis=-1), pa.max(axis=-1)
    min_b, max_b = pb.min(axis=-1), pb.max(axis=-1)
    separated = (max_a < min_b) | (max_b < min_a)  # (..., 4)
    return ~jnp.any(separated, axis=-1)


def update_path_index(path, path_len, path_index, x, y, search_range: int = 50):
    """Windowed nearest-point path-index update (reference: cpp/Car.cpp:47-74).

    path: (..., P, 2) gathered per-car path polyline; path_len: scalar or (...,)
    number of valid points; path_index: (...,) int32 current index; x, y: (...,)
    position. Searches only ``search_range`` points forward of the current
    index, first-minimum tie-break (argmin matches the reference's strict ``<``).

    TPU note: computes distances to ALL P points and masks to the window
    instead of gathering the 50-point window — dynamic gathers are slow on
    TPU while the dense (..., P) sweep is pure VPU work and fuses.
    """
    path_index = jnp.maximum(path_index, 0)
    P = path.shape[-2]
    iota = jnp.arange(P, dtype=jnp.int32)
    in_window = (iota >= path_index[..., None]) & \
                (iota < path_index[..., None] + search_range) & \
                (iota < jnp.asarray(path_len, jnp.int32))
    dx = path[..., 0] - x[..., None]
    dy = path[..., 1] - y[..., None]
    d = dx * dx + dy * dy
    d = jnp.where(in_window, d, jnp.inf)
    # first-minimum over the window == reference's ascending strict-< scan
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def gather_rows_matmul(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row-gather as a one-hot matmul: TPU gathers of table rows are slow,
    while a (..., R) x (R, D) contraction rides the MXU. table: (R, ...).

    Precision is pinned to float32: the TPU MXU's default single-bf16-pass
    matmul rounds the *values* (up to ~2 px error on 750-px path coords,
    silently breaking reference parity on device — CPU-side lockstep tests
    cannot catch it). float32 (bf16x3/x6 passes) keeps one-hot row selection
    bit-exact; these contractions are far from the step's critical path.
    """
    r = table.shape[0]
    flat = table.reshape(r, -1)
    oh = jax.nn.one_hot(idx, r, dtype=flat.dtype)
    out = jnp.matmul(oh, flat, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + table.shape[1:])
