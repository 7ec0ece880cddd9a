# Attribution / licensing: this file is a derived work of the GNU C Library
# (glibc) 2.36 math routines. The atan2f/atanf kernels and their
# polynomial/table constants below originate from glibc's
# sysdeps/ieee754/flt-32 implementations (derived from Sun's fdlibm,
# Copyright (C) 1993 by Sun Microsystems; glibc portions Copyright (C)
# 1993-2022 Free Software Foundation, Inc.), licensed under the GNU Lesser
# General Public License v2.1 or later (LGPL-2.1-or-later). Constants were
# decoded from this host's /lib/x86_64-linux-gnu/libm.so.6 (Debian GLIBC
# 2.36) .rodata and the control flow from its disassembly. To the extent
# this file reproduces glibc's expression of those algorithms, it is
# distributed under the same LGPL-2.1-or-later terms. Derived files: this
# module (ops/exact_libm.py) and ops/exact_trig.py.
"""Bit replicas of the host libm functions in the reward/observation path.

The C++ reference oracle's reward and obs builders call three libm-backed
float routines the device (and XLA) compute differently by a ulp:

  * ``hypotf`` — `compute_progress` (/root/reference/cpp/IntersectionEnv.cpp:18,22);
    glibc 2.36 computes ``(float) sqrt ((double) x*x + (double) y*y)``
    (verified bit-identical to this host's libm over 20M samples —
    scripts/verify_exact_libm.py). Replicated on emulated f64
    (ops/softfloat.py: exact squares, one 53-bit add rounding, correctly-
    rounded ``d_sqrt``, one cvtsd2ss rounding — the double-rounding of the
    float result is part of the contract and is replicated, not fixed).
  * ``atan2f`` — the obs builder's `angle_to_target`
    (/root/reference/cpp/IntersectionEnv.cpp:452). glibc 2.36 routes finite
    args to the classic fdlibm float kernel (``__atan2f_finite`` at
    libm+0x39ff0 calling ``atanf`` at +0x3f430 — decoded from this host's
    libm.so.6 disassembly): all-f32 branch logic + one f32 division +
    an 11-coefficient odd polynomial with 4-entry atanhi/atanlo tables.
    Pure f32 arithmetic — no emulated f64 needed.
  * ``sqrtf`` — `d_dst` and neighbor distances
    (/root/reference/cpp/IntersectionEnv.cpp:455,475). IEEE correctly
    rounded on the host (hardware sqrtss); XLA:CPU matches, the TPU's f32
    sqrt (like its divide) is a refinement that can land a ulp off, so
    ``sqrtf_exact`` picks among {q, q±ulp} by exact residual comparison
    (mirrors exact_trig._div32).

All functions are elementwise over f32 arrays and jit/vmap-safe. The f32
mul/add chains in ``atanf_exact`` route products through
``physics.mul_unfused`` so LLVM cannot FMA-contract pairs the host libm's
SSE code rounds separately (the TPU rounds separately natively).

Scope (asserted by scripts/verify_exact_libm.py, documented): finite f32
inputs with magnitudes in {0} ∪ [2^-90, 2^60] and |y/x| in [2^-90, 2^90]
for atan2f (the Dekker-split low words and two_prod error terms inside
_div32/sqrtf correction must stay clear of the f32 subnormal floor under
FTZ; glibc hypotf's overflow-scaling branch is not replicated). XLA:CPU compiles with FTZ/DAZ, so f32-subnormal
inputs/intermediates flush — the same reason softfloat.py carries an
explicit exponent. Env quantities are O(1e-4)..O(1e3) with exponent gaps
under ~30 bits: nowhere near any of these edges, and the lockstep suite
exercises the real distribution end-to-end.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.physics import mul_unfused
from .exact_trig import _div32
from .softfloat import (d_add, d_from_f32, d_mul, d_sqrt, d_to_f32, two_prod,
                        two_sum)

_F = jnp.float32
_I = jnp.int32


def _bits(x):
    return jax.lax.bitcast_convert_type(jnp.asarray(x, _F), _I)


def _from_bits(i):
    return jax.lax.bitcast_convert_type(jnp.asarray(i, _I), _F)


def _c(u: int):
    """f32 constant from its exact bit pattern (libm .rodata values)."""
    return jnp.asarray(np.array(u, np.uint32).view(np.float32))


def _mul(a, b):
    return mul_unfused(a, b)


# ------------------------------------------------------------------ sqrtf
@jax.jit
def sqrtf_exact(x):
    """IEEE-correctly-rounded f32 sqrt for x >= 0 on every backend.

    XLA:CPU lowers to hardware sqrtss (already correct); the TPU's
    refinement-based sqrt can land up to ~2 ulps off (measured on device —
    a single-neighbor pass left obs[4] one ulp wrong on ~1.5% of steps), so
    run THREE passes of pick-the-better-neighbor, each choosing among
    {q, q±ulp} the candidate minimizing the EXACT |x - q^2| via error-free
    transforms; ties to even (mirrors exact_trig._div32). Each pass
    corrects one ulp of error, so the result is exact for any seed within
    3 ulps of the true root. Midpoint ties (x == mid^2 exactly) round to
    the even neighbor, which is exactly what minimize-then-even yields."""
    x = jnp.asarray(x, _F)
    # scale tiny/huge inputs into a frame where q^2 and its two_prod error
    # term stay normal (the Dekker split is meaningless on subnormals):
    # sqrt(x * 2^±48) * 2^∓24 — both scalings exact, and the sqrt result
    # (>= 2^-74.5 for any f32 subnormal input) never lands subnormal, so
    # the single result rounding happens inside the corrected frame.
    tiny_in = x < _F(2.0 ** -64)
    huge_in = x > _F(2.0 ** 64)
    xs = jnp.where(tiny_in, x * _F(2.0 ** 48),
                   jnp.where(huge_in, x * _F(2.0 ** -48), x))
    unscale = jnp.where(tiny_in, _F(2.0 ** -24),
                        jnp.where(huge_in, _F(2.0 ** 24), _F(1.0)))
    x = xs
    q0 = jnp.sqrt(x)

    def _next(q, up):
        b = _bits(q)
        return _from_bits(jnp.where(up, b + 1, b - 1))

    def resid(q):
        p, e = two_prod(q, q)
        s0, s1 = two_sum(x, -p)
        t0, t1 = two_sum(s1, -e)
        return s0, t0, t1

    def abs_leq(r1, r2):
        # |r1| <= |r2| via exact difference of absolute values
        def sgn(r):
            a0, a1, a2 = r
            return jnp.where(a0 != 0, jnp.sign(a0),
                             jnp.where(a1 != 0, jnp.sign(a1), jnp.sign(a2)))
        sa, sb = sgn(r1), sgn(r2)
        from .softfloat import renorm
        d = renorm([r1[0] * sa, r1[1] * sa, r1[2] * sa,
                    -r2[0] * sb, -r2[1] * sb, -r2[2] * sb], out_n=3)
        lead = jnp.where(d[0] != 0, d[0], jnp.where(d[1] != 0, d[1], d[2]))
        return lead <= 0

    def _pass(q):
        # take a neighbor when its residual is strictly smaller, or equal
        # with the neighbor holding the even significand (RN-even on ties)
        qu, qd = _next(q, True), _next(q, False)
        r0, ru, rd = resid(q), resid(qu), resid(qd)
        even0 = (_bits(q) & 1) == 0
        take_up = abs_leq(ru, r0) & ((~abs_leq(r0, ru)) | ~even0)
        q1 = jnp.where(take_up, qu, q)
        r1 = jax.tree.map(lambda a, b: jnp.where(take_up, a, b), ru, r0)
        even1 = (_bits(q1) & 1) == 0
        take_dn = abs_leq(rd, r1) & ((~abs_leq(r1, rd)) | ~even1)
        return jnp.where(take_dn, qd, q1)

    q = _pass(_pass(_pass(q0)))
    # exact zero / special handling: sqrt(0)=0, sqrt(inf)=inf, nan->nan
    exact = (x == 0) | ~jnp.isfinite(x)
    return jnp.where(exact, q0, q) * unscale


# ----------------------------------------------------------------- hypotf
def _hypotf_soft(x, y):
    """Emulated-f64 path (TPU): each emulated op rounds exactly where the
    host's f64 chain rounds — the squares are exact (24-bit operands), the
    sum rounds once to 53 bits, sqrt rounds once to 53 bits, the final
    conversion rounds once to f32."""
    dx, dy = d_from_f32(x), d_from_f32(y)
    s = d_add(d_mul(dx, dx), d_mul(dy, dy))
    out = d_to_f32(d_sqrt(s))
    # d_to_f32 requires a normal-range result; hypot(0,0)=0 bypasses
    return jnp.where((x == 0) & (y == 0), _F(0.0), out)


def _hypotf_host(x, y):
    """Host-callback path (CPU): the identical f64 arithmetic on hardware
    IEEE doubles. XLA:CPU cannot execute the inlined softfloat graph at a
    usable speed (a jit body is split into a handful of fusions regardless
    of barriers, and a multi-k-op fusion hits quadratic lazy LLVM codegen
    — softfloat.py docstring), and it doesn't need to: numpy's square/add/
    sqrt/cast on f64 performs bit-for-bit the same four IEEE roundings
    glibc's hypotf does (verified against libm over 20M samples)."""
    def np_hypot(xv, yv):
        xd = np.asarray(xv).astype(np.float64)
        yd = np.asarray(yv).astype(np.float64)
        return np.sqrt(xd * xd + yd * yd).astype(np.float32)

    return jax.pure_callback(
        np_hypot, jax.ShapeDtypeStruct(jnp.shape(x), jnp.float32), x, y,
        vmap_method="broadcast_all")


def hypotf_exact(x, y):
    """glibc hypotf: float(sqrt(double(x)*x + double(y)*y)), bit-exact.

    Domain: finite x, y with |x|, |y| in {0} ∪ [2^-90, 2^60] — the
    softfloat layer needs normal f32 components and a normal f32 result
    (f32-subnormal inputs/results would double-round; env coordinates are
    O(1e3), nowhere near either edge). Platform-split at lowering time:
    emulated f64 on the device, an equivalent-roundings numpy callback on
    CPU (see _hypotf_soft/_hypotf_host)."""
    x, y = jnp.asarray(x, _F), jnp.asarray(y, _F)
    return jax.lax.platform_dependent(x, y, cpu=_hypotf_host,
                                      default=_hypotf_soft)


# ------------------------------------------------------------------ atanf
# fdlibm polynomial coefficients and atanhi/atanlo tables, exact bit
# patterns read from this host's libm.so.6 .rodata (see module docstring).
_AT_EVEN = (0x3C8569D7, 0x3D4BDA59, 0x3D886B35, 0x3DBA2E6E, 0x3E124925,
            0x3EAAAAAB)                     # aT10, aT8, aT6, aT4, aT2, aT0
_AT_ODD = (0xBD15A221, 0x3D6EF16B, 0x3D9D8795, 0x3DE38E38, 0x3E4CCCCD)
#            aT9, then SUBTRACTED -aT7, -aT5, -aT3, -aT1 (asm uses subss)
_ATANHI = (0x3EED6338, 0x3F490FDA, 0x3F7B985E, 0x3FC90FDA)
_ATANLO = (0x31AC3769, 0x33222168, 0x33140FB4, 0x33A22168)


@jax.jit
def atanf_exact(x):
    """Bit replica of glibc 2.36's atanf (fdlibm float kernel) for finite
    inputs; NaN propagates, |x| >= 2^25 returns ±(atanhi[3]+atanlo[3])."""
    x = jnp.asarray(x, _F)
    hx = _bits(x)
    ix = hx & 0x7FFFFFFF

    # argument reduction: pick id in {-1,0,1,2,3} and the reduced argument
    ax = jnp.abs(x)
    big = ix > 0x4BFFFFFF                    # |x| >= 2^25 (or NaN)
    small = ix <= 0x3EDFFFFF                 # |x| < 0.4375
    tiny = ix <= 0x30FFFFFF                  # |x| < 2^-29: atanf(x) == x
    r0 = small                               # id == -1 (signed x, no flip)
    r1 = ~small & (ix <= 0x3F2FFFFF)         # id 0: x' = (2a-1)/(2+a)
    r2 = ~small & (ix > 0x3F2FFFFF) & (ix <= 0x3F97FFFF)   # id 1
    r3 = ~small & (ix > 0x3F97FFFF) & (ix <= 0x401BFFFF)   # id 2
    #                                          id 3: x' = -1/a
    num = jnp.where(r0, x,
          jnp.where(r1, (ax + ax) - _F(1.0),
          jnp.where(r2, ax - _F(1.0),
          jnp.where(r3, ax - _c(0x3FC00000), _F(-1.0)))))
    den = jnp.where(r0, _F(1.0),
          jnp.where(r1, _F(2.0) + ax,
          jnp.where(r2, ax + _F(1.0),
          jnp.where(r3, _mul(ax, _c(0x3FC00000)) + _F(1.0), ax))))
    xr = jnp.where(r0, x, _div32(num, den))

    z = _mul(xr, xr)
    w = _mul(z, z)
    s1 = _c(_AT_EVEN[0])
    for u in _AT_EVEN[1:]:
        s1 = _mul(s1, w) + _c(u)
    s1 = _mul(s1, z)
    s2 = _c(_AT_ODD[0])
    for u in _AT_ODD[1:]:
        s2 = _mul(s2, w) - _c(u)
    s2 = _mul(s2, w)
    t = _mul(s1 + s2, xr)

    # id == -1: x - t (keeps x's sign); else atanhi[id]-((t-atanlo[id])-x')
    hi = jnp.where(r1, _c(_ATANHI[0]), jnp.where(r2, _c(_ATANHI[1]),
         jnp.where(r3, _c(_ATANHI[2]), _c(_ATANHI[3]))))
    lo = jnp.where(r1, _c(_ATANLO[0]), jnp.where(r2, _c(_ATANLO[1]),
         jnp.where(r3, _c(_ATANLO[2]), _c(_ATANLO[3]))))
    res_mid = hi - ((t - lo) - xr)
    res = jnp.where(r0, xr - t,
                    jnp.where(hx < 0, -res_mid, res_mid))

    # huge/tiny/NaN overrides (same order and operand forms as the asm)
    res_big_pos = _c(0x33A22168) + _c(0x3FC90FDA)         # lo3 + hi3
    res_big_neg = _c(0xBFC90FDA) - _c(0x33A22168)         # -hi3 - lo3
    res = jnp.where(big, jnp.where(ix > 0x7F800000, x + x,
                                   jnp.where(hx > 0, res_big_pos,
                                             res_big_neg)), res)
    return jnp.where(tiny, x, res)


# ----------------------------------------------------------------- atan2f
_PI_U = 0x40490FDB      # pi rounded up (float)
_PIO2_U = 0x3FC90FDB    # pi/2 rounded up
_TINY = 0x0DA24260      # 1e-30-ish addend glibc uses to raise inexact
_PI_LO = 0x33BBBD2E     # |pi_lo|


@jax.jit
def atan2f_exact(y, x):
    """Bit replica of glibc 2.36's atan2f (fdlibm ``__atan2f_finite``) for
    finite and zero inputs (infinities follow the k>60 / k<-60 clamps,
    matching the finite kernel's flow; the env never produces them)."""
    y = jnp.asarray(y, _F)
    x = jnp.asarray(x, _F)
    hx, hy = _bits(x), _bits(y)
    ix, iy = hx & 0x7FFFFFFF, hy & 0x7FFFFFFF
    m = ((hx >> 30) & 2) | ((hy >> 31) & 1)

    pi = _c(_PI_U)
    tiny = _c(_TINY)
    plo = _c(_PI_LO)

    diff = iy - ix
    k_big = diff > 0x1E7FFFFF                     # |y/x| > ~2^60
    k_neg = (hx < 0) & ((diff >> 23) < -60)       # x < 0 and |y/x| < 2^-60
    z = jnp.where(k_big, _c(_PIO2_U) - _c(0x333BBD2E),
                  jnp.where(k_neg, _F(0.0),
                            atanf_exact(jnp.abs(_div32(y, x)))))

    # barrier: XLA's algebraic simplifier merges the two constants in
    # (z + plo) - pi into one addend (single rounding) — the asm rounds
    # z+plo first (CLAUDE.md: constant-merge reassociation)
    zp = jax.lax.optimization_barrier(z + plo)
    res = jnp.where(m == 0, z,
          jnp.where(m == 1, _from_bits(_bits(z) ^ np.int32(-2147483648)),
          jnp.where(m == 2, pi - zp, zp - pi)))

    # x == 1.0 fast path: plain atanf(y)
    res = jnp.where(hx == 0x3F800000, atanf_exact(y), res)
    # |x| == 0: ±(pi/2 + tiny)  (the pio2 constant is the UP-rounded one)
    res = jnp.where((ix == 0) & (iy != 0),
                    jnp.where(hy < 0, _c(0xBFC90FDB) - tiny,
                              tiny + _c(_PIO2_U)), res)
    # |y| == 0: {±0 -> y, x<0 -> ±(pi + tiny)}
    res = jnp.where(iy == 0,
                    jnp.where(m == 2, tiny + pi,
                              jnp.where(m == 3, (-pi) - tiny, y)), res)
    # NaN propagation
    res = jnp.where((ix > 0x7F800000) | (iy > 0x7F800000), x + y, res)
    return res
