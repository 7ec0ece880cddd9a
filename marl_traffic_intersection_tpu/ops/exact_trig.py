# Attribution / licensing: this file is a derived work of the GNU C Library
# (glibc) 2.36 math routines. The algorithms and the polynomial/table
# constants replicated below originate from glibc's sysdeps/ieee754/flt-32
# sinf/cosf/tanf implementations (themselves derived from Sun's fdlibm and
# the ARM optimized-routines sincosf), Copyright (C) 1993-2022 Free Software
# Foundation, Inc., licensed under the GNU Lesser General Public License
# v2.1 or later (LGPL-2.1-or-later). The constants were decoded from this
# host's /lib/x86_64-linux-gnu/libm.so.6 (Debian GLIBC 2.36) .rodata and the
# control flow from its disassembly. To the extent this file reproduces
# glibc's expression of those algorithms, it is distributed under the same
# LGPL-2.1-or-later terms. Derived files: this module (ops/exact_trig.py)
# and ops/exact_libm.py.
"""Bit-exact replicas of this host's glibc sinf/cosf/tanf for the TPU.

The C++ reference oracle calls libm's float trig; XLA's device
transcendentals differ by occasional ulps, which is the last source of
TPU-vs-oracle pose drift (EXACTNESS.md: one lidar pixel flip in config 4's
1.5M readings). These functions replay the EXACT algorithms the host libm
executes — decoded instruction-by-instruction from the libm.so.6 binary
(glibc 2.36, x86-64, FMA ifunc variants selected on this machine):

  * sinf  -> the FMA variant at libm+0x73720 (sysdeps/ieee754/flt-32
    sincosf family): |x| < 2^-12 returns x; |x| < 0.75 a 3-FMA f64 sine
    polynomial; |x| < 120 an integer-quadrant reduction
    (n = (cvttsd2si(x * 2/pi * 2^24) + 2^23) >> 24, r = fnmadd(n, pi/2, x))
    followed by the quadrant's sine/cosine f64 polynomial.
  * cosf  -> the FMA variant at libm+0x73280 (same table, parity swapped).
  * tanf  -> libm+0x40d70: f64 reduction (separate mul/sub — tanf is NOT
    compiled with FMA), then the all-float fdlibm __kernel_tandf with the
    13-coefficient odd/even polynomial split, the pi/4-x argument folding,
    and the masked-mantissa accurate -1/(x+r) path.

Every f64 operation is emulated bit-exactly on f32/int32 VPU primitives by
ops/softfloat.py (single-rounding mul/add/fma, cvttsd2si, cvtsd2ss), and
every f32 step relies only on correctly-rounded mul/add (plus a
correctness-fixed division, see _div32). Constants are the exact bit
patterns extracted from libm's .rodata (table at libm+0xae280, tanf kernel
constants at +0x98bf8).

Domain: |x| < 120 (the envs' angles are wrapped to (-2pi, 2pi); the
reduce_large path for huge args is intentionally not implemented — inputs
beyond 120 fall back to jnp trig and are flagged by
scripts/verify_exact_trig.py, which sweeps EVERY f32 in the supported
domain against the host libm).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .softfloat import (d_const, d_fma, d_from_f32, d_mul, d_neg, d_sub,
                        d_to_f32, d_trunc_i32, two_prod, two_sum)

_F = jnp.float32
_I = jnp.int32

# ---- f64 constants (bit patterns from libm.so.6 .rodata @ 0xae280) ----
_HPI_INV = d_const(float.fromhex("0x1.45f306dc9c883p+23"))  # 2/pi * 2^24
_HPI = d_const(float.fromhex("0x1.921fb54442d18p+0"))       # pi/2
_C0 = float.fromhex("0x1.0p+0")
_C1 = float.fromhex("-0x1.ffffffd0c621cp-2")
_C2 = float.fromhex("0x1.55553e1068f19p-5")
_C3 = float.fromhex("-0x1.6c087e89a359dp-10")
_C4 = float.fromhex("0x1.99343027bf8c3p-16")
_S1 = d_const(float.fromhex("-0x1.555545995a603p-3"))
_S2 = d_const(float.fromhex("0x1.1107605230bc4p-7"))
_S3 = d_const(float.fromhex("-0x1.994eb3774cf24p-13"))

# ---- tanf kernel f32 constants (libm .rodata @ 0x98bf8) ----
_PIO4 = np.float32(float.fromhex("0x1.921fb4p-1"))      # 0.78539813
_PIO4LO = np.float32(float.fromhex("0x1.4442d2p-25"))   # 3.7748947e-08
_T = [np.float32(v) for v in (
    0.3333333432674408, 0.13333334028720856, 0.05396825447678566,
    0.021869488060474396, 0.008863239549100399, 0.0035920790396630764,
    0.00145620945841074, 0.0005880412645637989, 0.0002464631397742778,
    7.817944424459711e-05, 7.14072521077469e-05, -1.8558637748355977e-05,
    2.590730582596734e-05)]


def _bits(x):
    return jax.lax.bitcast_convert_type(jnp.asarray(x, _F), _I)


def _abstop12(x):
    return (_bits(x) >> 20) & 0x7FF


def _d_negate_if(d, cond):
    """Flip an emulated double's sign where cond (exact)."""
    s = jnp.where(cond, _F(-1.0), _F(1.0))
    return (d[0] * s, d[1] * s, d[2] * s, d[3])


def _reduce_quadrant(xd):
    """n = (cvttsd2si(x*hpi_inv) + 0x800000) >> 24 (libm+0x737a2)."""
    m = d_mul(xd, _HPI_INV)
    n = (d_trunc_i32(m) + 0x800000) >> 24
    return n


def _sin_chain(rq, x2):
    """The FMA sine polynomial (libm+0x737c9): rq = sign-adjusted r."""
    A = d_fma(_S3, x2, _S2)
    x3s = d_mul(x2, rq)
    rsr4 = d_mul(x2, x3s)
    B = d_fma(x3s, _S1, rq)
    return d_to_f32(d_fma(A, rsr4, B))


def _cos_chain(x2, neg):
    """The FMA cosine polynomial (libm+0x737f8); neg selects the negated
    coefficient table (quadrants with n & 2)."""
    c0 = _d_negate_if(d_const(_C0), neg)
    c1 = _d_negate_if(d_const(_C1), neg)
    c2 = _d_negate_if(d_const(_C2), neg)
    c3 = _d_negate_if(d_const(_C3), neg)
    c4 = _d_negate_if(d_const(_C4), neg)
    x4 = d_mul(x2, x2)
    C = d_fma(c1, x2, c0)
    D = d_fma(c4, x2, c3)
    x6 = d_mul(x2, x4)
    E = d_fma(x4, c2, C)
    return d_to_f32(d_fma(D, x6, E))


def _medium_sincos(y, want_sin):
    """|x| < 120 path shared by sinf/cosf: reduce, pick parity branch."""
    xd = d_from_f32(y)
    n = _reduce_quadrant(xd)
    nd = d_from_f32(n.astype(_F))                    # exact (|n| <= 77)
    r = d_fma(d_neg(nd), _HPI, xd)                   # vfnmadd132sd
    x2 = d_mul(r, r)
    neg_table = (n & 2) != 0
    # sign row {1,-1,-1,1}[n & 3] (libm table base)
    k = n & 3
    sgn_neg = (k == 1) | (k == 2)
    rq = _d_negate_if(r, sgn_neg)
    sin_res = _sin_chain(rq, x2)
    cos_res = _cos_chain(x2, neg_table)
    sin_parity = (n & 1) == 0 if want_sin else (n & 1) != 0
    return jnp.where(sin_parity, sin_res, cos_res)


def sinf_emulated(y):
    y = jnp.asarray(y, _F)
    top = _abstop12(y)
    xd = d_from_f32(y)
    # small path |x| < 0.75 (libm+0x7374a)
    x2 = d_mul(xd, xd)
    x3 = d_mul(xd, x2)
    A = d_fma(_S3, x2, _S2)
    x5 = d_mul(x2, x3)
    B = d_fma(x3, _S1, xd)
    small = d_to_f32(d_fma(A, x5, B))
    med = _medium_sincos(y, want_sin=True)
    out = jnp.where(top <= 0x3F3, small, med)
    out = jnp.where(top <= 0x397, y, out)            # |x| < 2^-12 -> x
    return jnp.where(top <= 0x42E, out, jnp.sin(y))  # >=120: out of domain


def cosf_emulated(y):
    y = jnp.asarray(y, _F)
    top = _abstop12(y)
    xd = d_from_f32(y)
    x2 = d_mul(xd, xd)
    small = _cos_chain(x2, jnp.zeros(jnp.shape(y), bool))
    med = _medium_sincos(y, want_sin=False)
    out = jnp.where(top <= 0x3F3, small, med)
    out = jnp.where(top <= 0x397, _F(1.0), out)      # |x| < 2^-12 -> 1.0f
    return jnp.where(top <= 0x42E, out, jnp.cos(y))


# ------------------------------------------------------------------- tanf
def _next_toward(q, up):
    """nextafter for finite nonzero f32 (toward +/- inf by one ulp)."""
    b = _bits(q)
    pos = q > 0
    bu = jnp.where(pos, b + 1, jnp.where(q < 0, b - 1, _I(0x00000001)))
    bd = jnp.where(pos, b - 1, jnp.where(q < 0, b + 1, _I(-2147483648) | 1))
    return jax.lax.bitcast_convert_type(jnp.where(up, bu, bd), _F)


@jax.jit
def _div32(a, b):
    """Correctly-rounded f32 division. XLA's CPU div is already IEEE; the
    TPU lowers division to a reciprocal refinement whose seed can be MORE
    than one ulp off (measured: 2 ulps on 44.37213/24.35846 = 0x3fe92b35
    vs correct 0x3fe92b37 — the root cause of the one-step-in-2000 device
    obs[5] flip, round 5). Run THREE pick-the-better-neighbor passes, each
    choosing among {q, q±ulp} the candidate minimizing the EXACT residual
    |a - q*b| (two_prod/two_sum comparison); |a - q*b| is unimodal in q,
    so each pass corrects one ulp and any seed within 3 ulps converges.
    Exact ties cannot arise (a - q*b == a - q'*b implies q == q'). On CPU
    the seed is already correct and every pass is a measured no-op."""
    q0 = a / b

    def resid(q):
        p, e = two_prod(q, b)
        s0, s1 = two_sum(a, -p)
        # exact |a - q*b| as a descending pair (s0, s1 - e ... keep exact)
        t0, t1 = two_sum(s1, -e)
        return s0, t0, t1

    def absless(r1, r2):
        # |r1| < |r2| for exact triples (descending, non-overlapping-ish)
        a0, a1, a2 = r1
        b0, b1, b2 = r2
        # compare via exact difference of absolute values
        sa = jnp.where(a0 != 0, jnp.sign(a0),
                       jnp.where(a1 != 0, jnp.sign(a1), jnp.sign(a2)))
        sb = jnp.where(b0 != 0, jnp.sign(b0),
                       jnp.where(b1 != 0, jnp.sign(b1), jnp.sign(b2)))
        comps = [a0 * sa, a1 * sa, a2 * sa, -b0 * sb, -b1 * sb, -b2 * sb]
        from .softfloat import renorm
        d = renorm(comps, out_n=3)
        lead = jnp.where(d[0] != 0, d[0], jnp.where(d[1] != 0, d[1], d[2]))
        return lead < 0

    def _pass(q):
        qu = _next_toward(q, jnp.ones(jnp.shape(q), bool))
        qd = _next_toward(q, jnp.zeros(jnp.shape(q), bool))
        rq, ru, rd = resid(q), resid(qu), resid(qd)
        up = absless(ru, rq)
        q1 = jnp.where(up, qu, q)
        r1 = jax.tree.map(lambda x_, y_: jnp.where(up, x_, y_), ru, rq)
        return jnp.where(absless(rd, r1), qd, q1)

    q = _pass(_pass(_pass(q0)))
    return jnp.where(jnp.isfinite(q0), q, q0)


def _kernel_tandf(x, y, iy):
    """fdlibm __kernel_tandf, all-f32 (libm+0x3f010). iy: +1 -> tan,
    -1 -> -1/tan."""
    hx = _bits(x)
    ix = hx & 0x7FFFFFFF

    # pi/4 - x folding for |x| >= 0.6744 (uses the ORIGINAL sign/ix)
    fold = ix > 0x3F2CA13F
    xs = jnp.where(fold & (hx < 0), -x, x)
    ys = jnp.where(fold & (hx < 0), -y, y)
    z_f = _PIO4 - xs
    w_f = _PIO4LO - ys
    x_ = jnp.where(fold, z_f + w_f, xs)
    y_ = jnp.where(fold, _F(0.0), ys)

    z = x_ * x_
    w = z * z
    r = _T[11] * w + _T[9]
    r = r * w + _T[7]
    r = r * w + _T[5]
    r = r * w + _T[3]
    r = r * w + _T[1]
    v = _T[12] * w + _T[10]
    v = v * w + _T[8]
    v = v * w + _T[6]
    v = v * w + _T[4]
    v = v * w + _T[2]
    s = z * x_
    # exact asm order (libm+0x3f140): t = (v*z + r)*s + y; r = y + z*t;
    # r_total = T0*s + r  (the even chain carries a z factor — fdlibm's
    # v = z*(T2 + w*(...)))
    t = (v * z + r) * s + y_
    r = y_ + z * t
    r = _T[0] * s + r
    wt = x_ + r

    # folded return: (1-((hx>>30)&2)) * (iy - 2*(x - (w^2/(w+iy) - r)))
    vf = iy.astype(_F)
    coef = (1 - ((hx >> 30) & 2)).astype(_F)
    folded = coef * (vf - _F(2.0) * (x_ - (_div32(wt * wt, wt + vf) - r)))

    # iy == -1: accurate -1/(x+r) with 12-bit masked hi parts
    zm = jax.lax.bitcast_convert_type(_bits(wt) & _I(-4096), _F)
    vv = r - (zm - x_)
    aa = _div32(_F(-1.0), wt)
    tm = jax.lax.bitcast_convert_type(_bits(aa) & _I(-4096), _F)
    ss = _F(1.0) + tm * zm
    recip = tm + aa * (ss + tm * vv)

    # fold-tiny special (libm+0x3f260): |pi/4-ish residual| < 2^-13
    s_coef = (1 - ((hx >> 30) & 2))
    ft = (s_coef * iy).astype(_F) * (_F(1.0)
                                     - (iy + iy).astype(_F) * x_)
    fold_tiny = fold & (jnp.abs(x_) < _F(2.0 ** -13))

    res = jnp.where(fold, jnp.where(fold_tiny, ft, folded),
                    jnp.where(iy == 1, wt, recip))

    # tiny path: |x| < 2^-13 and (int)x == 0
    tiny = (ix < 0x39000000) & (x.astype(_I) == 0)
    tiny_res = jnp.where((ix | (iy + 1).astype(_I)) == 0,
                         _F(1.0) / jnp.abs(x),
                         jnp.where(iy == 1, x, _F(-1.0) / x))
    return jnp.where(tiny, tiny_res, res)


def tanf_emulated(y):
    y = jnp.asarray(y, _F)
    b = _bits(y)
    ix = b & 0x7FFFFFFF
    top = _abstop12(y)

    # medium reduction (libm+0x40db9): NON-fused n*hpi then subtract
    xd = d_from_f32(y)
    n = _reduce_quadrant(xd)
    nh = d_mul(d_from_f32(n.astype(_F)), _HPI)       # mulsd (rounds)
    rd = d_sub(xd, nh)                               # subsd (rounds)
    hi = d_to_f32(rd)
    lo = d_to_f32(d_sub(rd, d_from_f32(hi)))
    iy = 1 - ((n + n) & 2)                           # +1 even, -1 odd

    med = _kernel_tandf(hi, lo, iy)
    small = _kernel_tandf(y, jnp.zeros_like(y), jnp.ones(jnp.shape(y), _I))
    out = jnp.where(ix <= 0x3F490FDA, small, med)
    return jnp.where(top <= 0x42E, out, jnp.tan(y))


# ---------------------------------------------------------- platform split
#
# The *_exact entry points (used by physics/lidar when EnvConfig.exact_trig
# is on) resolve per PLATFORM at lowering time:
#   * TPU (default): the emulated-f64 replicas above — the device has no
#     other way to produce the host libm's bit patterns.
#   * CPU: a jax.pure_callback into the host libm itself (ops/libm_host.py,
#     vectorized C shim). Bit-equal by construction — it IS the library the
#     oracle links — and it sidesteps XLA:CPU's quadratic lazy-codegen
#     cliff on the inlined multi-k-op emulation graphs (ops/softfloat.py).
# The emulated implementations remain directly importable (*_emulated) for
# scripts/verify_exact_trig.py and tests, which verify them ON CPU against
# the same libm the CPU path calls.

def _host_call(np_fn, y):
    return jax.pure_callback(
        np_fn, jax.ShapeDtypeStruct(jnp.shape(y), jnp.float32), y,
        vmap_method="broadcast_all")


def sinf_exact(y):
    y = jnp.asarray(y, _F)
    from .libm_host import sinf_np
    return jax.lax.platform_dependent(
        y, cpu=lambda v: _host_call(sinf_np, v), default=sinf_emulated)


def cosf_exact(y):
    y = jnp.asarray(y, _F)
    from .libm_host import cosf_np
    return jax.lax.platform_dependent(
        y, cpu=lambda v: _host_call(cosf_np, v), default=cosf_emulated)


def tanf_exact(y):
    y = jnp.asarray(y, _F)
    from .libm_host import tanf_np
    return jax.lax.platform_dependent(
        y, cpu=lambda v: _host_call(tanf_np, v), default=tanf_emulated)
