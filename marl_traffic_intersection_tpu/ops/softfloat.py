"""Software IEEE-754 binary64 arithmetic from f32/int32 VPU primitives.

The TPU has no native f64, but glibc's sinf/cosf compute their polynomial in
double precision (sysdeps/ieee754/flt-32, verified against this host's
libm.so disassembly — see ops/exact_trig.py). Replicating those outputs
bit-for-bit therefore requires replaying every intermediate *f64 rounding*
exactly. This module emulates f64 values and the ops the trig kernels use
(mul, fma, add, truncation) on top of correctly-rounded f32 mul/add and
int32 bit ops — nothing else, so it lowers cleanly to the VPU.

Representation: an emulated double is an UNEVALUATED SUM of three f32s
``(t0, t1, t2)``, non-overlapping, |t0| > |t1| > |t2| (Priest-style
expansion). Three components cover 72 significand bits — enough to hold any
53-bit f64 exactly (24+24+5 with alignment gaps).

Machinery:
  * ``two_sum`` / ``two_prod`` (Knuth / Dekker-split) — error-free f32
    transforms. The Dekker split products are exact in f32, so LLVM FMA
    contraction of their mul-sub patterns cannot change results (the
    products round to themselves); the emulation is contraction-immune.
  * exact expansion products/sums collect every partial into a component
    list (statically unrolled, branchless).
  * ``round_to_prec`` rounds an exact expansion to a target significand
    width (53 = f64 op result, 24 = final cvtsd2ss) by scaling the leading
    exponent to put the rounding boundary at 2^0, splitting components into
    integer + fraction, and applying round-to-nearest-even with exact
    tie/parity detection — all via jnp.where selects.

Scope/limits (documented, asserted by the exhaustive verifier
scripts/verify_exact_trig.py): inputs are finite and the dynamic range of
the trig kernels (|value| in [2^-149, 2^60], intermediates normal after
scaling) — not a general-purpose softfloat (no inf/nan propagation, no f64
subnormals; the kernels never produce them for in-domain inputs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_F = jnp.float32
_I = jnp.int32


def _f(x):
    return jnp.asarray(x, _F)


# ------------------------------------------------------------ EFT primitives
def two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly, s = fl(a+b)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def fast_two_sum(a, b):
    """Dekker two-sum; requires |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


_SPLIT = np.float32(4097.0)  # 2^12 + 1


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Dekker two-product: p + e == a * b exactly, p = fl(a*b)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ------------------------------------------------------- expansion renormalize
def renorm(comps, out_n: int = 3):
    """Compress a list of f32 components into ``out_n`` components,
    descending magnitude, non-overlapping, preserving the exact sum.

    Shewchuk's GROW-EXPANSION incrementally (exact, guaranteed
    non-overlapping output for round-to-nearest-even f32), then ordering
    sweeps to squeeze interleaved zeros and sort by magnitude. The
    significant components of any value reachable in the trig kernels fit
    ``out_n`` (residual beyond that is > out_n*24 bits below the head —
    only an exact tie that deep could notice the fold)."""
    E = []
    for b in comps:
        Q = b
        newE = []
        for e in E:   # ascending magnitude order
            Q, h = two_sum(Q, e)
            newE.append(h)
        newE.append(Q)
        E = newE
    E = E[::-1]       # descending
    n = len(E)
    # zero-squeeze / ordering sweeps (exact; inputs already non-overlapping)
    for _ in range(2):
        for i in range(n - 1, 0, -1):
            s, e = two_sum(E[i - 1], E[i])
            E[i - 1], E[i] = s, e
        for i in range(n - 1):
            s, e = two_sum(E[i], E[i + 1])
            E[i], E[i + 1] = s, e
    head = E[:out_n]
    while len(head) < out_n:
        head.append(jnp.zeros_like(head[0]))
    for c in E[out_n:]:
        head[-1] = head[-1] + c
    return head


# ------------------------------------------------------------- bit utilities
def _bits(x):
    return jax.lax.bitcast_convert_type(_f(x), _I)


def _from_bits(i):
    return jax.lax.bitcast_convert_type(jnp.asarray(i, _I), _F)


def _exponent(x):
    """Unbiased exponent of a nonzero normal f32."""
    return ((_bits(x) >> 23) & 0xFF) - 127


def _pow2(e):
    """2^e as f32 for -126 <= e <= 127 (array-valued)."""
    return _from_bits((jnp.asarray(e, _I) + 127) << 23)


def _is_pow2(x):
    return (_bits(x) & 0x7FFFFF) == 0


def _magic_rint(x):
    """Round-to-nearest-even integer for |x| < 2^22 via the magic-constant
    trick (both adds round to the integer grid)."""
    big = jnp.where(x >= 0, _F(2 ** 23), _F(-(2 ** 23)))
    return (x + big) - big


# -------------------------------------------------------------- core rounding
def _exp_sum3(vals):
    """Exact expansion sum of a small list, compressed to 3 components.

    Every two_sum is error-free, so the 3-component result is exact as
    long as the true sum's significant bits fit 72 bits of span (the
    callers' values do — see round_to_prec)."""
    e = renorm(list(vals), out_n=3)
    return e[0], e[1], e[2]


def round_to_prec(comps, prec: int):
    """Round the exact value V = sum(comps) to ``prec`` significand bits,
    nearest-even. Returns a non-overlapping 3-component expansion holding
    the rounded value exactly. V == 0 handled; V assumed finite, and
    2^-126 <= |V| < 2^63 (the trig kernels' dynamic range)."""
    NC = min(len(comps), 7)
    r = renorm(comps, out_n=NC)
    h0 = r[0]
    zero = h0 == _F(0.0)

    # exponent of V: e(h0), minus 1 iff h0 is a power of two and the exact
    # tail is opposite in sign (V strictly inside the lower binade)
    tail_lead = r[-1]
    for c in reversed(r[1:-1]):
        tail_lead = jnp.where(c != 0, c, tail_lead)
    opp = (tail_lead != 0) & ((tail_lead < 0) != (h0 < 0))
    e_v = _exponent(h0) - jnp.where(_is_pow2(h0) & opp, _I(1), _I(0))

    # scale so the rounding boundary sits at 2^0: S = V * 2^(prec-1-e_v),
    # |S| in [2^(prec-1), 2^prec). Scale in two steps to stay in range.
    sh = (prec - 1) - e_v
    s1 = _pow2(sh // 2)
    s2 = _pow2(sh - sh // 2)
    sc = [((c * s1) * s2) for c in r]

    # split each scaled component into integer + fraction (exact: the
    # magic-rint is valid below 2^23; at or above it the grid is integer)
    ints, fracs = [], []
    for c in sc:
        is_big = jnp.abs(c) >= _F(2 ** 23)
        i = jnp.where(is_big, c, _magic_rint(c))
        ints.append(i)
        fracs.append(jnp.where(is_big, _F(0.0), c - i))

    # fractional total F = sum(fracs), |F| <= NC/2; exact 3-term expansion
    F0, F1, F2 = _exp_sum3(fracs)

    # n0 = rint(F0); D = (F0 - n0) + F1 + F2 is the exact distance to the
    # chosen integer, |D| <= 0.5 + eps
    n0 = _magic_rint(F0)
    d0 = F0 - n0
    D0, Dt = two_sum(d0, F1)
    D1, D2 = two_sum(Dt, F2)
    D0, t = fast_two_sum(D0, D1)
    D1, D2 = fast_two_sum(t, D2)

    # parity of the candidate integer (for ties): parity of a sum is the
    # XOR of component parities; components at or above 2^24 have grid >= 2
    # and are even
    def _par(c):
        small = jnp.abs(c) < _F(2 ** 24)
        return jnp.where(small, jnp.abs(c).astype(_I) & 1, _I(0))

    parity = _par(n0)
    for i in ints:
        parity = parity ^ _par(i)
    parity = parity & 1

    # round-to-nearest-even adjustment from the exact remainder D
    tail2 = jnp.where(D1 != 0, D1, D2)
    absD0 = jnp.abs(D0)
    sgnD = jnp.where(D0 != 0, jnp.sign(D0), jnp.sign(tail2))
    gt_half = (absD0 > _F(0.5)) | \
        ((absD0 == _F(0.5)) & (tail2 != 0) & ((tail2 < 0) == (D0 < 0)))
    eq_half = (absD0 == _F(0.5)) & (D1 == 0) & (D2 == 0)
    adjust = jnp.where(gt_half | (eq_half & (parity == 1)), sgnD, _F(0.0))

    # rounded scaled integer R = sum(ints) + n0 + adjust (exact expansion;
    # renorm keeps every component on the integer grid so nothing rounds)
    out = renorm(ints + [n0, adjust], out_n=3)

    # unscale by 2^(e_v - (prec-1)), exact power-of-two factors
    u1 = _pow2(-(sh // 2))
    u2 = _pow2(-(sh - sh // 2))
    out = [jnp.where(zero, _F(0.0), (c * u1) * u2) for c in out]
    return out


# ------------------------------------------------------------ f64 value type
#
# An emulated double is (c0, c1, c2, E): value = (c0 + c1 + c2) * 2^E with
# the components a non-overlapping f32 expansion kept near 2^0 and E an
# int32 exponent. The explicit exponent removes the f32 subnormal floor —
# f64 intermediates like r^5 * coeff (~2^-160 for worst-case-reduced r)
# stay exactly representable.

def d_from_f32(x):
    """Exact f64 from an f32 (widening conversion — always exact)."""
    x = _f(x)
    z = jnp.zeros_like(x)
    return (x, z, z, jnp.zeros(jnp.shape(x), _I))


def d_const(v: float):
    """Exact expansion of a host f64 constant (static, exponent 0)."""
    v = float(np.float64(v))
    t0 = np.float32(v)
    t1 = np.float32(v - np.float64(t0))
    t2 = np.float32(v - np.float64(t0) - np.float64(t1))
    assert float(np.float64(t0) + np.float64(t1) + np.float64(t2)) == v
    return (_F(t0), _F(t1), _F(t2), _I(0))


def d_neg(a):
    return (-a[0], -a[1], -a[2], a[3])


def _prod_comps(a, b):
    comps = []
    for x in a:
        for y in b:
            p, e = two_prod(x, y)
            comps.append(p)
            comps.append(e)
    return comps


def _scale2(comps, e):
    """Multiply components by 2^e (array-valued), |e| <= ~250, two steps."""
    s1 = _pow2(e // 2)
    s2 = _pow2(e - e // 2)
    return [(c * s1) * s2 for c in comps]


_STICKY_CUT = 110   # terms more than this far below the reference exponent
_STICKY_MAG = np.float32(2.0 ** -135)  # collapse to a sign-preserving sticky


def _combine(pairs, adds):
    """round53( sum of a*b pairs + sum of addends ), computed at a common
    reference exponent so no two_prod error term or component underflows.

    Terms landing more than _STICKY_CUT bits below the reference collapse
    to a sign-preserving sticky at 2^-135 relative — far below the 53-bit
    rounding granularity, it only ever matters by breaking an exact tie in
    the direction the vanished term would have (the f64 chain is otherwise
    bit-replicated; scripts/verify_exact_trig.py sweeps the full input
    domain to confirm no observable difference)."""
    terms = []   # (term_exponent, sign_head, comps_at_2^0_scale)
    for a, b in pairs:
        ea, eb = _exponent(a[0]), _exponent(b[0])
        a2 = _scale2([a[0], a[1], a[2]], -ea)
        b2 = _scale2([b[0], b[1], b[2]], -eb)
        zero = (a[0] == 0) | (b[0] == 0)
        comps = [jnp.where(zero, _F(0.0), c)
                 for c in _prod_comps(a2, b2)]
        terms.append((a[3] + b[3] + ea + eb,
                      jnp.sign(a[0]) * jnp.sign(b[0]), comps))
    for c in adds:
        ec = _exponent(c[0])
        comps = [jnp.where(c[0] == 0, _F(0.0), x)
                 for x in _scale2([c[0], c[1], c[2]], -ec)]
        terms.append((c[3] + ec, jnp.sign(c[0]), comps))

    # reference exponent: max over NONZERO terms (zero terms are excluded;
    # if every term is zero the result is zero and er is irrelevant)
    _NEG = _I(-(10 ** 6))
    er = None
    for e, s, _ in terms:
        ei = jnp.where(s != 0, jnp.asarray(e, _I), _NEG)
        er = ei if er is None else jnp.maximum(er, ei)

    all_comps = []
    for e, sgn, comps in terms:
        d = e - er                     # <= 0 for nonzero terms
        vanished = d < -_STICKY_CUT
        dc = jnp.clip(d, -_STICKY_CUT - 4, 0)
        scaled = _scale2(comps, dc)
        scaled = [jnp.where(vanished, _F(0.0), c) for c in scaled]
        scaled[0] = jnp.where(vanished, sgn * _STICKY_MAG, scaled[0])
        all_comps.extend(scaled)

    out = round_to_prec(all_comps, 53)
    # renormalize: pull the head's exponent into E, components stay ~2^0
    nz = out[0] != 0
    e0 = jnp.where(nz, _exponent(out[0]), _I(0))
    out = _scale2(out, -e0)
    # fusion break: each emulated op is ~2k elementwise HLOs; letting XLA
    # fuse a whole trig kernel into ONE LLVM function produces a giant
    # basic block whose codegen is quadratic (minutes-to-hours). The
    # barrier caps kernel size at one emulated op — compile drops to
    # seconds, runtime cost is a few materialized (N,)-vectors per op.
    return jax.lax.optimization_barrier(
        (out[0], out[1], out[2], jnp.where(nz, er + e0, _I(0))))


# The public ops are individually jitted: called eagerly (the CPU
# verification path) each runs as its own ~2k-op compiled unit — XLA:CPU's
# runtime executes a whole emulated-trig call fused into ONE kernel
# pathologically slowly (hours; empirically super-linear in kernel size),
# while per-op kernels stream at memory bandwidth. Under an outer jit
# (the TPU env step) nested jits inline and compile as one program.
@jax.jit
def d_add(a, b):
    return _combine([], [a, b])


def d_sub(a, b):
    return d_add(a, d_neg(b))


@jax.jit
def d_mul(a, b):
    return _combine([(a, b)], [])


@jax.jit
def d_fma(a, b, c):
    """fl64(a*b + c) with a SINGLE rounding (vfmadd semantics)."""
    return _combine([(a, b)], [c])


@jax.jit
def d_to_f32(a):
    """cvtsd2ss: round the (53-bit-exact) value once to f32. The result
    must land in f32 normal range (the trig kernels guarantee it; a
    subnormal result would double-round in the final scale)."""
    out = round_to_prec([a[0], a[1], a[2]], 24)
    return _scale2([out[0]], jnp.clip(jnp.asarray(a[3], _I), -130, 130))[0]


@jax.jit
def d_sqrt(a):
    """Correctly-rounded (RN53) f64 square root of a non-negative emulated
    double — the one op glibc's hypotf adds on top of mul/add
    (``(float) sqrt ((double) x * x + (double) y * y)``, verified
    bit-identical to this host's libm over 20M samples — ops/exact_libm.py).

    Method: scale into an even-exponent frame m = V * 2^-T (T even, head in
    [1, 4)); two Newton refinements from the f32 ``jnp.sqrt`` seed using
    error-free transforms (error < 2^-60); round to 53 bits; then CORRECT
    against the exact neighbor midpoints — compare m to (r ± 2^-53·2^e)^2
    with exact expansion arithmetic and adjust by one ulp when the rounded
    candidate sits on the wrong side (ties: to even significand). The
    correction step makes the result independent of the seed's accuracy.

    Domain: V == 0 or 2^-250 <= V < 2^250 (positions/distances in the env
    are O(10^3); nothing near the edges). Negative input is undefined.
    """
    zero = a[0] == _F(0.0)
    e0 = jnp.where(zero, _I(0), _exponent(a[0]))
    T = jnp.asarray(a[3], _I) + e0          # value = m0 * 2^T, m0 in [1, 2)
    odd = T & 1                              # make the exponent even
    m = _scale2([a[0], a[1], a[2]], -e0 + odd)   # head in [1, 4)
    half_e = (T - odd) >> 1                  # result exponent

    mh = (m[0] + m[1]) + m[2]
    y0 = jnp.sqrt(jnp.maximum(mh, _F(0.0)))             # ~24 bits
    y0 = jnp.where(zero, _F(1.0), y0)        # keep divisions finite

    # (fusion breaks between stages for the same reason as _combine's:
    # one fused mega-kernel compiles/executes pathologically on XLA:CPU)
    # Newton 1: r = y0 + (m - y0^2) / (2 y0)   (~47 bits)
    p, pe = two_prod(y0, y0)
    d = renorm([m[0], m[1], m[2], -p, -pe], out_n=3)
    q1 = ((d[0] + d[1]) + d[2]) / (y0 + y0)
    rh, rl = two_sum(y0, q1)
    rh, rl, m = jax.lax.optimization_barrier((rh, rl, tuple(m)))
    m = list(m)

    # Newton 2 on the pair (rh, rl)            (~70 bits)
    p0, p0e = two_prod(rh, rh)
    p1, p1e = two_prod(rh, rl + rl)
    p2, p2e = two_prod(rl, rl)
    d = renorm([m[0], m[1], m[2], -p0, -p0e, -p1, -p1e, -p2, -p2e], out_n=3)
    q2 = ((d[0] + d[1]) + d[2]) / (rh + rh)
    r = round_to_prec([rh, rl, q2], 53)      # candidate, exact 3-expansion
    r, m = jax.lax.optimization_barrier((tuple(r), tuple(m)))
    r, m = list(r), list(m)

    # Exact correction vs the two neighbor midpoints mid± = r ± h,
    # h = 2^(e_r - 53) (half-ulp of the 53-bit grid):
    #   m - mid±^2 = (m - r^2) ∓ 2rh - h^2
    # D = m - r^2 is computed ONCE and shared; h is a power of two, so the
    # 2·r_i·h products and h^2 are exact single f32s (no two_prod error
    # terms). This keeps the whole correction ~3x smaller than squaring
    # each 4-component midpoint separately — XLA:CPU splits a jit body
    # into a handful of fusions regardless of barriers, and a fusion past
    # ~2k elementwise ops hits the quadratic lazy-codegen cliff the module
    # docstring describes.
    e_r = jnp.where(r[0] == 0, _I(0), _exponent(r[0]))
    h = _pow2(e_r - 53)

    comps = list(m)
    for i in range(3):
        for j in range(i, 3):
            pp, ee = two_prod(r[i], r[j])
            if j > i:
                pp, ee = pp + pp, ee + ee        # doubling is exact
            comps.extend([-pp, -ee])
    D = renorm(comps, out_n=6)                   # exact m - r^2
    D, r, m, h = jax.lax.optimization_barrier(
        (tuple(D), tuple(r), tuple(m), h))
    D, r, m = list(D), list(r), list(m)

    cross = [(r[0] * h) * _F(2.0), (r[1] * h) * _F(2.0),
             (r[2] * h) * _F(2.0), h * h]        # all exact (h = 2^k)

    def _lead_sign(comps):
        d = renorm(comps, out_n=6)
        lead = d[0]
        for c in d[1:]:
            lead = jnp.where(lead != 0, lead, c)
        return lead

    lead_hi = _lead_sign(D + [-c for c in cross[:3]] + [-cross[3]])
    lead_lo = _lead_sign(D + cross[:3] + [-cross[3]])
    lead_hi, lead_lo, r, h = jax.lax.optimization_barrier(
        (lead_hi, lead_lo, tuple(r), h))
    r = list(r)

    # parity of the 53-bit significand (for exact ties)
    s52 = _scale2([r[0], r[1], r[2]], 52 - e_r)
    par = _I(0)
    for c in s52:
        big = jnp.abs(c) >= _F(2 ** 24)      # grid >= 2: even
        par = par ^ jnp.where(big, _I(0), jnp.abs(c).astype(_I) & 1)
    odd_sig = (par & 1) == 1

    ulp = h + h
    up = (lead_hi > 0) | ((lead_hi == 0) & odd_sig)
    dn = (lead_lo < 0) | ((lead_lo == 0) & odd_sig)
    adj = jnp.where(up, ulp, jnp.where(dn, -ulp, _F(0.0)))
    out = renorm([r[0], r[1], r[2], adj], out_n=3)

    nz = ~zero
    eo = jnp.where(out[0] != 0, _exponent(out[0]), _I(0))
    out = _scale2(out, -eo)
    return (jnp.where(nz, out[0], _F(0.0)),
            jnp.where(nz, out[1], _F(0.0)),
            jnp.where(nz, out[2], _F(0.0)),
            jnp.where(nz, half_e + eo, _I(0)))


@jax.jit
def d_trunc_i32(a):
    """cvttsd2si (truncate toward zero) for |value| < 2^31."""
    small = jnp.asarray(a[3], _I) < -40     # |value| < 2^-37 -> 0
    E = jnp.clip(a[3], -40, 40)
    comps = _scale2([a[0], a[1], a[2]], E)
    comps = [jnp.where(small, _F(0.0), c) for c in comps]
    t0, t1, t2 = renorm(comps, out_n=3)
    i0 = jnp.trunc(t0)   # exact (f32 -> f32)
    f0 = t0 - i0         # exact (Sterbenz / i0 == 0)
    i1 = jnp.trunc(t1)
    f1 = t1 - i1
    S = i0.astype(_I) + i1.astype(_I)
    # exact fractional remainder F = f0 + f1 + t2, |F| < 2
    F0, F1, F2 = _exp_sum3([f0, f1, t2])
    tail = jnp.where(F1 != 0, F1, F2)
    # value = S + F; truncate toward zero
    ge1 = (F0 > _F(1.0)) | ((F0 == _F(1.0)) & (tail >= 0))
    lem1 = (F0 < _F(-1.0)) | ((F0 == _F(-1.0)) & (tail <= 0))
    S = S + jnp.where(ge1, _I(1), _I(0)) - jnp.where(lem1, _I(1), _I(0))
    Fpos = jnp.where(ge1, F0 - _F(1.0), jnp.where(lem1, F0 + _F(1.0), F0))
    # residual fraction sign (exact)
    fs = jnp.where(Fpos != 0, jnp.sign(Fpos), jnp.sign(tail))
    # trunc toward zero: S already floor-ish from comp-trunc mixture; fix up:
    # if total value positive and fraction negative -> S - ... — handle via
    # reconstruction: value sign
    vpos = (t0 > 0) | ((t0 == 0) & (t1 > 0))
    # If fraction sign opposes the integer direction, truncation means:
    #   positive value with negative fraction: S is an over-count by 1
    #   negative value with positive fraction: S is an under-count by 1
    S = S - jnp.where(vpos & (fs < 0), _I(1), _I(0)) \
          + jnp.where(~vpos & (fs > 0), _I(1), _I(0))
    return S
