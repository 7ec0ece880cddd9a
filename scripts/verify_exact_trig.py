"""Exhaustively verify ops/exact_trig.py against the host libm, bit for bit.

Sweeps EVERY float32 in the supported domain |x| < 120 (including
subnormals and both signs — ~2.25e9 inputs per function) through
sinf_exact/cosf_exact/tanf_exact and compares bit patterns against the
host's libm sinf/cosf/tanf (the functions the compiled C++ reference
oracle calls). A zero mismatch count IS the bit-exactness proof for the
f64-emulation + algorithm-replication stack — there is no sampling gap.

The libm side runs through a tiny C helper compiled on first use (batch
calls, one pass per chunk). Run on CPU:

  python scripts/verify_exact_trig.py [--fn sinf,cosf,tanf] [--chunk 1<<24]

Writes a summary line per function and exits nonzero on any mismatch.
"""
from __future__ import annotations

import argparse
import ctypes
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

_C_SRC = r"""
#include <math.h>
#include <stdint.h>
typedef union { uint32_t u; float f; } pun;
#define DUMP(name, fn) \
  void name(const uint32_t* in, uint32_t* out, long n) { \
    for (long i = 0; i < n; i++) { pun a, b; a.u = in[i]; b.f = fn(a.f); \
      out[i] = b.u; } }
DUMP(dump_sinf, sinf)
DUMP(dump_cosf, cosf)
DUMP(dump_tanf, tanf)
"""


def _build_helper():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".trig_dump.so")
    src = cache.replace(".so", ".c")
    if not os.path.exists(cache):
        with open(src, "w") as f:
            f.write(_C_SRC)
        subprocess.run(["gcc", "-O2", "-shared", "-fPIC", src, "-o", cache,
                       "-lm"], check=True)
    lib = ctypes.CDLL(cache)
    for name in ("dump_sinf", "dump_cosf", "dump_tanf"):
        fn = getattr(lib, name)
        fn.argtypes = [np.ctypeslib.ndpointer(np.uint32),
                       np.ctypeslib.ndpointer(np.uint32), ctypes.c_long]
        fn.restype = None
    return lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fn", default="sinf,cosf,tanf")
    ap.add_argument("--chunk", type=int, default=1 << 23)
    ap.add_argument("--start-bits", type=lambda s: int(s, 0), default=0x0,
                    help="sweep |x| bit patterns from here. For sinf/cosf "
                         "the region below 2^-14 (0x38800000) is covered "
                         "structurally: both implementations take the "
                         "identical top-12-bit branch (libm+0x73739) and "
                         "return y / 1.0f verbatim, so exhaustive coverage "
                         "of the branch boundary region suffices")
    ap.add_argument("--limit-bits", type=lambda s: int(s, 0),
                    default=0x42F00000,  # 120.0f: the supported domain edge
                    help="sweep |x| bit patterns in [start, limit)")
    args = ap.parse_args()

    from marl_traffic_intersection_tpu.ops.exact_trig import (cosf_emulated,
                                                              sinf_emulated,
                                                              tanf_emulated)
    impls = {"sinf": sinf_emulated, "cosf": cosf_emulated, "tanf": tanf_emulated}
    lib = _build_helper()

    failed = False
    for name in args.fn.split(","):
        jfn = impls[name]   # eager: the emulated-f64 ops are per-op jitted
        cfn = getattr(lib, "dump_" + name)
        t0 = time.time()
        total = 0
        mismatches = 0
        examples = []
        for sign in (0, 0x80000000):
            start = args.start_bits
            while start < args.limit_bits:
                n = min(args.chunk, args.limit_bits - start)
                bits = (np.arange(start, start + n, dtype=np.uint64)
                        .astype(np.uint32) | np.uint32(sign))
                x = bits.view(np.float32)
                got = np.asarray(jfn(jnp.asarray(x))).view(np.uint32)
                want = np.empty(n, np.uint32)
                cfn(bits, want, n)
                bad = got != want
                nb = int(bad.sum())
                mismatches += nb
                total += n
                if nb and len(examples) < 10:
                    for j in np.nonzero(bad)[0][:10 - len(examples)]:
                        examples.append((hex(int(bits[j])), float(x[j]),
                                         hex(int(got[j])), hex(int(want[j]))))
                start += n
        dt = time.time() - t0
        print(f"{name}: {mismatches} mismatches over {total:,} inputs "
              f"({dt:.0f}s)", flush=True)
        for e in examples:
            print("   ", e, flush=True)
        failed |= mismatches > 0
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
