"""Is int4 matmul faster than int8 on this chip? (scan-floor follow-up)

Host-side measurement says an int4 corpus plane with int8 queries keeps
candidate recall@qlim64 at 0.998 on 1M x 768 (CLAUDE.md r2 notes), so
IF the MXU runs s4 contractions at 2x s8 rate, the scan floor halves.
This times the raw contraction: s8xs8, s8xs4, s4xs4, all (Q,d)x(B,d)
-> s32 at bench-ish shapes, relay-immune (reps via lax.scan inside one
jit, carry-summed).

Run: timeout 1200 python examples/tune_int4.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%X')}]", *a, file=sys.stderr)
    sys.stderr.flush()


def main():
    import jax
    import jax.numpy as jnp

    q, b, d = 1024, 16384, 768
    reps = 64
    log(f"backend={jax.default_backend()} shapes q={q} b={b} d={d} "
        f"reps={reps}")
    rng = np.random.default_rng(0)
    # per CLAUDE.md: scan over an (R, ...) QUERY STACK — a loop-invariant
    # matmul would be hoisted by XLA LICM and time one matmul + R adds
    qstack8 = jnp.asarray(rng.integers(-127, 128, (reps, q, d)),
                          dtype=jnp.int8)
    cs8 = jnp.asarray(rng.integers(-127, 128, (b, d)), dtype=jnp.int8)

    def timed(name, qstack, ca):
        def body(carry, qa):
            s = jax.lax.dot_general(
                qa, ca, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return carry + jnp.sum(s, dtype=jnp.int32), None

        f = jax.jit(lambda qs, c: jax.lax.scan(
            body, jnp.int32(0), qs)[0])
        f = functools.partial(f, qstack, ca)
        try:
            t0 = time.time()
            v = f()
            int(v)
            compile_s = time.time() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                int(f())
                best = min(best, time.time() - t0)
            per = best / reps * 1e3
            tops = 2 * q * b * d / (per / 1e3) / 1e12
            log(f"{name}: {per:.3f} ms/matmul -> {tops:.0f} TOPS "
                f"(compile {compile_s:.0f}s)")
            return per
        except Exception as e:  # noqa: BLE001
            log(f"{name} failed: {type(e).__name__}: {e}")
            return None

    t8 = timed("s8 x s8", qstack8, cs8)
    try:
        cs4 = cs8.astype(jnp.int4)  # values exceed int4 range; timing only
        qstack4 = qstack8.astype(jnp.int4)
    except Exception as e:  # noqa: BLE001
        log(f"int4 dtype unavailable: {e}")
        return
    t84 = timed("s8 x s4", qstack8, cs4)
    t44 = timed("s4 x s4", qstack4, cs4)
    if t8 and t44:
        log(f"speedup s4xs4 vs s8xs8: {t8 / t44:.2f}x")
    if t8 and t84:
        log(f"speedup s8xs4 vs s8xs8: {t8 / t84:.2f}x")
    # storage check: is the int4 plane actually packed on device?
    log(f"int4 corpus nbytes={cs4.nbytes} (int8: {cs8.nbytes})")


if __name__ == "__main__":
    main()
