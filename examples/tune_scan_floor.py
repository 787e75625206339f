"""Int8-scan floor: whole-funnel variant comparison at bench shapes.

VERDICT r1 #5: the scan is ~80% of batch time at ~75% of int8 MXU peak.
This sweeps the strip-reduce variant (smaller live score tile) and a
32768-row block (previously failed remote Mosaic compile with the full
tile) against the production configuration, measuring the DENSE-ONLY
funnel end-to-end (per CLAUDE.md: kernel-internal rep loops at these
shapes hit pathological remote compiles — compare funnel variants).

Run: timeout 3000 python examples/tune_scan_floor.py
"""

from __future__ import annotations

import json
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

    n = int(os.environ.get("TUNE_N", 1_000_000))
    d = int(os.environ.get("TUNE_D", 768))
    batch = int(os.environ.get("TUNE_BATCH", 2048))
    k = 10
    n_eval = 128

    from rag_application_tpu.config import FunnelConfig, IndexConfig
    from rag_application_tpu.index.dense import DenseIndex
    from rag_application_tpu.ops.topk import blocked_topk
    from rag_application_tpu.search.fused import FusedSearcher

    log(f"backend={jax.default_backend()} n={n} d={d} batch={batch}")
    scale_dev = jnp.exp(-0.003 * jnp.arange(d, dtype=jnp.float32))
    gen = jax.jit(lambda key: jax.random.normal(
        key, (100_000, d), dtype=jnp.float32) * scale_dev)
    root = jax.random.PRNGKey(0)
    scan_block = 16384
    cap = 1 << (n - 1).bit_length()
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(128, 256),
                                   initial_capacity=cap))
    t0 = time.time()
    for i, s in enumerate(range(0, n, 100_000)):
        dense.insert(gen(jax.random.fold_in(root, i))[: min(100_000, n - s)])
    float(jnp.sum(dense.inv_norms[-1]))
    log(f"build {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)
    q_rows = rng.choice(n, size=batch, replace=False)
    queries = (dense.vecs[jnp.asarray(q_rows)].astype(jnp.float32)
               + 0.05 * jax.random.normal(jax.random.fold_in(root, 7),
                                          (batch, d), dtype=jnp.float32))
    queries = queries / jnp.linalg.norm(queries, axis=-1, keepdims=True)
    float(jnp.sum(queries))

    qe = queries[:n_eval]
    ex_v, ex_i = blocked_topk(dense.vecs, qe.astype(dense.vecs.dtype), k,
                              block_size=dense.cfg.block_size,
                              valid_n=dense.size, approx=False)
    ex_i = np.asarray(ex_i)
    log("oracle done")

    funnel = FunnelConfig(matryoshka_limits=(512, 256), dense_limit=24,
                          quantized_limit=32, sparse_limit=0, final_limit=k)
    results = []
    variants = [
        ("prod b16384 s1", 16384, 1, 1024),
        ("b16384 s2", 16384, 2, 1024),
        ("b16384 s4", 16384, 4, 1024),
        ("b32768 s4", 32768, 4, 1024),
        ("b32768 s8", 32768, 8, 1024),
        ("b32768 s4 qb512", 32768, 4, 512),
    ]
    for name, block, strips, qb in variants:
        try:
            searcher = FusedSearcher(dense, None, funnel,
                                     scan_impl="pallas",
                                     scan_block_rows=block,
                                     scan_approx_sheet=True,
                                     scan_q_block=qb,
                                     scan_strips=strips)
            prepared = searcher.prepare(queries, None)
            t0 = time.time()
            sc, ids = searcher.search_prepared(
                prepared, k, use_matryoshka=False, funnel=funnel)
            float(jnp.sum(sc))
            t_compile = time.time() - t0
            reps = 8
            t0 = time.time()
            for _ in range(reps):
                sc, ids = searcher.search_prepared(
                    prepared, k, use_matryoshka=False, funnel=funnel)
            float(jnp.sum(sc))
            dt = (time.time() - t0) / reps
            got = np.asarray(ids)[:n_eval]
            rec = float(np.mean([np.isin(ex_i[i], got[i]).mean()
                                 for i in range(n_eval)]))
            row = {"variant": name, "ms_batch": round(dt * 1e3, 2),
                   "qps": round(batch / dt, 1), "recall": round(rec, 4),
                   "compile_s": round(t_compile, 1)}
            results.append(row)
            log(f"{name}: {dt*1e3:.1f} ms -> {batch/dt:,.0f} QPS "
                f"recall {rec:.4f} (compile {t_compile:.0f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"{name} failed: {type(e).__name__}: {e}")
            results.append({"variant": name,
                            "error": f"{type(e).__name__}: {e}"[:200]})
    print(json.dumps({"n": n, "d": d, "batch": batch, "variants": results}))


if __name__ == "__main__":
    main()
