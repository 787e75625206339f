"""IVF vs scan-funnel measurement at 1M x 768 on a CLUSTERED corpus.

The ANN leg's declared niche (docs/ann.md): clustered data, single-query
latency, corpora too big to full-scan. This script produces the
(recall, QPS, p50) table backing that claim: IVF probes sweep vs the
production scan funnel on the same corpus, same oracle (exact f32
dense top-10).

Run on the TPU:  timeout 3000 python examples/tune_ivf.py
Env: TUNE_N (1M), TUNE_D (768), TUNE_CLUSTERS (1000), TUNE_NOISE (0.25),
     TUNE_BATCH (256).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# runnable as `python examples/tune_ivf.py` from anywhere; do NOT use
# PYTHONPATH=/root/repo for this — it breaks the axon plugin's
# registration at interpreter startup
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%X')}]", *a, file=sys.stderr)
    sys.stderr.flush()


def main():
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("TUNE_N", 1_000_000))
    d = int(os.environ.get("TUNE_D", 768))
    n_true = int(os.environ.get("TUNE_CLUSTERS", 1000))
    noise = float(os.environ.get("TUNE_NOISE", 0.25))
    batch = int(os.environ.get("TUNE_BATCH", 256))
    n_eval = 128
    k = 10

    from rag_application_tpu.config import FunnelConfig, IndexConfig
    from rag_application_tpu.index.dense import DenseIndex
    from rag_application_tpu.index.ivf import IVFIndex, IVFSearchParams
    from rag_application_tpu.ops.topk import blocked_topk
    from rag_application_tpu.search.fused import FusedSearcher

    log(f"backend={jax.default_backend()} n={n} d={d} "
        f"clusters={n_true} noise={noise}")
    rng = np.random.default_rng(0)

    # ---- clustered corpus, generated on device (relay-friendly) ----
    root = jax.random.PRNGKey(0)
    centers = jax.random.normal(jax.random.fold_in(root, 999),
                                (n_true, d), dtype=jnp.float32)

    def gen_chunk(i, assign_dev):
        key = jax.random.fold_in(root, i)
        x = centers[assign_dev] + noise * jax.random.normal(
            key, (assign_dev.shape[0], d), dtype=jnp.float32)
        return x

    gen_chunk_j = jax.jit(gen_chunk, static_argnums=())

    scan_block = 16384
    cap = 1 << (n - 1).bit_length()
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(128, 256),
                                   initial_capacity=cap))
    assign_all = rng.integers(0, n_true, n)
    t0 = time.time()
    for i, s in enumerate(range(0, n, 100_000)):
        m = min(100_000, n - s)
        a = jnp.asarray(assign_all[s:s + m].astype(np.int32))
        dense.insert(gen_chunk_j(i, a))
    float(jnp.sum(dense.inv_norms[-1]))
    log(f"dense build: {time.time()-t0:.1f}s")

    # ---- queries: corpus rows + noise ----
    q_rows = rng.choice(n, size=max(batch, n_eval), replace=False)
    qk = jax.random.fold_in(root, 777)
    queries = (dense.vecs[jnp.asarray(q_rows)].astype(jnp.float32)
               + 0.05 * jax.random.normal(qk, (len(q_rows), d),
                                          dtype=jnp.float32))
    queries = queries / jnp.linalg.norm(queries, axis=-1, keepdims=True)
    float(jnp.sum(queries))

    # ---- oracle: exact dense top-10 (bf16 matmul, exact top_k) ----
    t0 = time.time()
    qe = queries[:n_eval]
    ex_vals, ex_ids = blocked_topk(
        dense.vecs, qe.astype(dense.vecs.dtype), k,
        block_size=dense.cfg.block_size, valid_n=dense.size, approx=False)
    ex_ids = np.asarray(ex_ids)
    log(f"oracle: {time.time()-t0:.1f}s")

    results = {"n": n, "d": d, "clusters": n_true, "noise": noise,
               "batch": batch}

    # ---- IVF build ----
    n_clusters = int(os.environ.get("TUNE_IVF_CLUSTERS", 4096))
    t0 = time.time()
    ivf = IVFIndex.build(dense, n_clusters=n_clusters, bucket_rows=64,
                         iters=10)
    float(jnp.sum(ivf.centroids))
    results["ivf_build_s"] = round(time.time() - t0, 1)
    log(f"ivf build (C={n_clusters}): {results['ivf_build_s']}s "
        f"buckets={ivf.bucket_tbl.shape[0]}")

    # ---- IVF probes sweep ----
    results["ivf"] = []
    for probes in (32, 64, 128, 256):
        p = IVFSearchParams(probes=probes, rescore_limit=128)
        try:
            t0 = time.time()
            v, ids = ivf.search(queries[:batch], k, params=p)
            float(jnp.sum(v))
            t_compile = time.time() - t0
            got = np.asarray(ivf.search(qe, k, params=p)[1])
            rec = float(np.mean([np.isin(ex_ids[i], got[i]).mean()
                                 for i in range(n_eval)]))
            reps = 8
            t0 = time.time()
            for _ in range(reps):
                v, ids = ivf.search(queries[:batch], k, params=p)
            float(jnp.sum(v))
            dt = (time.time() - t0) / reps
            # single-query p50 (per-dispatch, incl relay RTT)
            lat = []
            for _ in range(9):
                t1 = time.time()
                v1, _ = ivf.search(queries[:1], k, params=p)
                float(jnp.sum(v1))
                lat.append(time.time() - t1)
            p50 = sorted(lat)[len(lat) // 2] * 1e3
            row = {"probes": probes, "recall": round(rec, 4),
                   "qps": round(batch / dt, 1),
                   "ms_batch": round(dt * 1e3, 2),
                   "p50_single_ms": round(p50, 1),
                   "compile_s": round(t_compile, 1)}
            results["ivf"].append(row)
            log(f"ivf probes={probes}: recall={rec:.4f} "
                f"{dt*1e3:.1f} ms/b -> {batch/dt:,.0f} QPS p50={p50:.0f}ms")
        except Exception as e:  # noqa: BLE001
            log(f"ivf probes={probes} failed: {type(e).__name__}: {e}")

    # ---- scan funnel (dense-only) on the same corpus ----
    try:
        funnel = FunnelConfig(matryoshka_limits=(512, 256), dense_limit=24,
                              quantized_limit=32, sparse_limit=0,
                              final_limit=k)
        searcher = FusedSearcher(dense, None, funnel, scan_impl="pallas",
                                 scan_block_rows=scan_block,
                                 scan_approx_sheet=True, scan_q_block=0)
        t0 = time.time()
        s, ids = searcher.search(queries[:batch], None, k,
                                 use_matryoshka=False)
        float(jnp.sum(s))
        t_compile = time.time() - t0
        got = np.asarray(searcher.search(qe, None, k,
                                         use_matryoshka=False)[1])
        rec = float(np.mean([np.isin(ex_ids[i], got[i]).mean()
                             for i in range(n_eval)]))
        reps = 8
        t0 = time.time()
        for _ in range(reps):
            s, ids = searcher.search(queries[:batch], None, k,
                                     use_matryoshka=False)
        float(jnp.sum(s))
        dt = (time.time() - t0) / reps
        lat = []
        for _ in range(9):
            t1 = time.time()
            s1, _ = searcher.search(queries[:1], None, k,
                                    use_matryoshka=False)
            float(jnp.sum(s1))
            lat.append(time.time() - t1)
        p50 = sorted(lat)[len(lat) // 2] * 1e3
        results["scan"] = {"recall": round(rec, 4),
                           "qps": round(batch / dt, 1),
                           "ms_batch": round(dt * 1e3, 2),
                           "p50_single_ms": round(p50, 1),
                           "compile_s": round(t_compile, 1)}
        log(f"scan funnel: recall={rec:.4f} {dt*1e3:.1f} ms/b -> "
            f"{batch/dt:,.0f} QPS p50={p50:.0f}ms")
    except Exception as e:  # noqa: BLE001
        log(f"scan leg failed: {type(e).__name__}: {e}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
