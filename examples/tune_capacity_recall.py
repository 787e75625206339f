"""Capacity-mode recall A/B across scan-block geometries at 10M scale.

The r5 QPS tune found block 32768/strips 2 fastest, but the full 10M
bench measured recall@10 0.9711 there vs r4's 0.9781 at 16384 — this
harness isolates the recall term: same deterministic corpus, same exact
f32 oracle, dense-only funnel recall per (block, strips) variant.

    python examples/tune_capacity_recall.py       # real chip
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("TUNE_PLATFORM"):
        os.environ["JAX_PLATFORMS"] = os.environ["TUNE_PLATFORM"]
    import jax

    if os.environ.get("TUNE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TUNE_PLATFORM"])
    import jax.numpy as jnp

    from rag_application_tpu.config import FunnelConfig, IndexConfig
    from rag_application_tpu.index.dense import DenseIndex
    from rag_application_tpu.ops.topk import blocked_topk
    from rag_application_tpu.search.fused import FusedSearcher

    n = int(os.environ.get("TUNE_N", 10_027_008))
    d = int(os.environ.get("TUNE_DIM", 768))
    n_eval = int(os.environ.get("TUNE_EVAL", 256))
    k = 10
    qlim = int(os.environ.get("TUNE_QLIM", 32))

    print(f"[recall] backend={jax.default_backend()} n={n} d={d} "
          f"eval={n_eval} qlim={qlim}", file=sys.stderr)
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                   store_bf16=False, initial_capacity=n))
    scale = jnp.exp(-0.003 * jnp.arange(d, dtype=jnp.float32))
    gen = jax.jit(lambda key: jax.random.normal(
        key, (100_000, d), dtype=jnp.float32) * scale)
    root = jax.random.PRNGKey(0)
    t0 = time.time()
    left = n
    i = 0
    while left > 0:
        ch = gen(jax.random.fold_in(root, i))[: min(100_000, left)]
        dense.insert(ch)
        if i % 20 == 19:
            float(jnp.sum(dense.live[:1]))
        i += 1
        left -= 100_000
    float(jnp.sum(dense.inv_norms[-1]))
    print(f"[recall] build {time.time()-t0:.1f}s", file=sys.stderr)
    assert dense.fully_live

    # noisy-near-dup queries from deterministic rows, built EXACTLY
    # like bench.py's make_queries (int8 rows / 127 + 0.05 noise —
    # note the un-dequantized rows carry ~5-12x norm, so the additive
    # noise is ~7x weaker relative than on unit rows; recall here is
    # only comparable to the bench's when the construction matches)
    rng = np.random.default_rng(3)
    q_idx = rng.integers(0, n, size=n_eval)
    rows = dense.int8[jnp.asarray(q_idx)].astype(jnp.float32) / 127.0
    q = rows + 0.05 * jax.random.normal(jax.random.PRNGKey(7), rows.shape)
    q = jax.device_put(q)
    qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    qb = qn.astype(jnp.bfloat16)

    # exact oracle: regenerate per-chunk, exact top-k per chunk, host merge
    t0 = time.time()
    parts_v, parts_i = [], []
    for i, s in enumerate(range(0, n, 100_000)):
        ch = gen(jax.random.fold_in(root, i))[: min(100_000, n - s)]
        chn = ch / jnp.linalg.norm(ch, axis=-1, keepdims=True)
        v, idx = blocked_topk(chn.astype(jnp.bfloat16), qb, k,
                              block_size=131072, valid_n=ch.shape[0],
                              approx=False)
        parts_v.append(np.asarray(v, np.float32))
        parts_i.append(np.asarray(idx) + s)
    av = np.concatenate(parts_v, axis=-1)
    ai = np.concatenate(parts_i, axis=-1)
    order = np.argsort(-av, axis=-1)[:, :k]
    ex_ids = np.take_along_axis(ai, order, axis=-1)
    print(f"[recall] oracle {time.time()-t0:.1f}s", file=sys.stderr)

    # TUNE_FUNNELS: comma list of qlim:dense_limit combos; each is
    # graded for recall AND timed at TUNE_BATCH random queries so one
    # run draws the recall/QPS frontier for the b32768_s2 geometry.
    combos = [tuple(int(v) for v in c.split(":")) for c in os.environ.get(
        "TUNE_FUNNELS", f"{qlim}:24").split(",")]
    geos = [("b16384_s1", 16384, 1), ("b32768_s2", 32768, 2),
            ("b32768_s4", 32768, 4)]
    if os.environ.get("TUNE_ONLY"):
        geos = [g for g in geos if g[0] == os.environ["TUNE_ONLY"]]
    batch = int(os.environ.get("TUNE_BATCH", 2048))
    qt = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(9), (batch, d), dtype=jnp.float32) * scale)
    float(jnp.sum(qt))
    reps = int(os.environ.get("TUNE_REPS", 8))
    out = {}
    for ql, dl in combos:
        funnel = FunnelConfig(matryoshka_limits=(), dense_limit=dl,
                              quantized_limit=ql, sparse_limit=0,
                              final_limit=k)
        for name, block, strips in geos:
            s = FusedSearcher(dense, None, funnel, scan_impl="pallas",
                              scan_block_rows=block,
                              scan_approx_sheet=True,
                              scan_q_block=1024 if batch > 1024 else 0,
                              scan_strips=strips)
            t0 = time.time()
            _, ids = s.search_prepared((q, None), k, use_matryoshka=False)
            got = np.asarray(ids)
            rec = float(np.mean([np.isin(ex_ids[i], got[i]).mean()
                                 for i in range(n_eval)]))
            v, _ = s.search_prepared((qt, None), k, use_matryoshka=False)
            float(jnp.sum(v))
            t1 = time.time()
            for _ in range(reps):
                v, _ = s.search_prepared((qt, None), k,
                                         use_matryoshka=False)
            float(jnp.sum(v))
            dt = (time.time() - t1) / reps * 1e3
            key = f"{name}_q{ql}d{dl}"
            out[key] = {"recall": round(rec, 4), "ms": round(dt, 2)}
            print(f"[recall] {key}: {rec:.4f} {dt:.2f} ms/batch "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr)
    out.update({"n": n, "n_eval": n_eval, "batch": batch,
                "backend": jax.default_backend()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
