"""Capacity-mode (int8 + per-row recip) scan tuning — VERDICT r4 #5.

Measures the dense-only funnel ms/batch on a capacity-mode table across
the {mask plane, scan block/strips} grid, to close the last ~1.5% at
10M (the per-row recip multiply residue). Run on the real chip:

    TUNE_N=2097152 python examples/tune_capacity_scan.py

Prints one JSON line with ms/batch per variant.
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
    from rag_application_tpu.ops.fused_topk import fused_scan_topk
    from rag_application_tpu.search.fused import FusedSearcher

    n = int(os.environ.get("TUNE_N", 2_097_152))
    d = int(os.environ.get("TUNE_DIM", 768))
    batch = int(os.environ.get("TUNE_BATCH", 2048))
    qb = int(os.environ.get("TUNE_QBLOCK", 1024))
    reps = int(os.environ.get("TUNE_REPS", 8))
    # TUNE_STORE=full: bf16+int8 layout (the 1M headline config) — the
    # scan runs the pure packed path; capacity (default) runs
    # packed_scaled with per-row recips
    full = os.environ.get("TUNE_STORE") == "full"
    k = 10

    print(f"[tune] backend={jax.default_backend()} n={n} d={d} "
          f"batch={batch} store={'full' if full else 'int8'}",
          file=sys.stderr)
    dense = DenseIndex(IndexConfig(dim=d, matryoshka_dims=(),
                                   store_bf16=full, initial_capacity=n))
    scale = jnp.exp(-0.003 * jnp.arange(d, dtype=jnp.float32))
    chunk = min(131_072, n)
    gen = jax.jit(lambda key: jax.random.normal(
        key, (chunk, d), dtype=jnp.float32) * scale)
    root = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(n // chunk):
        dense.insert(gen(jax.random.fold_in(root, i)))
    float(jnp.sum(dense.inv_norms[-1]))
    print(f"[tune] build {time.time()-t0:.1f}s", file=sys.stderr)
    assert dense.fully_live and (full or dense.int8_recip is not None)

    rows = dense.int8[jnp.asarray(
        np.random.default_rng(0).integers(0, n, batch))]
    q = rows.astype(jnp.float32)
    if not full:
        q = q * dense.int8_recip[:batch, None]
    q = q + 0.05 * jax.random.normal(jax.random.PRNGKey(1), q.shape)
    q = jax.device_put(q)
    float(jnp.sum(q))

    funnel = FunnelConfig(matryoshka_limits=(), dense_limit=24,
                          quantized_limit=32, sparse_limit=0,
                          final_limit=k)
    out = {}
    variants = [
        ("b16384_s1_masked", 16384, 1, True, False),
        ("b16384_s1_live", 16384, 1, False, False),
        ("b32768_s4_live", 32768, 4, False, False),
        ("b32768_s4_masked", 32768, 4, True, False),
        ("b32768_s2_live", 32768, 2, False, False),
        # strip_outputs: rows-per-bin drops back to block/strips/128,
        # which re-enables the PACKED reduce at b32768 in full mode
        # (the running-max layout overflows the int32 packing there)
        ("b32768_s4_so_masked", 32768, 4, True, True),
        ("b32768_s4_so_live", 32768, 4, False, True),
        ("b32768_s2_so_masked", 32768, 2, True, True),
    ]
    if os.environ.get("TUNE_VARIANTS"):
        allow = set(os.environ["TUNE_VARIANTS"].split(","))
        variants = [v for v in variants if v[0] in allow]
    for name, block, strips, masked, so in variants:
        if os.environ.get("TUNE_ONLY") and name != os.environ["TUNE_ONLY"]:
            continue
        dense.has_deletes = masked
        s = FusedSearcher(dense, None, funnel, scan_impl="pallas",
                          scan_block_rows=block, scan_approx_sheet=True,
                          scan_q_block=qb, scan_strips=strips,
                          scan_strip_outputs=so)
        try:
            t0 = time.time()
            v, ids = s.search_prepared((q, None), k, use_matryoshka=False)
            float(jnp.sum(v))
            t_compile = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                v, ids = s.search_prepared((q, None), k,
                                           use_matryoshka=False)
            float(jnp.sum(v))
            dt = (time.time() - t0) / reps * 1e3
            out[name] = round(dt, 2)
            print(f"[tune] {name}: {dt:.2f} ms/batch "
                  f"(compile {t_compile:.0f}s, path "
                  f"{fused_scan_topk.last_path})", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            out[name] = f"FAIL {type(e).__name__}"
            print(f"[tune] {name} failed: {e}", file=sys.stderr)
    out.update({"n": n, "d": d, "batch": batch,
                "backend": jax.default_backend()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
