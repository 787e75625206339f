"""On-chip decoder generation throughput (models/decoder.py).

Measures, on the real TPU:
  * prefill tokens/s (batch x seq prompt ingestion), and
  * fused-decode tokens/s (the `lax.while_loop` generate — the WHOLE
    multi-token completion is one device dispatch, so per-dispatch
    timing through the relay is already relay-immune: time 2-3
    dispatches, take min, divide by tokens generated).

eos_id is set to vocab_size so no row ever stops early and every run
generates exactly max_new tokens (sampled ids are always < vocab).

Run on the TPU:  timeout 3000 python examples/tune_decoder.py
Env: TUNE_HIDDEN (512), TUNE_LAYERS (8), TUNE_HEADS (8), TUNE_KV (4),
     TUNE_MLP (1536), TUNE_VOCAB (32000), TUNE_MAXLEN (1024),
     TUNE_BATCH (8), TUNE_PROMPT (128), TUNE_NEW (128), TUNE_DTYPE
     (bfloat16), TUNE_QUANT (0; 1 = weight-only int8), TUNE_KV_QUANT
     (0; 1 = int8 KV cache — halves the per-step cache traffic term).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# runnable as `python examples/tune_decoder.py` from anywhere; do NOT
# use PYTHONPATH=/root/repo — it breaks the axon plugin registration
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%X')}]", *a, file=sys.stderr)


def main() -> None:
    # TUNE_PLATFORM=cpu: off-TPU smoke runs. Pre-import env skips the
    # axon plugin's import-time discovery (wedges on a dead relay); the
    # config update overrides sitecustomize's programmatic platform.
    if os.environ.get("TUNE_PLATFORM"):
        os.environ["JAX_PLATFORMS"] = os.environ["TUNE_PLATFORM"]
    import jax
    import jax.numpy as jnp

    if os.environ.get("TUNE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TUNE_PLATFORM"])

    from rag_application_tpu.models.decoder import (
        DecoderConfig,
        generate,
        init_decoder_params,
        init_kv_cache,
        prefill,
        quantize_decoder_params,
    )

    cfg = DecoderConfig(
        vocab_size=int(os.environ.get("TUNE_VOCAB", 32000)),
        hidden=int(os.environ.get("TUNE_HIDDEN", 512)),
        num_layers=int(os.environ.get("TUNE_LAYERS", 8)),
        heads=int(os.environ.get("TUNE_HEADS", 8)),
        kv_heads=int(os.environ.get("TUNE_KV", 4)),
        mlp_dim=int(os.environ.get("TUNE_MLP", 1536)),
        max_len=int(os.environ.get("TUNE_MAXLEN", 1024)),
        dtype=os.environ.get("TUNE_DTYPE", "bfloat16"),
        kv_quant=os.environ.get("TUNE_KV_QUANT", "0") == "1",
        decode_unroll=os.environ.get("TUNE_UNROLL", "1") == "1",
        attn_kernel=os.environ.get("TUNE_ATTN_KERNEL", "0") == "1",
    )
    B = int(os.environ.get("TUNE_BATCH", 8))
    T = int(os.environ.get("TUNE_PROMPT", 128))
    NEW = int(os.environ.get("TUNE_NEW", 128))
    log(f"cfg={cfg} B={B} prompt={T} new={NEW}")

    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    log(f"params: {n_params/1e6:.1f}M ({n_params*2/2**30:.2f} GiB bf16)")
    quant = os.environ.get("TUNE_QUANT", "0") == "1"
    if quant:
        params = quantize_decoder_params(params)
        nbytes = sum(v.nbytes for v in jax.tree.leaves(params))
        log(f"weight-only int8: {nbytes/2**30:.2f} GiB on device")

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    plen = jnp.full((B,), T, jnp.int32)
    eos = cfg.vocab_size  # unreachable: no early stop
    key = jax.random.PRNGKey(1)

    # ---- prefill timing (single dispatch per call; host-read close)
    pf = jax.jit(lambda p, i, L: prefill(p, cfg, i, L,
                                         *init_kv_cache(cfg, B))[0])
    t0 = time.time()
    float(jnp.sum(pf(params, ids, plen)))
    log(f"prefill compile+run {time.time()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(pf(params, ids, plen)))
        times.append(time.time() - t0)
    prefill_s = min(times)
    prefill_tps = B * T / prefill_s
    log(f"prefill: {prefill_s*1e3:.1f} ms -> {prefill_tps:,.0f} tok/s")

    # ---- fused generate timing (one dispatch generates B*NEW tokens)
    # TUNE_TEMP=0 isolates the sampling term (argmax path, no top-k).
    # TUNE_LORA=N serves N random rank-8 adapters round-robin across the
    # batch rows (multi-LoRA overhead measurement; 0 = off).
    temp = float(os.environ.get("TUNE_TEMP", "1.0"))
    n_lora = int(os.environ.get("TUNE_LORA", "0"))
    lora = None
    if n_lora:
        from rag_application_tpu.models.lora import lora_banks

        k = jax.random.PRNGKey(123)
        trees = []
        for _ in range(n_lora):
            tree = {}
            for t, fin, fout in (("wq", cfg.hidden, cfg.hidden),
                                 ("wk", cfg.hidden,
                                  cfg.kv_heads * cfg.head_dim),
                                 ("wv", cfg.hidden,
                                  cfg.kv_heads * cfg.head_dim),
                                 ("wo", cfg.hidden, cfg.hidden)):
                k, k1, k2 = jax.random.split(k, 3)
                tree[t] = {
                    "a": jax.random.normal(
                        k1, (cfg.num_layers, fin, 8)) * 0.05,
                    "b": jax.random.normal(
                        k2, (cfg.num_layers, 8, fout)) * 0.05}
            trees.append(tree)
        lora = {"banks": lora_banks(trees),
                "aid": jnp.arange(B, dtype=jnp.int32) % (n_lora + 1)}
        log(f"multi-LoRA: {n_lora} adapters round-robin over {B} rows")
    t0 = time.time()
    out, n = generate(params, cfg, ids, plen, NEW, eos, 0, key,
                      temp, 64, 0.9, lora)
    float(jnp.sum(out))
    log(f"generate compile+run {time.time()-t0:.1f}s "
        f"(n per row: {int(np.asarray(n)[0])})")
    assert int(np.asarray(n).min()) >= NEW - 1  # pad-id collisions aside
    times = []
    for r in range(3):
        t0 = time.time()
        out, _ = generate(params, cfg, ids, plen, NEW, eos, 0,
                          jax.random.fold_in(key, r), temp, 64, 0.9, lora)
        float(jnp.sum(out))
        times.append(time.time() - t0)
    gen_s = min(times)
    # generate includes the prefill; decode-only rate subtracts it.
    # Below ~5% of the dispatch the subtraction is measurement noise
    # (tiny smoke shapes) — report the conservative whole-dispatch rate
    # instead of a nonsense spike.
    decode_s = max(gen_s - prefill_s, 0.05 * gen_s)
    print(json.dumps({
        "params_m": round(n_params / 1e6, 1),
        "quant": quant, "kv_quant": cfg.kv_quant,
        "batch": B, "prompt": T, "new": NEW,
        "prefill_ms": round(prefill_s * 1e3, 2),
        "prefill_tok_s": round(prefill_tps),
        "generate_ms": round(gen_s * 1e3, 2),
        "decode_tok_s": round(B * NEW / decode_s),
        "decode_ms_per_token": round(decode_s / NEW * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
