"""Continuous-batching serving throughput (llm/scheduler.py).

Measures, on the real TPU, aggregate generated tokens/s for R
concurrent requests served two ways:
  * serialized: one fused `generate` dispatch per request, one request
    at a time — what `LocalLLM.chat` does WITHOUT batching;
  * batched: all requests share one decode batch via ContinuousBatcher
    (join at chunk boundaries, slot-map compaction).

The batcher pays one relay RTT per chunk (plus one per admission), so
its wall-clock includes real serving overhead — exactly the number a
deployment cares about. eos is unreachable so every request generates
exactly max_new tokens.

Run on the TPU:  timeout 3000 python examples/tune_batcher.py
Env: TUNE_HIDDEN (512), TUNE_LAYERS (8), TUNE_HEADS (8), TUNE_KV (4),
     TUNE_MLP (1536), TUNE_VOCAB (32000), TUNE_REQS (32), TUNE_SLOTS
     (8), TUNE_PROMPT (64), TUNE_NEW (128), TUNE_CHUNK (16),
     TUNE_HORIZON (256), TUNE_QUANT (0), TUNE_SPEC_K (0),
     TUNE_KV_QUANT (0), TUNE_SERIAL (1; 0 skips the
     serialized baseline), TUNE_LOOKAHEAD (2; chunks dispatched ahead
     of the oldest unread output — hides the relay RTT per chunk),
     TUNE_EXT (0; 1 = sampling_ext batcher with all-plain requests —
     the pure plane overhead; 2 = sampling_ext with a mixed load:
     1/3 grammar-constrained (JSON schema over a synthetic ASCII
     tokenizer), 1/3 penalized+biased, 1/3 plain).
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

import numpy as np

# runnable as `python examples/tune_batcher.py` from anywhere; do NOT
# use PYTHONPATH=/root/repo — it breaks the axon plugin registration
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%X')}]", *a, file=sys.stderr)


def main() -> None:
    # off-TPU smoke runs: pre-import env skips the axon plugin's
    # import-time discovery (which wedges on a dead relay)
    if os.environ.get("TUNE_PLATFORM"):
        os.environ["JAX_PLATFORMS"] = os.environ["TUNE_PLATFORM"]
    import jax

    if os.environ.get("TUNE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TUNE_PLATFORM"])
    import jax.numpy as jnp

    from rag_application_tpu.llm.scheduler import ContinuousBatcher
    from rag_application_tpu.models.decoder import (
        DecoderConfig,
        generate,
        init_decoder_params,
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
    )
    R = int(os.environ.get("TUNE_REQS", 32))
    SLOTS = int(os.environ.get("TUNE_SLOTS", 8))
    T = int(os.environ.get("TUNE_PROMPT", 64))
    NEW = int(os.environ.get("TUNE_NEW", 128))
    CHUNK = int(os.environ.get("TUNE_CHUNK", 16))
    HORIZON = int(os.environ.get("TUNE_HORIZON", 256))
    SPEC_K = int(os.environ.get("TUNE_SPEC_K", 0))
    LOOKAHEAD = int(os.environ.get("TUNE_LOOKAHEAD", 2))
    KVQ = os.environ.get("TUNE_KV_QUANT", "0") == "1"
    log(f"cfg={cfg}")
    log(f"R={R} slots={SLOTS} prompt={T} new={NEW} chunk={CHUNK} "
        f"horizon={HORIZON}")

    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    quant = os.environ.get("TUNE_QUANT", "0") == "1"
    if quant:
        params = quantize_decoder_params(params)
    log(f"params: {n_params/1e6:.1f}M quant={quant}")

    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, cfg.vocab_size, T)) for _ in range(R)]
    eos = cfg.vocab_size  # unreachable

    # ---- serialized baseline: one fused dispatch per request, in turn
    serial_s = None
    if os.environ.get("TUNE_SERIAL", "1") == "1":
        ids0 = np.asarray([prompts[0]], np.int32)
        plen = np.asarray([T], np.int32)
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        out, _ = generate(params, cfg, ids0, plen, NEW, eos, 0, key, 0.0)
        float(jnp.sum(out))
        log(f"solo generate compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        for r in range(R):
            out, _ = generate(params, cfg,
                              np.asarray([prompts[r]], np.int32), plen,
                              NEW, eos, 0, key, 0.0)
            float(jnp.sum(out))
        serial_s = time.time() - t0
        log(f"serialized: {serial_s:.2f}s -> {R*NEW/serial_s:,.0f} tok/s")

    # ---- continuous batching: R requests share SLOTS rows
    EXT = int(os.environ.get("TUNE_EXT", "0"))
    ext_kw = [dict() for _ in range(R)]  # per-request submit extras
    constraint = None
    if EXT == 2:
        from rag_application_tpu.models.constrain import compile_schema

        class _AsciiTok:  # synthetic: id i contributes one ASCII byte
            def decode(self, ids):
                return "".join(chr(32 + i % 95) for i in ids)

        constraint = compile_schema(
            {"type": "object", "properties": {
                "name": {"type": "string", "minLength": 1, "maxLength": 6},
                "count": {"type": "integer", "minimum": 0,
                          "maximum": 99999},
                "kind": {"enum": ["alpha", "beta"]}}},
            _AsciiTok(), cfg.vocab_size)
        bias = np.zeros((cfg.vocab_size,), np.float32)
        bias[7] = 5.0
        for i in range(R):
            if i % 3 == 1:
                ext_kw[i] = dict(presence=0.6, frequency=1.1,
                                 logit_bias=bias)
        log(f"ext mixed load: constraint table {constraint.table.shape}, "
            f"{sum(1 for i in range(R) if i % 3 == 0)} constrained / "
            f"{sum(1 for i in range(R) if i % 3 == 1)} penalized")

    async def run_batched():
        b = ContinuousBatcher(params, cfg, slots=SLOTS, prompt_pad=T,
                              horizon=HORIZON, chunk=CHUNK,
                              spec_k=SPEC_K, lookahead=LOOKAHEAD,
                              sampling_ext=EXT > 0)
        if constraint is not None:
            cid = b.register_constraint(constraint)
            for i in range(R):
                if i % 3 == 0:
                    # constrained rows: their OWN eos stays unreachable
                    # (the grammar's accept gate uses the request eos,
                    # which the random model reaches quickly — too
                    # little work to time), so cap by max_new like the
                    # other rows and let the DFA just ride along
                    ext_kw[i] = dict(constraint_id=cid)
        # compile pass: one request end-to-end (prefill_row+chunk+compact
        # all get compiled here so the timed run is compile-free)
        await b.submit(prompts[0], max_new=NEW, **ext_kw[0])
        if EXT == 2:  # also compile the ext admission variant
            await b.submit(prompts[1], max_new=NEW, **ext_kw[1])
        log(f"batched warmup done (steps={b.steps}, "
            f"compactions={b.compactions})")
        t0 = time.time()
        outs = await asyncio.gather(*[
            b.submit(p, max_new=NEW, **kw)
            for p, kw in zip(prompts, ext_kw)])
        dt = time.time() - t0
        n_tok = sum(len(o) for o in outs)
        return dt, n_tok, b.steps, b.compactions

    batch_s, n_tok, steps, compactions = asyncio.run(run_batched())
    log(f"batched: {batch_s:.2f}s -> {n_tok/batch_s:,.0f} tok/s "
        f"(steps={steps}, compactions={compactions})")

    rec = {
        "params_m": round(n_params / 1e6, 1), "quant": quant,
        "reqs": R, "slots": SLOTS, "prompt": T, "new": NEW,
        "chunk": CHUNK, "horizon": HORIZON, "spec_k": SPEC_K,
        "kv_quant": KVQ, "lookahead": LOOKAHEAD, "ext": EXT,
        "batched_s": round(batch_s, 2),
        "batched_tok_s": round(n_tok / batch_s),
        "compactions": compactions,
    }
    if serial_s is not None:
        rec["serialized_s"] = round(serial_s, 2)
        rec["serialized_tok_s"] = round(R * NEW / serial_s)
        rec["speedup"] = round(batch_s and (R * NEW / batch_s) /
                               (R * NEW / serial_s), 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
