"""Drive the int8 KV cache on the REAL TPU: fused generate with
kv_quant on/off (token agreement + timing) and a continuous-batching
pass with the quantized cache."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(f"[{time.strftime('%X')}]", *a, flush=True)


def main():
    import jax, jax.numpy as jnp
    log("devices:", jax.devices())
    from dataclasses import replace
    from rag_application_tpu.models.decoder import (
        DecoderConfig, generate, init_decoder_params)

    cfg = DecoderConfig(vocab_size=2048, hidden=256, num_layers=4, heads=8,
                        kv_heads=4, mlp_dim=512, max_len=512)
    qcfg = replace(cfg, kv_quant=True)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T, NEW = 8, 64, 64
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    plen = jnp.full((B,), T, jnp.int32)
    key = jax.random.PRNGKey(1)
    eos = cfg.vocab_size  # unreachable

    t0 = time.time()
    out_f, _ = generate(params, cfg, ids, plen, NEW, eos, 0, key, 0.0)
    sf = float(jnp.sum(out_f)); log(f"f32-cache generate compile+run {time.time()-t0:.1f}s sum={sf}")
    t0 = time.time()
    out_q, _ = generate(params, qcfg, ids, plen, NEW, eos, 0, key, 0.0)
    sq = float(jnp.sum(out_q)); log(f"int8-cache generate compile+run {time.time()-t0:.1f}s sum={sq}")
    agree = (np.asarray(out_f) == np.asarray(out_q)).mean()
    log(f"greedy token agreement bf16 vs int8 cache: {agree:.3f}")
    # Quantization noise forks greedy paths early on an UNTRAINED random
    # model (near-uniform logits -> any epsilon flips the argmax, and
    # the fork compounds); measured 0.43 on the TPU bf16 backend vs
    # ~0.8 on CPU f32. Informational here — exactness is proven by the
    # CPU test suite's token-identity checks on shared-prefix paths.
    if agree < 0.2:
        raise AssertionError(f"agreement {agree:.3f} too low even for "
                             "an untrained model — likely a real bug")

    def t3(c):
        ts = []
        for r in range(3):
            t0 = time.time()
            o, _ = generate(params, c, ids, plen, NEW, eos, 0,
                            jax.random.fold_in(key, r), 0.0)
            float(jnp.sum(o)); ts.append(time.time() - t0)
        return min(ts)

    tf, tq = t3(cfg), t3(qcfg)
    log(f"generate min-of-3: f32-cache {tf*1e3:.1f} ms, int8-cache {tq*1e3:.1f} ms")

    # batcher with the quantized cache on the chip
    import asyncio
    from rag_application_tpu.llm.scheduler import ContinuousBatcher

    async def run():
        b = ContinuousBatcher(params, qcfg, slots=4, prompt_pad=16,
                              horizon=64, chunk=8)
        prompts = [list(rng.integers(1, cfg.vocab_size, 8)) for _ in range(4)]
        outs = await asyncio.gather(*[
            b.submit(p, max_new=24) for p in prompts])
        return outs

    t0 = time.time()
    outs = asyncio.run(run())
    log(f"batcher int8-cache 4x24 tokens {time.time()-t0:.1f}s lens={[len(o) for o in outs]}")
    assert all(len(o) == 24 for o in outs)
    log("DRIVE OK")


main()
