"""Root-cause harness for `spec_identical=false` on-chip (VERDICT r3 #3).

Greedy prompt-lookup speculation (models/speculative.py) is argmax-exact
vs the plain loop in f32 (CPU tests), but the bench leg has reported
divergence on the TPU for two rounds. Both paths use exact
`jnp.argmax`; the suspect is the bf16 forward itself — a (1, K+1)
verify block and a (1, 1) step can round logits differently (different
fusion/tiling of the same math), flipping near-ties.

This harness measures exactly that:
 1. run plain + spec generate, find the first divergent output index;
 2. teacher-force the agreed prefix, then compute the next-token logits
    through BOTH block shapes on the same cache state;
 3. report max|logit diff|, the top-2 margin at the divergence, and
    whether the argmax flips — plus, over the whole run, the margin
    distribution of steps where the two shapes disagree.

Run on the TPU:  timeout 3000 python examples/diag_spec.py
Env: TUNE_* model knobs as tune_decoder.py; TUNE_NEW (256), TUNE_PROMPT
     (64), TUNE_SPEC_K (4), DIAG_SEEDS (5).
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


def main() -> None:
    if os.environ.get("TUNE_PLATFORM"):
        os.environ["JAX_PLATFORMS"] = os.environ["TUNE_PLATFORM"]
    import jax
    import jax.numpy as jnp

    if os.environ.get("TUNE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TUNE_PLATFORM"])

    from functools import partial

    from rag_application_tpu.models.decoder import (
        DecoderConfig,
        _project,
        forward,
        generate,
        init_decoder_params,
        init_kv_cache,
        prefill,
    )
    from rag_application_tpu.models.speculative import (
        DEAD,
        generate_lookup_stats,
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
    )
    T = int(os.environ.get("TUNE_PROMPT", 64))
    NEW = int(os.environ.get("TUNE_NEW", 256))
    K = int(os.environ.get("TUNE_SPEC_K", 4))
    seeds = int(os.environ.get("DIAG_SEEDS", 5))
    log(f"cfg={cfg} prompt={T} new={NEW} k={K}")

    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    eos = cfg.vocab_size  # unreachable

    @partial(jax.jit, static_argnums=(1, 3))
    def block_logits(p, cfg, prefix, block_w, prompt_len):
        """Teacher-force `prefix` (1, L) then run ONE decode block of
        width `block_w` whose first input is prefix[-1]... actually:
        prefill prefix[:-1], then a block starting at prefix[-1],
        remaining inputs zeros (they only affect later rows). Returns
        row-0 logits of the block — the next-token distribution."""
        B, L = prefix.shape
        S = L + block_w + 1
        ck, cv = init_kv_cache(cfg, 1, S)
        s_idx = jnp.arange(S, dtype=jnp.int32)
        slot_pos = jnp.where(s_idx < L - 1, s_idx,
                             jnp.asarray(DEAD, jnp.int32))[None, :]
        # prefill everything but the last prefix token
        _, ck, cv = prefill(p, cfg, prefix[:, :-1],
                            jnp.asarray([L - 1], jnp.int32), ck, cv)
        x = jnp.zeros((1, block_w), jnp.int32)
        x = x.at[0, 0].set(prefix[0, -1])
        positions = (L - 1 + jnp.arange(block_w, dtype=jnp.int32))[None, :]
        slot_pos = jax.lax.dynamic_update_slice(
            slot_pos, positions, (0, L - 1))
        hidden, ck, cv = forward(p, cfg, x, positions, ck, cv,
                                 write_slot=L - 1, slot_positions=slot_pos)
        return _project(p, cfg, hidden[0])[0]  # (V,)

    results = []
    for seed in range(seeds):
        rng = np.random.default_rng(seed)
        phrase = rng.integers(1, cfg.vocab_size, 8)
        ids = jnp.asarray(np.tile(phrase, T // 8)[None, :T].astype(np.int32))
        plen = jnp.asarray([T], jnp.int32)
        key = jax.random.PRNGKey(1)

        out_p, n_p = generate(params, cfg, ids, plen, NEW, eos, 0, key, 0.0)
        out_s, n_s, steps = generate_lookup_stats(
            params, cfg, ids, plen, NEW, eos, 0, key, K)
        a_p = np.asarray(out_p)[0]
        a_s = np.asarray(out_s)[0]
        div = int(np.argmax(a_p != a_s)) if (a_p != a_s).any() else -1
        rec = {"seed": seed, "first_divergence": div,
               "identical": div == -1}
        if div >= 0:
            prefix = np.concatenate([np.asarray(ids)[0], a_p[:div]])
            pj = jnp.asarray(prefix[None, :].astype(np.int32))
            l1 = np.asarray(block_logits(params, cfg, pj, 1,
                                         prefix.shape[0]),
                            dtype=np.float32)
            lk = np.asarray(block_logits(params, cfg, pj, K + 1,
                                         prefix.shape[0]),
                            dtype=np.float32)
            t2_1 = np.sort(l1)[-2:]
            rec.update({
                "plain_token": int(a_p[div]), "spec_token": int(a_s[div]),
                "argmax_w1": int(np.argmax(l1)),
                "argmax_wK": int(np.argmax(lk)),
                "max_abs_logit_diff": float(np.max(np.abs(l1 - lk))),
                "top2_margin_w1": float(t2_1[1] - t2_1[0]),
                "argmax_flips": bool(np.argmax(l1) != np.argmax(lk)),
            })
        log(rec)
        results.append(rec)

    n_div = sum(1 for r in results if not r["identical"])
    flips = [r for r in results if r.get("argmax_flips")]
    margins = [r["top2_margin_w1"] for r in results if "top2_margin_w1" in r]
    print(json.dumps({
        "seeds": seeds, "divergent_runs": n_div,
        "argmax_flip_confirmed": len(flips),
        "divergence_margins": margins,
        "max_abs_logit_diffs": [r.get("max_abs_logit_diff")
                                for r in results if not r["identical"]],
        "per_seed": results,
    }))


if __name__ == "__main__":
    main()
