"""On-chip prefix-cache admission measurement (llm/scheduler.py).

Times ContinuousBatcher._admit with and without a registered prefix at
a serving-shaped prompt (long shared header + short question): the
prefix path replaces the (1, T) prompt prefill with one (1, Ts) suffix
block, so admission cost should drop roughly by header/T.

Run on the TPU:  timeout 3000 python examples/tune_prefix.py
Env: TUNE_* model knobs as tune_decoder.py, plus TUNE_PROMPT (512; the
     prompt_pad), TUNE_HEADER (384), TUNE_TAIL (32).
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%X')}]", *a, file=sys.stderr)


def main() -> None:
    import jax

    if os.environ.get("TUNE_PLATFORM"):  # off-TPU smoke runs
        jax.config.update("jax_platforms", os.environ["TUNE_PLATFORM"])
    import jax.numpy as jnp

    from rag_application_tpu.llm.scheduler import ContinuousBatcher
    from rag_application_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
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
    T = int(os.environ.get("TUNE_PROMPT", 512))
    H = int(os.environ.get("TUNE_HEADER", 384))
    TAIL = int(os.environ.get("TUNE_TAIL", 32))
    log(f"cfg={cfg} prompt_pad={T} header={H} tail={TAIL}")

    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    header = list(rng.integers(1, cfg.vocab_size, H))

    def admit_times(b, n=6):
        """Admit n one-token requests serially; time each _admit (device
        work incl. the host sync via jnp read)."""
        ts = []
        for i in range(n):
            tail = list(rng.integers(1, cfg.vocab_size, TAIL))
            t0 = time.time()
            b._admit(0, i, header + tail)
            float(jnp.sum(b.pos))  # host sync (relay-safe close)
            ts.append(time.time() - t0)
            b._slots[0].__init__()  # free the row again
            b.slot_pos = b.slot_pos.at[0].set(2 ** 30)
        return ts

    base = ContinuousBatcher(params, cfg, slots=1, prompt_pad=T,
                             horizon=64, chunk=8)
    ts_full = admit_times(base)
    log(f"full-prefill admit: compile {ts_full[0]:.2f}s, "
        f"min {min(ts_full[1:])*1e3:.1f} ms")

    pref = ContinuousBatcher(params, cfg, slots=1, prompt_pad=T,
                             horizon=64, chunk=8)
    t0 = time.time()
    pref.register_prefix(header)
    log(f"register_prefix({H}) {time.time()-t0:.2f}s")
    ts_pref = admit_times(pref)
    assert pref.prefix_hits >= 1
    log(f"prefix admit: compile {ts_pref[0]:.2f}s, "
        f"min {min(ts_pref[1:])*1e3:.1f} ms")

    full_ms = min(ts_full[1:]) * 1e3
    pref_ms = min(ts_pref[1:]) * 1e3
    print(json.dumps({
        "prompt_pad": T, "header": H, "tail": TAIL,
        "full_admit_ms": round(full_ms, 2),
        "prefix_admit_ms": round(pref_ms, 2),
        "speedup": round(full_ms / pref_ms, 2),
        "prefix_hits": pref.prefix_hits,
    }))


if __name__ == "__main__":
    main()
