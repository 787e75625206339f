"""Fine-tune a served decoder on chat transcripts with LoRA — the full
adaptation loop: JSONL transcripts -> rendered sequences -> adapter
training (base frozen) -> megabyte adapter npz that
`RAGTPU_LOCAL_LORA=<path>` merges at serve boot.

Input: one JSON object per line, either {"messages": [{"role","content"},
...]} (rendered with the same template LocalLLM serves, llm/local.py)
or {"text": "..."}.

Usage:
  python examples/finetune_lora.py --data chats.jsonl \
      --model-dir /path/to/hf-checkpoint --out adapters.npz \
      [--rank 8] [--alpha 16] [--steps 200] [--lr 3e-4] \
      [--batch 8] [--seq-len 256] [--platform cpu]

Without --model-dir, trains a tiny random decoder (smoke mode) so the
pipeline is testable without a checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%X')}]", *a, file=sys.stderr)


def render_records(path: str, render_train, encode, eos_id) -> list:
    """TRAINING rendering: unlike the serving prompt template (which
    appends a dangling 'assistant:' and strips eos — llm/local.py
    render), each example ends with the assistant's actual reply
    followed by eos, so ending a turn IS a prediction target."""
    seqs, skipped = [], 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if "messages" in rec:
                ids = render_train(rec["messages"])
            elif "text" in rec:
                ids = list(encode(rec["text"]))
            else:
                skipped += 1
                continue
            if eos_id is not None and (not ids or ids[-1] != eos_id):
                ids = ids + [eos_id]
            seqs.append(ids)
    if skipped:
        log(f"WARNING: skipped {skipped} records without "
            f"'messages'/'text' keys — check the dataset")
    if not seqs:
        raise SystemExit(f"no usable records in {path}")
    return seqs


def main(argv=None) -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--out", default="adapters.npz")
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=16.0)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--platform", default="")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from rag_application_tpu.models.lora import (
        lora_adapters,
        lora_init,
        make_lora_train_step,
        save_adapters,
    )
    from rag_application_tpu.models.train import TrainState, make_optimizer

    if args.model_dir:
        from rag_application_tpu.llm.local import LocalLLM

        llm = LocalLLM.from_hf_dir(args.model_dir)
        params, cfg = llm.params, llm.cfg
        encode = llm.tokenizer.encode
        eos_id = llm.eos_id
    else:  # smoke mode: tiny random model + wordpiece-free encoding
        from rag_application_tpu.models.decoder import (
            DecoderConfig,
            init_decoder_params,
        )

        cfg = DecoderConfig(vocab_size=256, hidden=64, num_layers=2,
                            heads=4, kv_heads=2, mlp_dim=128, max_len=256,
                            dtype="float32")
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        encode = lambda t: [ord(c) % 256 for c in t][: args.seq_len]
        eos_id = 0

    def render_train(msgs):
        text = "\n".join(f"{m['role']}: {m['content']}" for m in msgs)
        ids = list(encode(text))
        return ids  # render_records appends eos

    seqs = render_records(args.data, render_train, encode, eos_id)
    log(f"{len(seqs)} sequences, cfg hidden={cfg.hidden} L={cfg.num_layers}")

    T = min(args.seq_len, cfg.max_len)
    ids = np.zeros((len(seqs), T), np.int32)
    mask = np.zeros((len(seqs), T), bool)
    for i, s in enumerate(seqs):
        s = s[:T]
        ids[i, : len(s)] = s
        mask[i, : len(s)] = True

    wrapped = lora_init(jax.random.PRNGKey(1), params, r=args.rank,
                        alpha=args.alpha)
    opt = make_optimizer(lr=args.lr)
    step = jax.jit(make_lora_train_step(cfg, opt))
    ads = lora_adapters(wrapped)
    state = TrainState(params=ads, opt_state=opt.init(ads),
                       step=jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(args.steps):
        pick = rng.integers(0, len(seqs), args.batch)
        batch = {"ids": jnp.asarray(ids[pick]),
                 "mask": jnp.asarray(mask[pick])}
        state, m = step(state, wrapped, batch)
        if it % max(1, args.steps // 10) == 0 or it == args.steps - 1:
            log(f"step {it}: loss {float(m['loss']):.4f} "
                f"acc {float(m['accuracy']):.3f}")
    log(f"trained {args.steps} steps in {time.time()-t0:.1f}s")

    # np.savez appends .npz when missing — report the REAL path
    out = args.out if args.out.endswith(".npz") else args.out + ".npz"
    # wrapped carries the trained scale s = alpha/r; embedding it makes
    # the artifact self-describing (serve boot needs no matching alpha)
    save_adapters(state.params, out, wrapped=wrapped)
    print(json.dumps({"out": out, "bytes": os.path.getsize(out),
                      "final_loss": round(float(m["loss"]), 4),
                      "final_acc": round(float(m["accuracy"]), 4)}))
    return out


if __name__ == "__main__":
    main()
