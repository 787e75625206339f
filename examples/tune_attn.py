"""Decode-attention cache-read micro-benchmark (models/decoder.py
`attend`, the T=1 GQA step against the KV cache).

Motivation (measured, tune_decoder phase-3 r2): at b64/S896 the decode
step's cache term moves ~470 MB/step but costs ~2.66 ms — ~126 GB/s,
15% of v5e HBM. Suspects: the (B, S, KVH, hd=64) layout puts hd on the
minor dim (half a 128-lane vreg), and the int8 path's `astype(bf16)`
may materialize instead of fusing. This harness times layout/packing
variants of ONE attention step at decoder shapes, relay-immune (R reps
via lax.scan inside one jit; carry accumulates outputs).

Each variant computes the same math: scores = q.K / sqrt(hd) + mask,
softmax over S, out = probs.V — folding L layers into the batch dim so
one call moves the whole per-step traffic.

Run on the TPU:  timeout 3000 python examples/tune_attn.py
Env: TUNE_B (64), TUNE_S (896), TUNE_KVH (4), TUNE_G (2), TUNE_HD (64),
     TUNE_L (8), TUNE_REPS (30), TUNE_PLATFORM (unset; cpu = smoke).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

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

    B = int(os.environ.get("TUNE_B", 64))
    S = int(os.environ.get("TUNE_S", 896))
    KVH = int(os.environ.get("TUNE_KVH", 4))
    G = int(os.environ.get("TUNE_G", 2))
    HD = int(os.environ.get("TUNE_HD", 64))
    L = int(os.environ.get("TUNE_L", 8))
    R = int(os.environ.get("TUNE_REPS", 30))
    BL = B * L  # layers folded into batch: one call = one step's traffic
    log(f"B={B} S={S} KVH={KVH} G={G} HD={HD} L={L} (BL={BL}) reps={R}")

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BL, KVH, G, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BL, S, KVH, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BL, S, KVH, HD)), jnp.bfloat16)
    mask = jnp.asarray(rng.integers(0, 2, (BL, S)).astype(bool))
    neg = jnp.asarray(-1e30, jnp.float32)

    def quant(x):
        xf = np.asarray(x, np.float32)
        s = np.maximum(np.abs(xf).max(-1), 1e-12) / 127.0
        qv = np.clip(np.round(xf / s[..., None]), -127, 127).astype(np.int8)
        return jnp.asarray(qv), jnp.asarray(s, jnp.float32)

    kq, ks = quant(k)
    vq, vs = quant(v)

    # --- variants: fn(q) -> (BL, KVH, G, HD) attention output ----------
    def base_bf16(q, k, v, mask):
        """The production layout/chain (decoder.attend at T=1)."""
        scores = jnp.einsum("bkgh,bskh->bkgs", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(HD)
        scores = jnp.where(mask[:, None, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bkgs,bskh->bkgh", probs.astype(jnp.bfloat16), v)

    def base_int8(q, k8, ksc, v8, vsc, mask):
        """Production int8 path: cast-in-einsum + scale folding."""
        scores = jnp.einsum("bkgh,bskh->bkgs", q, k8.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        scores = scores * ksc.transpose(0, 2, 1)[:, :, None, :]
        scores = scores / np.sqrt(HD)
        scores = jnp.where(mask[:, None, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = probs * vsc.transpose(0, 2, 1)[:, :, None, :]
        return jnp.einsum("bkgs,bskh->bkgh", probs.astype(jnp.bfloat16),
                          v8.astype(jnp.bfloat16))

    def kmaj_bf16(q, kt, vt, mask):
        """(BL, KVH, S, HD) layout: head-major cache slabs."""
        scores = jnp.einsum("bkgh,bksh->bkgs", q, kt,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(HD)
        scores = jnp.where(mask[:, None, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bkgs,bksh->bkgh", probs.astype(jnp.bfloat16), vt)

    def smin_bf16(q, kt, vt, mask):
        """(BL, KVH, HD, S): S on the minor (lane) dim for BOTH reads;
        out = Vt @ probs^T."""
        scores = jnp.einsum("bkgh,bkhs->bkgs", q, kt,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(HD)
        scores = jnp.where(mask[:, None, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bkgs,bkhs->bkgh", probs.astype(jnp.bfloat16), vt)

    def packed_bf16(q, kp, vp, mask):
        """(BL, S, KVH*HD) full-lane rows; per-head slices are static
        lane offsets (256 = 2 vregs)."""
        out = []
        for h in range(KVH):
            kh = jax.lax.slice_in_dim(kp, h * HD, (h + 1) * HD, axis=2)
            vh = jax.lax.slice_in_dim(vp, h * HD, (h + 1) * HD, axis=2)
            s = jnp.einsum("bgh,bsh->bgs", q[:, h], kh,
                           preferred_element_type=jnp.float32)
            s = s / np.sqrt(HD)
            s = jnp.where(mask[:, None, :], s, neg)
            p = jax.nn.softmax(s, axis=-1)
            out.append(jnp.einsum("bgs,bsh->bgh",
                                  p.astype(jnp.bfloat16), vh))
        return jnp.stack(out, axis=1)

    def mixed_int8(q, k8, ksc, v8, vsc, mask):
        """No astype: let XLA do the mixed bf16 x s8 contraction (the
        convert should fuse into the dot's VMEM load, halving HBM
        traffic vs a materialized bf16 dequant)."""
        scores = jnp.einsum("bkgh,bskh->bkgs", q, k8,
                            preferred_element_type=jnp.float32)
        scores = scores * ksc.transpose(0, 2, 1)[:, :, None, :]
        scores = scores / np.sqrt(HD)
        scores = jnp.where(mask[:, None, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = probs * vsc.transpose(0, 2, 1)[:, :, None, :]
        return jnp.einsum("bkgs,bskh->bkgh", probs.astype(jnp.bfloat16), v8)

    def qq_int8(q8, qsc, k8, ksc, v8, vsc, mask):
        """s8 x s8 scores (query quantized per (b,head,g) row too)."""
        scores = jnp.einsum("bkgh,bskh->bkgs", q8, k8,
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32)
        scores = scores * qsc[..., None] * ksc.transpose(0, 2, 1)[:, :, None, :]
        scores = scores / np.sqrt(HD)
        scores = jnp.where(mask[:, None, None, :], scores, neg)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = probs * vsc.transpose(0, 2, 1)[:, :, None, :]
        return jnp.einsum("bkgs,bskh->bkgh", probs.astype(jnp.bfloat16),
                          v8.astype(jnp.bfloat16))

    qq, qs = quant(q)

    from rag_application_tpu.ops.decode_attn import decode_attend_int8

    def kernel_int8(q, k8, ksc, v8, vsc, mask):
        """The fused Pallas flash-decode kernel (ops/decode_attn.py)."""
        ck = {"q": k8, "s": ksc}
        cv = {"q": v8, "s": vsc}
        return decode_attend_int8(q[:, None], ck, cv, mask)[:, 0]

    variants = {
        "base_bf16": (base_bf16, (q, k, v, mask)),
        "base_int8": (base_int8, (q, kq, ks, vq, vs, mask)),
        "kernel_int8": (kernel_int8, (q, kq, ks, vq, vs, mask)),
        "mixed_int8": (mixed_int8, (q, kq, ks, vq, vs, mask)),
        "qq_int8": (qq_int8, (qq, qs, kq, ks, vq, vs, mask)),
        "kmaj_bf16": (kmaj_bf16, (q, k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3), mask)),
        "smin_bf16": (smin_bf16, (q, k.transpose(0, 2, 3, 1),
                                  v.transpose(0, 2, 3, 1), mask)),
        "packed_bf16": (packed_bf16,
                        (q, k.reshape(BL, S, KVH * HD),
                         v.reshape(BL, S, KVH * HD), mask)),
    }

    ref = None
    results = {}
    for name, (fn, args) in variants.items():
        # correctness vs base first (single call)
        got = np.asarray(fn(*args), np.float32)
        if ref is None:
            ref = got
        err = float(np.max(np.abs(got - ref)))
        # relay-immune timing: R reps inside one jit via lax.scan
        @jax.jit
        def reps(*a, _fn=fn):
            def body(c, _):
                return c + _fn(*a).astype(jnp.float32).sum(), None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(R))
            return tot
        t0 = time.time()
        float(reps(*args))
        log(f"{name}: compile+run {time.time()-t0:.1f}s, max|Δ|={err:.4f}")
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(reps(*args))
            ts.append(time.time() - t0)
        ms = min(ts) / R * 1e3
        bytes_moved = (2 * BL * S * KVH * HD
                       * (1 if "int8" in name else 2))
        gbs = bytes_moved / (ms / 1e3) / 1e9
        results[name] = {"ms": round(ms, 3), "gb_s": round(gbs, 1),
                         "max_err": round(err, 4)}
        log(f"{name}: {ms:.3f} ms/step-equiv ({gbs:.0f} GB/s)")

    print(json.dumps({"B": B, "S": S, "kvh": KVH, "g": G, "hd": HD,
                      "l": L, **{f"{n}_ms": r["ms"]
                                 for n, r in results.items()},
                      **{f"{n}_gbs": r["gb_s"]
                         for n, r in results.items()}}))


main()
