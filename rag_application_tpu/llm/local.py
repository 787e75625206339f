"""On-device (TPU) text generation provider.

Parity: the reference's HF local client generates text with torch
LLaMA/Mistral checkpoints and streams via TextIteratorStreamer
(app/core/models/huggingface/huggingface.py:17-22,195-260). Here the
model is the XLA-native decoder in models/decoder.py, and `LocalLLM`
adapts it to the router's chat interface so every agent / endpoint that
speaks `LLMRouter` can run inference on the local chip with zero
network dependencies (`Provider.LOCAL`).

Two generation paths, matching the relay economics (CLAUDE.md):
  * `chat`: the fused `generate` while_loop — the whole completion is
    ONE device dispatch (per-token dispatch through the relay costs
    ~30 ms RTT each; the fused loop pays it once).
  * `stream`: a jitted single-token step per yield — true streaming
    with time-to-first-token = prefill + one step, for interactive use.

Both run the blocking device work in an executor so the serving event
loop stays free.
"""

from __future__ import annotations

import asyncio
from typing import Any, AsyncIterator, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import (
    DecoderConfig,
    convert_hf_llama_state_dict,
    generate,
    init_kv_cache,
    make_decode_step,
    prefill,
    quantize_decoder_params,
    sample_logits,
)


class LocalLLM:
    """Chat adapter over a decoder checkpoint + tokenizer.

    `tokenizer` needs `encode(text) -> List[int]` and
    `decode(ids) -> str` (models/wordpiece.py provides both; any HF
    tokenizer object works too via the same duck type)."""

    def __init__(self, params: Dict[str, Any], cfg: DecoderConfig,
                 tokenizer, *, eos_id: Optional[int] = None,
                 model_name: str = "local-decoder",
                 speculative: bool = False):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        # greedy solo requests use prompt-lookup block verification
        # (models/speculative.py) when enabled — token-identical output
        self.speculative = bool(speculative)
        # WordPiece ends every encoded turn with [SEP]; that IS the
        # natural end-of-turn marker, so it doubles as eos
        if eos_id is None:
            eos_id = getattr(tokenizer, "sep_id", None)
            if eos_id is None:
                eos_id = getattr(tokenizer, "eos_token_id", 0) or 0
        self.eos_id = int(eos_id)
        self.pad_id = int(getattr(tokenizer, "pad_id", 0) or 0)
        self.model_name = model_name
        self._step = None  # lazy jitted streaming step
        self._batcher = None  # optional continuous batcher (enable_batching)
        # multi-LoRA serving state (register_lora): stacked banks +
        # name -> bank index (0 = base model)
        self._lora_trees: list = []
        self._lora_names: Dict[str, int] = {}
        self._lora_banks = None
        # grammar-constrained decoding: schema-json -> host Constraint
        # (models/constrain.py), None cached for unsupported schemas;
        # device views cached separately (batcher cids live in the
        # batcher itself — it memoizes + LRU-evicts its bank slots)
        self._constraint_cache: Dict[str, Optional[Any]] = {}
        self._constraint_dev: Dict[str, Dict[str, Any]] = {}

    @classmethod
    def from_hf_dir(cls, model_dir: str, *, max_len: int = 1024,
                    dtype: str = "bfloat16", quantize: bool = False,
                    kv_quant: bool = False, lora_path: str = "",
                    lora_alpha: float = 16.0, **kw) -> "LocalLLM":
        """Load a local LLaMA-family HF checkpoint directory (never
        downloads — parity with the bert.py loader convention).
        `quantize=True` serves weight-only int8 (half the HBM, faster
        small-batch decode); `kv_quant=True` stores the KV cache as int8
        rows + per-row scales (half the cache traffic/capacity; see
        models/decoder.py); `lora_path` merges trained LoRA factors
        (models/lora.py `save_adapters` npz) into the weights at load."""
        from transformers import (
            AutoConfig,
            AutoModelForCausalLM,
            AutoTokenizer,
        )

        hf_cfg = AutoConfig.from_pretrained(model_dir, local_files_only=True)
        rs = getattr(hf_cfg, "rope_scaling", None) or {}
        kind = rs.get("rope_type", rs.get("type", "none")) if rs else "none"
        if kind in ("default",):
            kind = "none"
        if kind not in ("none", "linear", "llama3"):
            raise ValueError(
                f"unsupported rope_scaling type {kind!r} (supported: "
                "linear, llama3)")
        cfg = DecoderConfig(
            vocab_size=hf_cfg.vocab_size, hidden=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            heads=hf_cfg.num_attention_heads,
            kv_heads=getattr(hf_cfg, "num_key_value_heads",
                             hf_cfg.num_attention_heads),
            mlp_dim=hf_cfg.intermediate_size,
            max_len=min(max_len, hf_cfg.max_position_embeddings),
            rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
            rope_kind=kind,
            rope_factor=float(rs.get("factor", 1.0)),
            rope_low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            rope_high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            rope_original_max_len=int(rs.get(
                "original_max_position_embeddings",
                hf_cfg.max_position_embeddings)),
            eps=getattr(hf_cfg, "rms_norm_eps", 1e-6), dtype=dtype,
            kv_quant=kv_quant)
        model = AutoModelForCausalLM.from_pretrained(
            model_dir, local_files_only=True)
        params = convert_hf_llama_state_dict(model.state_dict(), cfg)
        if lora_path:
            # merge trained rank-r adapters (models/lora.py) into the
            # dense weights BEFORE quantization — zero serving overhead
            from ..models.lora import load_adapters, lora_merge, lora_wrap_with

            params = lora_merge(lora_wrap_with(
                params, load_adapters(lora_path), alpha=lora_alpha))
        if quantize:
            params = quantize_decoder_params(params)
        tok = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
        return cls(params, cfg, tok,
                   eos_id=tok.eos_token_id, **kw)

    def enable_batching(self, *, slots: int = 8, prompt_pad: int = 256,
                        horizon: int = 512, chunk: int = 8,
                        temperature: float = 0.0, top_k: int = 64,
                        top_p: float = 1.0, seed: int = 0,
                        spec_k: int = 0, **batcher_kw):
        """Route `chat` through a continuous batcher: N concurrent
        requests share ONE decode batch on the chip (llm/scheduler.py),
        matching the reference's Ollama serving behavior. Sampling knobs
        are fixed per batcher (one compiled program); a chat call whose
        knobs differ falls back to the solo fused path. `spec_k`>0 adds
        prompt-lookup speculative blocks to every batch step (greedy
        batchers only — token-identical output, fewer steps)."""
        from .scheduler import ContinuousBatcher

        self._batcher = ContinuousBatcher(
            self.params, self.cfg, slots=slots, prompt_pad=prompt_pad,
            horizon=horizon, chunk=chunk, temperature=temperature,
            top_k=top_k, top_p=top_p, seed=seed, spec_k=spec_k,
            lora_banks=self._lora_banks, **batcher_kw)
        return self._batcher

    def register_prefix_text(self, text: str) -> int:
        """Prefix-cache a shared prompt header with the batcher: its K/V
        is computed once and every admission whose rendered prompt
        starts with it prefills only the suffix. The text must end on a
        token boundary of the render format (e.g. a full
        \"system: ...\\n\" line) so `encode(prefix+rest)` starts with
        `encode(prefix)`. Returns the prefix length in tokens."""
        if self._batcher is None:
            raise RuntimeError("enable_batching() first")
        ids = self.tokenizer.encode(text)
        if ids and ids[-1] == self.eos_id:
            ids = ids[:-1]
        self._batcher.register_prefix(ids)
        return len(ids)

    def register_lora(self, name: str, adapters_or_path,
                      *, alpha: float = 16.0) -> int:
        """Register a LoRA adapter for per-request serving. `name` is
        what chat requests select with params={"adapter": name};
        `adapters_or_path` is a `save_adapters` npz path or an
        already-loaded adapter tree. All registered adapters share the
        frozen base — concurrent requests with different adapters
        decode in ONE batch (models/lora.py::lora_banks,
        decoder.forward lora=). Returns the adapter's bank index.

        Unlike `lora_path` (merge-at-load: one adapter baked into the
        weights), registered adapters are selectable per request."""
        from ..models.lora import load_adapters, lora_banks

        tree = (load_adapters(adapters_or_path)
                if isinstance(adapters_or_path, str) else adapters_or_path)
        self._lora_trees.append((tree, alpha))
        # rebuild the stacked banks (index i+1 = i-th registered)
        trees = [t for t, _ in self._lora_trees]
        alphas = {a for _, a in self._lora_trees}
        if len(alphas) > 1:
            # lora_banks takes one alpha fallback; embedded "s" scales
            # win, so mixed alphas only matter for scale-less artifacts
            import logging

            logging.getLogger(__name__).warning(
                "register_lora: mixed alpha fallbacks %s — artifacts "
                "without embedded scales use the LAST alpha", alphas)
        self._lora_banks = lora_banks(trees, alpha=alpha,
                                      dtype=jnp.dtype(self.cfg.dtype))
        idx = len(self._lora_trees)
        self._lora_names[name] = idx
        if self._batcher is not None:
            self._batcher._banks = self._lora_banks
        return idx

    def _lora_for(self, adapter, batch: int = 1):
        """(aid array, lora dict) for a named adapter (None = base)."""
        if self._lora_banks is None:
            if adapter:
                raise ValueError(f"unknown adapter {adapter!r} "
                                 "(none registered)")
            return None
        if adapter:
            if adapter not in self._lora_names:
                raise ValueError(f"unknown adapter {adapter!r}")
            idx = self._lora_names[adapter]
        else:
            idx = 0
        return {"aid": jnp.full((batch,), idx, jnp.int32),
                "banks": self._lora_banks}

    @staticmethod
    def _schema_key(schema) -> str:
        import json as _json

        return _json.dumps(schema, sort_keys=True)

    def _constraint_host_for(self, schema):
        """Compile (and cache) a response schema into a host-side
        grammar Constraint; None when the schema is outside the
        supported subset or the vocabulary can't realize it (the
        prompt-only fallback still applies)."""
        key = self._schema_key(schema)
        if key not in self._constraint_cache:
            from ..models.constrain import compile_schema

            try:
                self._constraint_cache[key] = compile_schema(
                    schema, self.tokenizer, self.cfg.vocab_size)
            except (ValueError, TypeError):
                self._constraint_cache[key] = None
        return self._constraint_cache[key]

    def _constraint_for(self, schema) -> Optional[Dict[str, Any]]:
        """Device view of the compiled constraint (solo fused path)."""
        c = self._constraint_host_for(schema)
        if c is None:
            return None
        key = self._schema_key(schema)
        if key not in self._constraint_dev:
            self._constraint_dev[key] = c.as_device()
        return self._constraint_dev[key]

    def _constraint_cid_for(self, schema) -> Optional[int]:
        """Batcher constraint_id for the schema; None when the schema is
        unsupported OR the batcher's constraint bank is full of pinned
        slots (callers then take the solo constrained path). The batcher
        memoizes registration by constraint identity and LRU-evicts free
        slots, so calling this per request is O(1) and stays correct
        across evictions (no host-side cid cache to go stale)."""
        c = self._constraint_host_for(schema)
        if c is None:
            return None
        try:
            return self._batcher.register_constraint(c)
        except ValueError:
            return None

    # ------------------------------------------------------------- prompt

    def render(self, messages: Sequence[Any]) -> List[int]:
        """Chat template -> prompt ids. Plain role-tagged lines (the
        in-framework models are trained on this format; HF checkpoints
        with their own template can pre-render and call generate_ids)."""
        lines = []
        for m in messages:
            if hasattr(m, "role"):
                role, content = m.role, m.content
            else:
                role, content = m["role"], m.get("content", "")
            lines.append(f"{role}: {content}")
        lines.append("assistant:")
        text = "\n".join(lines)
        ids = self.tokenizer.encode(text)
        # generation continues the sequence: drop a trailing [SEP]/eos so
        # the model doesn't see an already-ended turn
        if ids and ids[-1] == self.eos_id:
            ids = ids[:-1]
        return ids[-(self.cfg.max_len - 1):]

    def _decode(self, ids: Sequence[int]) -> str:
        ids = [int(i) for i in ids if int(i) not in (self.pad_id, self.eos_id)]
        return self.tokenizer.decode(ids)

    @staticmethod
    def _apply_stop(text: str, stop) -> str:
        if not stop:
            return text
        for s in ([stop] if isinstance(stop, str) else stop):
            cut = text.find(s)
            if cut != -1:
                text = text[:cut]
        return text

    # ---------------------------------------------------------- inference

    def generate_ids(self, prompt_ids: Sequence[int], *,
                     max_new: int = 128, temperature: float = 0.0,
                     top_k: int = 64, top_p: float = 1.0,
                     seed: int = 0, speculative: bool = False,
                     lora=None, presence: float = 0.0,
                     frequency: float = 0.0, constraint=None,
                     logit_bias=None) -> List[int]:
        """Blocking fused generation for one prompt. Pads the prompt to
        a power-of-two bucket so repeated lengths reuse the compiled
        while_loop (search/params.py convention).

        `speculative=True` routes requests through prompt-lookup block
        verification (models/speculative.py) — greedy output is
        token-identical and sampled output draws from the identical
        filtered distribution (rejection-sampled acceptance); fewer
        decoder steps on copy-heavy RAG completions either way."""
        n = len(prompt_ids)
        max_new = max(1, min(max_new, self.cfg.max_len - n))
        bucket = 1
        while bucket < n:
            bucket <<= 1
        bucket = min(bucket, self.cfg.max_len - 1)
        ids = np.full((1, bucket), self.pad_id, np.int32)
        ids[0, :n] = prompt_ids
        if (speculative and lora is None and constraint is None
                and logit_bias is None and not (presence or frequency)):
            from ..models.speculative import generate_lookup

            out, count = generate_lookup(
                self.params, self.cfg, ids, np.asarray([n], np.int32),
                max_new, self.eos_id, self.pad_id,
                jax.random.PRNGKey(seed), 4, float(temperature),
                int(top_k), float(top_p))
        else:
            # adapter requests take the plain fused loop (the lookup
            # path does not thread per-row adapters)
            out, count = generate(
                self.params, self.cfg, ids, np.asarray([n], np.int32),
                max_new, self.eos_id, self.pad_id, jax.random.PRNGKey(seed),
                float(temperature), int(top_k), float(top_p), lora,
                float(presence), float(frequency), constraint, logit_bias)
        out = np.asarray(out)[0]
        return [int(t) for t in out if int(t) != self.pad_id
                and int(t) != self.eos_id]

    def generate_ids_logprobs(self, prompt_ids: Sequence[int], *,
                              max_new: int = 128, temperature: float = 0.0,
                              top_k: int = 64, top_p: float = 1.0,
                              seed: int = 0):
        """`generate_ids` that also returns each emitted token's raw
        model log-prob (decoder.generate_logprobs — same fused loop)."""
        from ..models.decoder import generate_logprobs

        n = len(prompt_ids)
        max_new = max(1, min(max_new, self.cfg.max_len - n))
        bucket = 1
        while bucket < n:
            bucket <<= 1
        bucket = min(bucket, self.cfg.max_len - 1)
        ids = np.full((1, bucket), self.pad_id, np.int32)
        ids[0, :n] = prompt_ids
        out, _, lps = generate_logprobs(
            self.params, self.cfg, ids, np.asarray([n], np.int32),
            max_new, self.eos_id, self.pad_id, jax.random.PRNGKey(seed),
            float(temperature), int(top_k), float(top_p))
        pairs = [(int(t), float(l))
                 for t, l in zip(np.asarray(out)[0], np.asarray(lps)[0])
                 if int(t) not in (self.pad_id, self.eos_id)]
        return [t for t, _ in pairs], [l for _, l in pairs]

    def choose(self, prompt_ids: Sequence[int],
               choices: Sequence[Sequence[int]]) -> Tuple[int, List[float]]:
        """Exact log P(choice | prompt) for each candidate (one batched
        teacher-forced forward, decoder.score_continuations); returns
        (argmax index, per-choice log-probs). The constrained answer
        for enum-style structured output: always a valid option."""
        from ..models.decoder import score_continuations

        n = len(prompt_ids)
        lens = [n + len(c) for c in choices]
        bucket = 1
        while bucket < max(lens):
            bucket <<= 1
        bucket = min(bucket, self.cfg.max_len)
        ids = np.full((len(choices), bucket), self.pad_id, np.int32)
        for i, c in enumerate(choices):
            row = (list(prompt_ids) + list(c))[:bucket]
            ids[i, :len(row)] = row
        scores = np.asarray(score_continuations(
            self.params, self.cfg, jnp.asarray(ids),
            jnp.asarray([n] * len(choices), np.int32),
            jnp.asarray([min(l, bucket) for l in lens], np.int32)))
        return int(np.argmax(scores)), [float(s) for s in scores]

    def choose_text(self, messages: Sequence[Any],
                    options: Sequence[str]) -> str:
        """Pick the most probable option string as the assistant's
        reply — guaranteed to BE one of the options."""
        prompt = self.render(messages)
        enc = []
        for o in options:
            ids = self.tokenizer.encode(o)
            if ids and ids[-1] == self.eos_id:
                ids = ids[:-1]
            enc.append(ids)
        i, _ = self.choose(prompt, enc)
        return options[i]

    async def chat(self, messages: Sequence[Any], *,
                   tools=None, response_schema=None,
                   **params: Any):
        from .router import ChatMessage, LLMResponse

        msgs = list(messages)
        if response_schema is not None:
            import json as _json

            msgs.append(ChatMessage(
                "user", "Respond with ONLY valid JSON matching this "
                        f"schema: {_json.dumps(response_schema)}"))
        prompt = self.render(msgs)
        max_new = max(1, min(int(params.get("max_tokens") or 128),
                             self.cfg.max_len - len(prompt)))
        temperature = float(params.get("temperature") or 0.0)
        top_p = float(params.get("top_p") or 1.0)
        adapter = params.get("adapter") or None
        presence = float(params.get("presence_penalty") or 0.0)
        frequency = float(params.get("frequency_penalty") or 0.0)
        # OpenAI logit_bias: {"token_id": -100..100} -> (V,) f32 plane
        logit_bias = None
        if params.get("logit_bias"):
            vec = np.zeros((self.cfg.vocab_size,), np.float32)
            for tid, b in dict(params["logit_bias"]).items():
                tid = int(tid)
                if 0 <= tid < self.cfg.vocab_size:
                    vec[tid] = float(b)
            logit_bias = vec
        # a schema only "wants" the ext batcher when it actually compiles
        # to a device constraint — rejected schemas (prompt-only
        # fallback) would otherwise forfeit the shared batch for nothing
        has_constraint = (response_schema is not None and
                          self._constraint_host_for(response_schema)
                          is not None)
        wants_ext = bool(presence or frequency or logit_bias is not None
                         or has_constraint)
        lp_out = None
        loop = asyncio.get_running_loop()
        if params.get("logprobs"):
            # logprobs ride the solo fused loop (the batcher does not
            # thread per-token scores through its chunks)
            out_ids, lps = await loop.run_in_executor(
                None, lambda: self.generate_ids_logprobs(
                    prompt, max_new=max_new, temperature=temperature,
                    top_p=top_p, seed=int(params.get("seed") or 0)))
            lp_out = [{"token": self.tokenizer.decode([t]),
                       "logprob": l} for t, l in zip(out_ids, lps)]
        elif (not wants_ext
              and self._batch_eligible(prompt, max_new, params, temperature,
                                       top_p, adapter=adapter)):
            out_ids = await self._batcher.submit(
                prompt, max_new=max_new, eos_id=self.eos_id,
                adapter_id=(self._lora_names[adapter] if adapter else 0))
        elif (wants_ext and self._batcher is not None
              and self._batcher.sampling_ext
              and self._batch_eligible(prompt, max_new, params, temperature,
                                       top_p, adapter=adapter)
              and (not has_constraint
                   or (cid := self._constraint_cid_for(response_schema))
                   is not None)):
            # extended sampling THROUGH the shared batch (scheduler
            # sampling_ext): constrained/penalized requests no longer
            # serialize on the solo fused path. A compilable schema that
            # cannot get a bank slot (bank full of pinned constraints)
            # drops to the solo branch so the DFA guarantee holds.
            out_ids = await self._batcher.submit(
                prompt, max_new=max_new, eos_id=self.eos_id,
                adapter_id=(self._lora_names[adapter] if adapter else 0),
                constraint_id=(cid if has_constraint else 0),
                presence=presence,
                frequency=frequency, logit_bias=logit_bias)
        else:
            # grammar-constrain the decode whenever the schema compiles
            # — the instruction above tells the model WHAT to write,
            # the DFA guarantees the output parses either way
            constraint = (self._constraint_for(response_schema)
                          if response_schema is not None else None)
            out_ids = await loop.run_in_executor(
                None, lambda: self.generate_ids(
                    prompt, max_new=max_new, temperature=temperature,
                    top_p=top_p, seed=int(params.get("seed") or 0),
                    speculative=self.speculative,
                    lora=self._lora_for(adapter),
                    presence=presence, frequency=frequency,
                    constraint=constraint, logit_bias=logit_bias))
        text = self._apply_stop(self._decode(out_ids), params.get("stop"))
        return LLMResponse(content=text,
                           usage={"prompt_tokens": len(prompt),
                                  "completion_tokens": len(out_ids),
                                  "total_tokens": len(prompt) + len(out_ids)},
                           logprobs=lp_out)

    def _batch_eligible(self, prompt, max_new, params, temperature,
                        top_p, adapter=None) -> bool:
        """A request rides the shared batch only when every sampling
        knob matches the batcher's fixed compile AND the prompt fits
        prompt_pad (submit clips to the LAST prompt_pad tokens — a
        longer prompt would silently lose its head, i.e. the system
        prompt). Everything else falls back to the solo fused path."""
        b = self._batcher
        if b is None:
            return False
        if adapter:
            if adapter not in self._lora_names:
                raise ValueError(f"unknown adapter {adapter!r}")
            if b._banks is None:
                return False  # batcher predates registration; solo path
        if temperature != b.temperature or top_p != b.top_p:
            return False
        if int(params.get("top_k") or b.top_k) != b.top_k:
            return False
        if temperature > 0 and params.get("seed") is not None:
            return False  # explicit seed: honor it via the solo path
        return len(prompt) <= b.T and len(prompt) + max_new <= b.S

    async def stream(self, messages: Sequence[Any],
                     **params: Any) -> AsyncIterator[str]:
        """Token-at-a-time decode: each yield is the newly produced text
        (incremental re-detokenization keeps multi-piece words right).
        With batching enabled, concurrent streams share one decode
        batch (time-to-next-token bounded by the chunk size)."""
        prompt = self.render(messages)
        max_new = max(1, min(int(params.get("max_tokens") or 128),
                             self.cfg.max_len - len(prompt)))
        temperature = float(params.get("temperature") or 0.0)
        top_p = float(params.get("top_p") or 1.0)
        seed = int(params.get("seed") or 0)
        stop = params.get("stop")
        loop = asyncio.get_running_loop()

        presence = float(params.get("presence_penalty") or 0.0)
        frequency = float(params.get("frequency_penalty") or 0.0)
        logit_bias = None
        if params.get("logit_bias"):
            vec = np.zeros((self.cfg.vocab_size,), np.float32)
            for tid, b in dict(params["logit_bias"]).items():
                tid = int(tid)
                if 0 <= tid < self.cfg.vocab_size:
                    vec[tid] = float(b)
            logit_bias = vec
        wants_ext = bool(presence or frequency or logit_bias is not None)
        if (self._batch_eligible(prompt, max_new, params, temperature, top_p)
                and (not wants_ext or self._batcher.sampling_ext)):
            produced: List[int] = []
            emitted = ""
            async for tok in self._batcher.submit_stream(
                    prompt, max_new=max_new, eos_id=self.eos_id,
                    presence=presence, frequency=frequency,
                    logit_bias=logit_bias):
                produced.append(tok)
                text = self._decode(produced)
                if stop:
                    clipped = self._apply_stop(text, stop)
                    if clipped != text:
                        delta = clipped[len(emitted):]
                        if delta:
                            yield delta
                        return
                if text[: len(emitted)] == emitted:
                    delta = text[len(emitted):]
                    if delta:
                        yield delta
                        emitted = text
            return

        if wants_ext:
            # solo fallback for penalized/biased streams: the per-token
            # step below has no penalty state, so running it would
            # silently apply a DIFFERENT sampling law than chat() does
            # for the same knobs. Run the penalty-aware fused loop
            # (one dispatch) and stream its output by incremental
            # re-detokenization — correctness over time-to-first-token.
            out_ids = await loop.run_in_executor(
                None, lambda: self.generate_ids(
                    prompt, max_new=max_new, temperature=temperature,
                    top_p=top_p, seed=seed, presence=presence,
                    frequency=frequency, logit_bias=logit_bias))
            emitted = ""
            for k in range(1, len(out_ids) + 1):
                text = self._decode(out_ids[:k])
                if stop:
                    clipped = self._apply_stop(text, stop)
                    if clipped != text:
                        delta = clipped[len(emitted):]
                        if delta:
                            yield delta
                        return
                if text[: len(emitted)] == emitted:
                    delta = text[len(emitted):]
                    if delta:
                        yield delta
                        emitted = text
            return

        if self._step is None:
            self._step = make_decode_step(self.params, self.cfg)

        def _prefill():
            # bucket the prompt pad to a power of two: distinct lengths
            # would each pay a fresh remote compile (repo convention)
            n = len(prompt)
            bucket = 1
            while bucket < n:
                bucket <<= 1
            bucket = min(bucket, self.cfg.max_len - 1)
            ck, cv = init_kv_cache(self.cfg, 1)
            ids = np.full((1, bucket), self.pad_id, np.int32)
            ids[0, :n] = prompt
            logits, ck, cv = prefill(self.params, self.cfg, ids,
                                     np.asarray([n], np.int32),
                                     ck, cv)
            tok = sample_logits(logits, jax.random.fold_in(
                jax.random.PRNGKey(seed), max_new),
                temperature=temperature, top_k=64, top_p=top_p)
            return int(np.asarray(tok)[0]), ck, cv

        tok, ck, cv = await loop.run_in_executor(None, _prefill)
        produced: List[int] = []
        emitted = ""
        pos = len(prompt)
        rng = jax.random.PRNGKey(seed)
        for step in range(max_new):
            if tok == self.eos_id:
                break
            produced.append(tok)
            text = self._decode(produced)
            if stop:
                clipped = self._apply_stop(text, stop)
                if clipped != text:
                    delta = clipped[len(emitted):]
                    if delta:
                        yield delta
                    return
            if text[: len(emitted)] == emitted:
                delta = text[len(emitted):]
                if delta:
                    yield delta
                    emitted = text
            if step == max_new - 1:
                break
            step_rng = jax.random.fold_in(rng, step)
            tok_a, ck, cv = await loop.run_in_executor(
                None, lambda t=tok, p=pos, r=step_rng: self._step(
                    np.asarray([t], np.int32), np.asarray([p], np.int32),
                    ck, cv, r, temperature, 64, top_p))
            tok = int(np.asarray(tok_a)[0])
            pos += 1
