"""Batched embedding pipeline: cache -> tokenize -> device forward.

Parity surface: `EmbeddingHandler.encode_dense` (app/core/embedding/
embedding_handler.py:71-98) — but where the reference posts one HTTP
request per chunk (the unbatched hot loop flagged at
text_processor.py:317), this encoder packs all cache misses of a call
into fixed-size device batches (padding the tail) so every forward pass
lands on the MXU at full tile occupancy.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from .cache import EmbeddingCache
from .encoder import EncoderState, init_encoder
from .tokenizer import HashTokenizer


class Embedder:
    def __init__(
        self,
        state: Optional[EncoderState] = None,
        *,
        cfg: Optional[EncoderConfig] = None,
        tokenizer: Optional[HashTokenizer] = None,
        cache: Optional[EmbeddingCache] = None,
        batch_size: int = 64,
        max_len: int = 128,
    ):
        self.cfg = cfg or (state.cfg if state else EncoderConfig())
        self.state = state or init_encoder(self.cfg, max_len=max_len)
        self.tokenizer = tokenizer or HashTokenizer(self.cfg.vocab_size, max_len)
        self.cache = cache if cache is not None else EmbeddingCache(
            self.cfg.cache_capacity
        )
        self.batch_size = batch_size
        self.max_len = max_len
        self._forward = jax.jit(
            lambda params, ids, mask: self.state.model.apply(params, ids, mask)
        )

    @property
    def dim(self) -> int:
        return self.cfg.out_dim

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """Texts -> (N, out_dim) f32 unit vectors, cache-aware and batched."""
        n = len(texts)
        out = np.zeros((n, self.cfg.out_dim), dtype=np.float32)
        miss_idx: List[int] = []
        for i, t in enumerate(texts):
            hit = self.cache.get(t) if self.cache else None
            if hit is not None:
                out[i] = hit
            else:
                miss_idx.append(i)

        for start in range(0, len(miss_idx), self.batch_size):
            chunk = miss_idx[start : start + self.batch_size]
            batch_texts = [texts[i] for i in chunk]
            ids, mask = self.tokenizer.encode_batch(batch_texts, self.max_len)
            # Pad the tail batch to the full batch size: one compiled shape.
            pad = self.batch_size - len(chunk)
            if pad:
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            vecs = np.asarray(
                self._forward(self.state.params, jnp.asarray(ids), jnp.asarray(mask))
            )[: len(chunk)]
            for j, i in enumerate(chunk):
                out[i] = vecs[j]
                if self.cache:
                    self.cache.put(texts[i], vecs[j])
        return out

    def encode_one(self, text: str) -> np.ndarray:
        return self.encode([text])[0]

    # ------------------------------------------------------------- audio

    @property
    def supports_audio(self) -> bool:
        from .encoder import MultimodalEncoder

        return isinstance(self.state.model, MultimodalEncoder)

    def encode_audio(self, features: np.ndarray,
                     texts: Optional[Sequence[str]] = None) -> np.ndarray:
        """Log-mel features (N, frames, mels) -> (N, out_dim) unit
        vectors via the multimodal tower's audio branch (parity:
        ImageBind ModalityType.AUDIO, imagebind_handler.py:23-32).
        Optional `texts` interleave caption tokens with the audio
        patches (single-tower fusion)."""
        if not self.supports_audio:
            raise ValueError(
                "audio embedding needs a MultimodalEncoder "
                "(init_encoder(multimodal=True))")
        model = self.state.model
        feats = np.asarray(features, dtype=np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        if feats.shape[1:] != (model.audio_frames, model.audio_mels):
            raise ValueError(
                f"audio features must be (N, {model.audio_frames}, "
                f"{model.audio_mels}); got {feats.shape}")
        n = feats.shape[0]
        batch_texts = list(texts) if texts is not None else [""] * n
        if len(batch_texts) != n:
            raise ValueError(
                f"texts must match the feature batch: got {len(batch_texts)}"
                f" captions for {n} audio clips")
        ids, mask = self.tokenizer.encode_batch(batch_texts, self.max_len)
        if texts is None:
            mask = np.zeros_like(mask)  # audio-only: no text tokens attend
        out = np.zeros((n, self.cfg.out_dim), dtype=np.float32)
        for start in range(0, n, self.batch_size):
            sl = slice(start, min(start + self.batch_size, n))
            k = sl.stop - sl.start
            pad = self.batch_size - k
            b_ids = np.pad(ids[sl], ((0, pad), (0, 0)))
            b_mask = np.pad(mask[sl], ((0, pad), (0, 0)))
            b_feats = np.pad(feats[sl], ((0, pad), (0, 0), (0, 0)))
            vecs = np.asarray(self._audio_forward(
                self.state.params, jnp.asarray(b_ids), jnp.asarray(b_mask),
                jnp.asarray(b_feats)))[:k]
            out[sl] = vecs
        return out

    def _audio_forward(self, params, ids, mask, feats):
        if not hasattr(self, "_audio_forward_jit"):
            self._audio_forward_jit = jax.jit(
                lambda p, i, m, a: self.state.model.apply(
                    p, i, m, None, None, a))
        return self._audio_forward_jit(params, ids, mask, feats)

    # ------------------------------------------------------------- image

    @property
    def supports_images(self) -> bool:
        return self.supports_audio  # same single multimodal tower

    def encode_image(self, images: np.ndarray,
                     texts: Optional[Sequence[str]] = None) -> np.ndarray:
        """Raster images (N, S, S, 3) float in [0, 1] -> (N, out_dim)
        unit vectors via the multimodal tower's patch branch (parity:
        ImageBind ModalityType.VISION, imagebind_handler.py:23-32; the
        v2 interleaved text+image embedding, model_handler.py:131-169).
        Optional `texts` interleave caption tokens with the patches."""
        if not self.supports_images:
            raise ValueError(
                "image embedding needs a MultimodalEncoder "
                "(init_encoder(multimodal=True))")
        model = self.state.model
        imgs = np.asarray(images, dtype=np.float32)
        if imgs.ndim == 3:
            imgs = imgs[None]
        s = model.image_size
        if imgs.shape[1:] != (s, s, 3):
            raise ValueError(
                f"images must be (N, {s}, {s}, 3); got {imgs.shape}")
        n = imgs.shape[0]
        batch_texts = list(texts) if texts is not None else [""] * n
        if len(batch_texts) != n:
            raise ValueError(
                f"texts must match the image batch: got {len(batch_texts)}"
                f" captions for {n} images")
        ids, mask = self.tokenizer.encode_batch(batch_texts, self.max_len)
        if texts is None:
            mask = np.zeros_like(mask)  # image-only: no text tokens attend
        out = np.zeros((n, self.cfg.out_dim), dtype=np.float32)
        for start in range(0, n, self.batch_size):
            sl = slice(start, min(start + self.batch_size, n))
            k = sl.stop - sl.start
            pad = self.batch_size - k
            b_ids = np.pad(ids[sl], ((0, pad), (0, 0)))
            b_mask = np.pad(mask[sl], ((0, pad), (0, 0)))
            b_imgs = np.pad(imgs[sl], ((0, pad), (0, 0), (0, 0), (0, 0)))
            vecs = np.asarray(self._image_forward(
                self.state.params, jnp.asarray(b_ids), jnp.asarray(b_mask),
                jnp.asarray(b_imgs)))[:k]
            out[sl] = vecs
        return out

    def _image_forward(self, params, ids, mask, imgs):
        if not hasattr(self, "_image_forward_jit"):
            self._image_forward_jit = jax.jit(
                lambda p, i, m, im: self.state.model.apply(
                    p, i, m, im, None, None))
        return self._image_forward_jit(params, ids, mask, imgs)
