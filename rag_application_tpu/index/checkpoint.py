"""Index checkpoint / restore.

The reference gets index durability for free from Qdrant/Neo4j docker
volumes (docker-compose.yml:29-31,106-110; SURVEY §5.4). Here the
HBM-resident shards are framework-owned state, serialized as:

  <dir>/manifest.json      — versioned manifest: sizes, dims, config
  <dir>/dense.npz          — vecs (bf16 bitcast to uint16), int8,
                             inv_norms, live
  <dir>/sparse.json|npz    — analyzer vocab + per-doc term/tf triplets
  <dir>/payloads.json      — payload rows

Checkpoints are atomic-by-rename: state is written to `<dir>.tmp` and
renamed into place, so a crash mid-write never corrupts the previous
checkpoint (parity in spirit with the reference's idempotent re-ingest
story, rabbitmq_handler.py:97-126).
"""

from __future__ import annotations

import json
import os
import shutil

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

MANIFEST_VERSION = 1

if TYPE_CHECKING:  # pragma: no cover
    from ..store.collection import Collection


def _bf16_to_u16(x: jax.Array) -> np.ndarray:
    return np.asarray(jax.lax.bitcast_convert_type(x, jnp.uint16))


def _u16_to_bf16(x: np.ndarray) -> jax.Array:
    return jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.bfloat16)


def save_collection(col: "Collection", path: str) -> None:
    # --- capture phase, under the collection's mutation lock -------------
    # `serve.checkpoint_spaces` calls this from an executor thread while
    # the event loop keeps mutating; a torn read (dense rows without the
    # matching sparse/payload rows) would misalign the row space on
    # restore. Under the lock only REFERENCES + row-aligned host state
    # are captured and the index is PINNED (inserts switch to
    # non-donating jits so the captured buffers stay valid); the
    # multi-GiB device->host pulls happen after release — holding the
    # lock through a relay transfer would stall every mutator (and the
    # event loop with them) for minutes.
    dense = col.dense
    with col.lock:
        dense.pin()
        r_vecs, r_int8 = dense.vecs, dense.int8
        r_recip = getattr(dense, "int8_recip", None)
        r_inv_norms, r_live = dense.inv_norms, dense.live
        d_size = dense.size

        sp = col.sparse
        # triplets cover ALL docs (tombstones re-applied on load via
        # doc_deleted) — taken straight from the CSR chunks, no per-doc loop
        terms, tfs, counts, lens = sp._flat()
        n_docs = len(sp)
        deleted_rows = sorted(sp._deleted) if sp._deleted else []
        # id order == insertion order
        vocab_terms = sorted(sp.analyzer.vocab, key=sp.analyzer.vocab.get)

        payloads_json = json.dumps(col.payloads._payloads)
        n_payloads = len(col.payloads)

    try:
        d_vecs = None if r_vecs is None else (
            _bf16_to_u16(r_vecs) if r_vecs.dtype == jnp.bfloat16
            else np.asarray(r_vecs, dtype=np.float32))
        d_vecs_bf16 = r_vecs is not None and r_vecs.dtype == jnp.bfloat16
        d_vec_dtype = str(r_vecs.dtype) if r_vecs is not None else None
        d_int8 = None if r_int8 is None else np.asarray(r_int8)
        d_recip = None if r_recip is None else np.asarray(r_recip)
        d_inv_norms = np.asarray(r_inv_norms)
        d_live = np.asarray(r_live)
    finally:
        dense.unpin()

    # --- write phase -----------------------------------------------------
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    # bf16 stores bitcast under vecs_u16; any other dtype must use the
    # plain key (both under vecs_u16 would bitcast f32 as bf16 on load).
    # Reduced storage modes simply omit the absent plane's key.
    vec_kw = {}
    if d_vecs is not None:
        vec_kw["vecs_u16" if d_vecs_bf16 else "vecs"] = d_vecs
    if d_int8 is not None:
        vec_kw["int8"] = d_int8
    if d_recip is not None:
        vec_kw["int8_recip"] = d_recip
    np.savez(
        os.path.join(tmp, "dense.npz"),
        **vec_kw,
        inv_norms=d_inv_norms,
        live=d_live,
    )

    rows = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    trip = np.stack(
        [rows, terms.astype(np.int64), tfs.astype(np.int64)], axis=1)
    deleted = np.zeros(n_docs, dtype=bool)
    if deleted_rows:
        deleted[np.asarray(deleted_rows)] = True
    np.savez(
        os.path.join(tmp, "sparse.npz"),
        triplets=trip,
        doc_lens=lens.astype(np.int64),
        doc_deleted=deleted,
    )
    with open(os.path.join(tmp, "vocab.json"), "w") as f:
        json.dump(vocab_terms, f)

    with open(os.path.join(tmp, "payloads.json"), "w") as f:
        f.write(payloads_json)

    manifest = {
        "version": MANIFEST_VERSION,
        "name": col.name,
        "size": d_size,
        "dim": dense.cfg.dim,
        "matryoshka_dims": list(dense.cfg.matryoshka_dims),
        "vec_dtype": d_vec_dtype,
        "store_bf16": d_vecs is not None,
        "store_int8": d_int8 is not None,
        "int8_per_row_scale": d_recip is not None,
        "n_payloads": n_payloads,
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)

    # swap via rename: rmtree-then-rename left a window with NO
    # checkpoint at `path` if the process died between the two calls
    old = path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def load_collection(path: str, config=None) -> "Collection":
    from ..store.collection import Collection

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["version"] > MANIFEST_VERSION:
        raise ValueError(f"manifest version {manifest['version']} too new")

    col = Collection(manifest["name"], config)
    if col.cfg.index.dim != manifest["dim"]:
        raise ValueError(
            f"config dim {col.cfg.index.dim} != checkpoint dim {manifest['dim']}"
        )
    if list(col.cfg.index.matryoshka_dims) != manifest["matryoshka_dims"]:
        raise ValueError(
            f"config matryoshka dims {col.cfg.index.matryoshka_dims} != "
            f"checkpoint {manifest['matryoshka_dims']} — the inv_norms "
            "columns would be misinterpreted")

    d = np.load(os.path.join(path, "dense.npz"))
    dense = col.dense
    if manifest.get("store_bf16", True) != dense.cfg.store_bf16 or \
            manifest.get("store_int8", True) != dense.cfg.store_int8:
        raise ValueError(
            "config storage planes (bf16=%s, int8=%s) do not match the "
            "checkpoint (bf16=%s, int8=%s)" % (
                dense.cfg.store_bf16, dense.cfg.store_int8,
                manifest.get("store_bf16", True),
                manifest.get("store_int8", True)))
    if "vecs_u16" in d:
        dense.vecs = _u16_to_bf16(d["vecs_u16"])
    elif "vecs" in d:
        dense.vecs = jnp.asarray(d["vecs"])
    if "int8" in d:
        dense.int8 = jnp.asarray(d["int8"])
    if "int8_recip" in d:
        if dense.int8_recip is None:
            raise ValueError(
                "checkpoint has per-row int8 scales but the config "
                "disables int8_per_row_scale")
        dense.int8_recip = jnp.asarray(d["int8_recip"])
    elif dense.int8_recip is not None and manifest.get("store_bf16") is False:
        raise ValueError(
            "config expects per-row int8 scales but the checkpoint "
            "predates them — set int8_per_row_scale=False to load")
    dense.inv_norms = jnp.asarray(d["inv_norms"])
    dense.live = jnp.asarray(d["live"])
    dense.size = int(manifest["size"])
    # the snapshot does not record delete history; derive the fast-path
    # flag from the restored mask itself (one host reduce at load time)
    dense.has_deletes = not bool(np.asarray(d["live"])[: dense.size].all())
    if dense.prefix_int8 is not None:
        # derived view — recompute from the stored rows instead of
        # persisting it (prefix renormalization is scale-invariant, so
        # normalized bf16 rows — or int8 rows in capacity mode — give
        # the same table as the original inserts up to quantization)
        from .dense import _prefix_update

        src = dense.vecs if dense.vecs is not None else dense.int8
        dense.prefix_int8 = _prefix_update(
            jnp.zeros((src.shape[0], dense.cfg.scan_prefix_dim),
                      dtype=jnp.int8),
            src, np.int32(0),
            prefix_dim=dense.cfg.scan_prefix_dim)

    s = np.load(os.path.join(path, "sparse.npz"))
    with open(os.path.join(path, "vocab.json")) as f:
        terms = json.load(f)
    sp = col.sparse
    sp.analyzer.vocab = {t: i for i, t in enumerate(terms)}
    n_docs = len(s["doc_lens"])
    trip = s["triplets"]
    if trip.shape[0]:
        order = np.argsort(trip[:, 0], kind="stable")
        trip = trip[order]
        counts = np.bincount(trip[:, 0], minlength=n_docs)
        terms, tfs = trip[:, 1], trip[:, 2]
    else:
        counts = np.zeros(n_docs, dtype=np.int64)
        terms = tfs = np.zeros(0, dtype=np.int64)
    sp._chunk_terms = []
    sp._chunk_tfs = []
    sp._chunk_counts = []
    sp._chunk_lens = []
    sp._n_docs = 0
    sp._flat_cache = None
    if n_docs:
        sp._append_chunk(terms, tfs, counts, s["doc_lens"])
    sp._deleted = {int(r) for r in np.nonzero(s["doc_deleted"])[0]}
    sp._dirty = True

    with open(os.path.join(path, "payloads.json")) as f:
        payloads = json.load(f)
    from .payload import PayloadStore

    store = PayloadStore()
    for p in payloads:
        if p is None:
            store._payloads.append(None)
        else:
            store.add([p])
    col.payloads = store
    return col
