"""KGStore checkpoint / restore (graph + 4 vector spaces).

The reference's graph durability is Neo4j docker volumes; here the graph
is framework state: per-space dense shards (bf16 bitcast like the chunk
index), payload/key tables, document/page/edge maps. Atomic-by-rename
like index/checkpoint.py.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import KGConfig
from .store import KGStore, Space

KG_MANIFEST_VERSION = 1


def _dump_array(x: jax.Array) -> np.ndarray:
    if x.dtype == jnp.bfloat16:
        return np.asarray(jax.lax.bitcast_convert_type(x, jnp.uint16))
    return np.asarray(x)


def save_kg(kg: KGStore, path: str) -> None:
    # --- capture under the store's mutation lock -------------------------
    # Called from the checkpoint executor thread while the event loop
    # mutates (upserts, dedup merges). Under the lock: device REFERENCES
    # (the per-space indexes are pinned so upserts stop donating and the
    # references survive) + host dicts serialized to JSON strings (a
    # mutation mid-json.dump would tear the graph or raise "dict changed
    # during iteration"). The device->host pulls run after release so
    # mutators never wait on a relay transfer.
    with kg.lock:
        refs = {}
        meta_spaces = {}
        for space, table in kg.spaces.items():
            idx = table.index
            idx.pin()
            refs[space.value] = (idx, idx.vecs, idx.int8, idx.live)
            meta_spaces[space.value] = {
                "size": idx.size,
                "bf16": str(idx.vecs.dtype) == "bfloat16",
                "payloads": table.payloads,
                "by_key": [[list(k), v] for k, v in table.by_key.items()],
            }
        graph = {
            "documents": kg.documents,
            "doc_pages": {d: {str(p): r for p, r in pages.items()}
                          for d, pages in kg.doc_pages.items()},
            "entity_edges": {str(k): v for k, v in kg.entity_edges.items()},
            "page_mentions": {str(k): v for k, v in kg.page_mentions.items()},
            "column_values": {str(k): v for k, v in kg.column_values.items()},
            "scope": kg.scope,
        }
        graph_json = json.dumps(graph, default=str)
        manifest_json = json.dumps(
            {"version": KG_MANIFEST_VERSION, "dim": kg.dim,
             "spaces": meta_spaces}, default=str)

    arrays = {}
    try:
        for name, (idx, vecs, int8, live) in refs.items():
            arrays[f"{name}_vecs"] = _dump_array(vecs)
            arrays[f"{name}_int8"] = np.asarray(int8)
            arrays[f"{name}_live"] = np.asarray(live)
    finally:
        for idx, *_ in refs.values():
            idx.unpin()

    # --- write phase -----------------------------------------------------
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    np.savez(os.path.join(tmp, "spaces.npz"), **arrays)

    with open(os.path.join(tmp, "graph.json"), "w") as f:
        f.write(graph_json)

    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        f.write(manifest_json)

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


def load_kg(path: str, config: Optional[KGConfig] = None) -> KGStore:
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["version"] > KG_MANIFEST_VERSION:
        raise ValueError("manifest too new")
    with open(os.path.join(path, "graph.json")) as f:
        graph = json.load(f)

    kg = KGStore(config, dim=manifest["dim"], scope=graph.get("scope") or {})
    data = np.load(os.path.join(path, "spaces.npz"), allow_pickle=False)
    for space in Space:
        meta = manifest["spaces"][space.value]
        table = kg.spaces[space]
        vecs = data[f"{space.value}_vecs"]
        if meta["bf16"]:
            table.index.vecs = jax.lax.bitcast_convert_type(
                jnp.asarray(vecs), jnp.bfloat16)
        else:
            table.index.vecs = jnp.asarray(vecs)
        table.index.int8 = jnp.asarray(data[f"{space.value}_int8"])
        table.index.live = jnp.asarray(data[f"{space.value}_live"])
        table.index.inv_norms = jnp.zeros(
            (table.index.vecs.shape[0], 0), dtype=jnp.float32)
        table.index.size = int(meta["size"])
        table.payloads = meta["payloads"]
        table.by_key = {tuple(k): v for k, v in meta["by_key"]}
        table.by_id = {}
        for k, v in table.by_key.items():
            table.by_id.setdefault(k[1], {})[k] = v

    kg.documents = graph["documents"]
    kg.doc_pages = {d: {int(p): r for p, r in pages.items()}
                    for d, pages in graph["doc_pages"].items()}
    kg.entity_edges = {int(k): [tuple(e) for e in v]
                       for k, v in graph["entity_edges"].items()}
    kg.page_mentions = {int(k): v for k, v in graph["page_mentions"].items()}
    kg.column_values = {int(k): v for k, v in graph["column_values"].items()}
    return kg
