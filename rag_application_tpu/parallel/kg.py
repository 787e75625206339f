"""Sharded multi-space KG search: the 4 embedded spaces over a mesh.

Scales `kg/store.py::search_across_spaces` past one chip's HBM — the
reference scales the same surface by growing Neo4j
(IndexerAPI/src/core/storage/neo4j_handler.py:809-827). At v2's 2048-d,
a bf16 page/entity space costs 4 KiB/row (+2 KiB int8): one v5e chip
(~14 GiB usable) holds ~2.3M rows across all four spaces; an 8-chip
mesh row-shards each space and holds ~18M, and capacity mode (int8-only
planes, 2 KiB + 4 B recip/row) roughly 3x that again. Rows-per-chip
bound: sum_s rows_s * bytes_per_row(mode) <= HBM per chip.

Design (mirrors parallel/search.py): every space's rows shard over the
mesh axis; ONE shard_map program scores all spaces against the query
(the single-chip path also fuses the 4 scans into one device program),
each shard emits its local top-k per space, and per-space candidate
lists all-gather over ICI for a global top-k merge — the corpus never
moves. Payload materialization and the score-sorted cross-space merge
stay on host, identical to the single-chip `search_across_spaces`, so
results match it exactly (tests/test_kg_sharded.py asserts equality on
the 8-device CPU mesh).

Snapshot semantics: `ShardedKGSearch` captures the store's planes at
build time (rows_per_shard padded to a power of two so growth causes
log-many recompiles); call `refresh()` after upserts. This is a
search-time accelerator for big stores — small stores keep using the
single-chip KGStore path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..kg.store import KGStore, Space

_MIN_RPS = 8


def _pow2(n: int) -> int:
    p = _MIN_RPS
    while p < n:
        p *= 2
    return p


def build_sharded_kg(store: KGStore, n_shards: int, *,
                     capacity: bool = False) -> Dict[str, Any]:
    """Host-side snapshot of every non-empty space, padded per shard.

    capacity=False: bf16 planes (exact — same scores as the single-chip
    `DenseIndex.search`). capacity=True: int8 planes + per-row 1/||row||
    reciprocals; score = (q . int8_row) / ||int8_row|| is the exact
    cosine of the *quantized* row (the int8 storage floor), which is
    what capacity-mode single-chip search scores too.
    """
    spaces: Dict[Space, Dict[str, np.ndarray]] = {}
    for s, table in store.spaces.items():
        idx = table.index
        size = idx.size
        if size == 0:
            continue
        rps = _pow2((size + n_shards - 1) // n_shards)
        total = rps * n_shards
        live = np.zeros((total,), dtype=bool)
        live[:size] = np.asarray(idx.live[:size])
        if capacity:
            if idx.int8 is None:
                raise ValueError(f"space {s} has no int8 plane")
            plane = np.zeros((total, store.dim), dtype=np.int8)
            plane[:size] = np.asarray(idx.int8[:size])
            norms = np.linalg.norm(plane.astype(np.float32), axis=-1)
            recip = np.where(norms > 0, 1.0 / np.maximum(norms, 1e-12),
                             0.0).astype(np.float32)
            spaces[s] = {"plane": plane, "recip": recip, "live": live,
                         "size": size, "rps": rps}
        else:
            if idx.vecs is None:
                raise ValueError(
                    f"space {s} is capacity-mode (no bf16 plane); build "
                    f"with capacity=True")
            plane = np.zeros((total, store.dim), dtype=np.float32)
            plane[:size] = np.asarray(idx.vecs[:size], dtype=np.float32)
            spaces[s] = {"plane": plane.astype(jnp.bfloat16), "live": live,
                         "size": size, "rps": rps}
    return {"spaces": spaces, "capacity": capacity, "dim": store.dim,
            "n_shards": n_shards}


def place_sharded_kg(mesh: Mesh, built: Dict[str, Any], *,
                     axis: str = "data") -> Dict[str, Any]:
    """device_put every plane row-sharded over ``axis``."""
    rows = NamedSharding(mesh, P(axis, None))
    flat = NamedSharding(mesh, P(axis))
    placed: Dict[Space, Dict[str, Any]] = {}
    for s, t in built["spaces"].items():
        entry = {
            "plane": jax.device_put(jnp.asarray(t["plane"]), rows),
            "live": jax.device_put(jnp.asarray(t["live"]), flat),
            "size": t["size"], "rps": t["rps"],
        }
        if built["capacity"]:
            entry["recip"] = jax.device_put(jnp.asarray(t["recip"]), flat)
        placed[s] = entry
    return {"spaces": placed, "capacity": built["capacity"],
            "dim": built["dim"], "axis": axis}


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _kg_search_program(mesh: Mesh, axis: str, k: int, capacity: bool,
                       meta: Tuple[Tuple[str, int, int], ...],
                       q: jax.Array, *planes: jax.Array
                       ) -> Tuple[jax.Array, ...]:
    """One fused shard_map over all spaces.

    meta: ((space_value, size, rows_per_shard), ...) — static.
    planes: per space, (plane, live[, recip]) flattened in meta order.
    Returns per space (vals (Q, k), ids (Q, k)) flattened, replicated,
    ids global (= DenseIndex rows), dead/padding rows scored -inf.
    """
    per = 3 if capacity else 2
    in_specs = [P()]
    for _ in meta:
        in_specs += [P(axis, None), P(axis)] + ([P(axis)] if capacity else [])
    out_specs = tuple(P() for _ in range(2 * len(meta)))

    from ..ops.topk import blocked_topk

    def program(qr, *parts):
        shard_id = jax.lax.axis_index(axis)
        outs: List[jax.Array] = []
        for i, (_name, size, rps) in enumerate(meta):
            plane = parts[per * i]
            live = parts[per * i + 1]
            start = shard_id * rps
            local_valid = jnp.clip(size - start, 0, rps)
            kk = min(k, rps)
            if capacity:
                # int8 MXU scan: q8 . row (int32) * per-row 1/||row|| / 127
                # — the same quantized-row cosine capacity-mode DenseIndex
                # search scores. Exact local top-k only when the shard is
                # small (exact lax.top_k over big arrays compiles for
                # minutes through the relay).
                recip = parts[per * i + 2]
                q8 = jnp.clip(jnp.round(qr * 127.0), -127, 127
                              ).astype(jnp.int8)
                scores = jax.lax.dot_general(
                    q8, plane, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                scores = scores * (recip[None, :] / 127.0)
                rows = jnp.arange(rps, dtype=jnp.int32)
                ok = jnp.logical_and(live, rows < local_valid)
                scores = jnp.where(ok[None, :], scores, -jnp.inf)
                if rps > 4096:
                    vals, pos = jax.lax.approx_max_k(scores, kk)
                    pos = pos.astype(jnp.int32)
                else:
                    vals, pos = jax.lax.top_k(scores, kk)
            else:
                vals, pos = blocked_topk(
                    plane, qr.astype(plane.dtype), kk,
                    block_size=min(131072, rps), valid_n=local_valid,
                    filter_mask=live, approx=True)
            idx = pos + start
            vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
            all_v = jax.lax.all_gather(vals, axis)
            all_i = jax.lax.all_gather(idx, axis)
            s, qn, _ = all_v.shape
            all_v = jnp.transpose(all_v, (1, 0, 2)).reshape(qn, s * kk)
            all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, s * kk)
            out_v, out_pos = jax.lax.top_k(all_v, min(k, s * kk))
            outs += [out_v, jnp.take_along_axis(all_i, out_pos, axis=-1)]
        return tuple(outs)

    fn = shard_map(program, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=out_specs, check_vma=False)
    return fn(q, *planes)


class ShardedKGSearch:
    """Mesh-backed `search_across_spaces` / `search_space` over a KGStore
    snapshot. Results (payloads, scores, ordering) match the single-chip
    KGStore search on the same data; capacity mode scores the quantized
    rows (the int8 storage floor) like capacity-mode DenseIndex."""

    def __init__(self, store: KGStore, mesh: Mesh, *, axis: str = "data",
                 capacity: bool = False):
        self.store = store
        self.mesh = mesh
        self.axis = axis
        self.capacity = capacity
        self.placed: Dict[str, Any] = {"spaces": {}}
        self.refresh()

    def refresh(self) -> None:
        """Re-snapshot the store (call after upserts/deletes)."""
        with self.store.lock:
            built = build_sharded_kg(self.store, self.mesh.shape[self.axis],
                                     capacity=self.capacity)
        self.placed = place_sharded_kg(self.mesh, built, axis=self.axis)

    def _dispatch(self, q: np.ndarray, k: int,
                  spaces: Sequence[Space]) -> Dict[Space, Tuple]:
        tables = self.placed["spaces"]
        active = [s for s in spaces if s in tables]
        if not active:
            return {}
        meta = tuple((s.value, tables[s]["size"], tables[s]["rps"])
                     for s in active)
        planes: List[jax.Array] = []
        for s in active:
            t = tables[s]
            planes += [t["plane"], t["live"]]
            if self.capacity:
                planes.append(t["recip"])
        qj = jnp.asarray(q, dtype=jnp.float32)
        qj = qj / jnp.maximum(jnp.linalg.norm(qj, axis=-1, keepdims=True),
                              1e-12)
        out = _kg_search_program(self.mesh, self.axis, k, self.capacity,
                                 meta, qj, *planes)
        return {s: (out[2 * i], out[2 * i + 1])
                for i, s in enumerate(active)}

    def _materialize(self, space: Space, handle, k: int,
                     filters: Dict[str, Any]) -> List[Dict[str, Any]]:
        if handle is None:
            return []
        vals, ids = handle
        table = self.store.spaces[space]
        out: List[Dict[str, Any]] = []
        for score, row in zip(np.asarray(vals)[0], np.asarray(ids)[0]):
            if not np.isfinite(score):
                continue
            p = table.get(int(row))
            if p is None:
                continue
            if any(p.get(f) != v for f, v in filters.items()):
                continue
            out.append({"space": space.value, "score": float(score),
                        "row": int(row), **p})
        return out[:k]

    def search_space(self, space: Space, query_embedding, k: int = 10,
                     **filters) -> List[Dict[str, Any]]:
        q = np.asarray(query_embedding, dtype=np.float32)[None, :]
        handles = self._dispatch(q, k, [space])
        return self._materialize(space, handles.get(space), k, filters)

    def search_across_spaces(self, query_embedding, k: int = 10,
                             spaces: Optional[Sequence[Space]] = None,
                             **filters) -> List[Dict[str, Any]]:
        spaces = list(spaces or Space)
        q = np.asarray(query_embedding, dtype=np.float32)[None, :]
        handles = self._dispatch(q, k, spaces)
        merged: List[Dict[str, Any]] = []
        for s in spaces:
            merged.extend(self._materialize(s, handles.get(s), k, filters))
        merged.sort(key=lambda h: -h["score"])
        return merged[:k]


def sharded_kg_dryrun(mesh: Mesh) -> None:
    """Tiny-shape execution of the sharded KG path (driver dry run)."""
    rng = np.random.default_rng(0)
    dim = 64
    store = KGStore(dim=dim)
    emb = rng.standard_normal((6, dim)).astype(np.float32)
    ents = [{"id": f"e{i}", "text": f"entity {i}", "entity_type": "T",
             "entity_profile": "p"} for i in range(4)]
    store.upsert_unstructured_page(
        "doc", 1, content="page one", embedding=emb[0],
        entities=ents[:2], entity_embeddings=emb[1:3])
    store.upsert_unstructured_page(
        "doc", 2, content="page two", embedding=emb[3],
        entities=ents[2:], entity_embeddings=emb[4:6],
        relationships=[{"source": "e2", "target": "e3",
                        "relation_type": "R",
                        "relationship_profile": "rp"}],
        relationship_embeddings=emb[0:1])
    single = store.search_across_spaces(emb[1], k=4)
    sharded = ShardedKGSearch(store, mesh)
    multi = sharded.search_across_spaces(emb[1], k=4)
    assert [(h["space"], h["row"]) for h in multi] == \
        [(h["space"], h["row"]) for h in single], (multi, single)
    cap = ShardedKGSearch(store, mesh, capacity=True)
    top = cap.search_across_spaces(emb[1], k=4)
    assert top and top[0]["row"] == single[0]["row"], (top, single)
