"""Entity deduplication job.

Parity: the reference's background deduplicator (app/core/graph_db/
neo4j/deduplicator.py): per user, vector kNN (score > 0.85) AND string
similarity > 0.8 AND same entity type -> duplicates (:35-43); keep the
best by occurrence count then text length (:86-131); merge via apoc
mergeNodes (:69-75); repeats on an interval (:161-169).

TPU design: the candidate pass is one batched self-kNN of the entity
space (every entity queries every other — exactly the workload the MXU
eats), then the host applies the string filter and merges. Merging keeps
the winner row and tombstones losers, rewiring their edges onto the
winner.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .store import KGStore, Space


def _levenshtein_ratio(a: str, b: str) -> float:
    """difflib-free normalized edit similarity (the reference uses
    python-Levenshtein's ratio; this is the same metric)."""
    la, lb = len(a), len(b)
    if not la and not lb:
        return 1.0
    if not la or not lb:
        return 0.0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    dist = prev[lb]
    return 1.0 - dist / max(la, lb)


def find_duplicates(
    kg: KGStore,
    *,
    k: int = 8,
    score_threshold: Optional[float] = None,
    string_threshold: Optional[float] = None,
) -> List[Tuple[int, int, float]]:
    """Candidate duplicate entity pairs (row_a < row_b, cosine score)."""
    if score_threshold is None:  # `or` would discard an explicit 0.0
        score_threshold = kg.cfg.dedup_score_threshold
    if string_threshold is None:
        string_threshold = kg.cfg.dedup_string_threshold
    table = kg.spaces[Space.ENTITY]
    n = table.index.size
    if n < 2:
        return []
    import jax.numpy as jnp

    vecs = np.asarray(table.index.vecs[:n].astype(jnp.float32))
    live = np.asarray(table.index.live[:n])
    k_eff = min(k + 1, n)
    vals, ids = table.index.search(vecs, k_eff)
    vals, ids = np.asarray(vals), np.asarray(ids)

    pairs = []
    seen = set()
    for row in range(n):
        if not live[row]:
            continue
        pa = table.get(row)
        if pa is None:
            continue
        for score, other in zip(vals[row], ids[row]):
            other = int(other)
            if other == row or not np.isfinite(score):
                continue
            if score < score_threshold:
                continue
            key = (min(row, other), max(row, other))
            if key in seen:
                continue
            seen.add(key)
            pb = table.get(other)
            if pb is None:
                continue
            if pa.get("entity_type") != pb.get("entity_type"):
                continue
            sim = _levenshtein_ratio(
                str(pa.get("text", "")).lower(), str(pb.get("text", "")).lower()
            )
            if sim >= string_threshold:
                pairs.append((key[0], key[1], float(score)))
    return pairs


def _merge_rank(payload: Dict) -> Tuple[int, int]:
    """Keep-best ordering: occurrence count, then text length (parity:
    deduplicator.py:86-131)."""
    return (int(payload.get("occurrences", 1)), len(str(payload.get("text", ""))))


def merge_duplicates(kg: KGStore, pairs: List[Tuple[int, int, float]]) -> int:
    """Merge each duplicate pair: winner keeps edges + summed occurrence
    count; loser is tombstoned. Returns number of merges."""
    table = kg.spaces[Space.ENTITY]
    merged = 0
    redirect: Dict[int, int] = {}

    def resolve(r: int) -> int:
        while r in redirect:
            r = redirect[r]
        return r

    for a, b, _ in pairs:
        a, b = resolve(a), resolve(b)
        if a == b:
            continue
        pa, pb = table.get(a), table.get(b)
        if pa is None or pb is None:
            continue
        winner, loser = (a, b) if _merge_rank(pa) >= _merge_rank(pb) else (b, a)
        wp = table.get(winner)
        lp = table.get(loser)
        wp["occurrences"] = int(wp.get("occurrences", 1)) + int(
            lp.get("occurrences", 1)
        )
        # rewire loser edges onto the winner
        for rel_row, other in kg.entity_edges.pop(loser, []):
            other = resolve(other)
            if other != winner:
                kg.entity_edges.setdefault(winner, []).append((rel_row, other))
                if other in kg.entity_edges:
                    kg.entity_edges[other] = [
                        (rr, winner if resolve(t) == loser else resolve(t))
                        for rr, t in kg.entity_edges[other]
                    ]
        # drop the winner's own edges to the tombstoned loser (a
        # winner-loser relationship would otherwise point at a dead row
        # forever: entity_context returned neighbor=None for it)
        if winner in kg.entity_edges:
            kg.entity_edges[winner] = [
                (rr, t) for rr, t in kg.entity_edges[winner]
                if resolve(t) != loser and t != loser
            ]
        # loser key now points at the winner (future MERGEs hit the winner)
        loser_keys = [k for k, r in table.by_key.items() if r == loser]
        table.index.delete([loser])
        table.payloads[loser] = None
        for k in loser_keys:
            table.by_key[k] = winner
        redirect[loser] = winner
        merged += 1
    if merged:
        kg._adj_cache = None
    return merged


def deduplicate(kg: KGStore, **kw) -> int:
    """One full dedup pass (parity: deduplicate_user_graph). Holds the
    store's mutation lock so a concurrent checkpoint snapshot never sees
    a half-merged entity table."""
    with kg.lock:
        return merge_duplicates(kg, find_duplicates(kg, **kw))


async def deduplication_loop(kg: KGStore, *, interval: float = 300.0,
                             stop_event=None, **kw) -> int:
    """Background loop re-running dedup every `interval` seconds (parity:
    start_deduplication, deduplicator.py:161-169). Stops when
    `stop_event` (asyncio.Event) is set; returns total merges."""
    import asyncio

    total = 0
    while stop_event is None or not stop_event.is_set():
        total += deduplicate(kg, **kw)
        try:
            if stop_event is not None:
                await asyncio.wait_for(stop_event.wait(), timeout=interval)
            else:
                await asyncio.sleep(interval)
        except asyncio.TimeoutError:
            pass
    return total
