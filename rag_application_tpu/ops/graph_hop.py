"""k-hop graph expansion as batched adjacency gathers.

Replaces the reference's Cypher variable-length path traversals:
  * v1 `retrieve_knowledge_paths` `[*1..max_depth]` (app/core/graph_db/
    neo4j/neo4j_search.py:96-137, depth <= 5)
  * v2 `execute_traverse_entity_graph` 1-3 hop expansion and
    `execute_bfs` (AgentAPI/app/core/knowledge_search/queries.py:383-407,
    600-638)

The graph lives as padded fixed-degree adjacency (N+1, D) in HBM
(sentinel row N). A frontier of seed nodes expands one hop per step:
gather neighbor rows, dedup against the visited pool, optionally score
frontier nodes against a query embedding and keep only the best
`expansion_factor` per hop (parity: GraphSearchParams.expansion_factor,
app/services/agents/graph_search_workflow.py:87-119). Fixed hop count =
fixed trip loop; everything stays on device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


@functools.partial(jax.jit, static_argnames=("hops", "frontier_cap"))
def k_hop_expand(
    adj: jax.Array,       # (N+1, D) int32, sentinel row N
    seeds: jax.Array,     # (Q, S) int32 seed ids (sentinel N = padding)
    hops: int,
    *,
    frontier_cap: int = 256,
    scores: Optional[jax.Array] = None,   # (N+1,) relevance per node
    node_mask: Optional[jax.Array] = None,  # (N+1,) bool allowed nodes
) -> Tuple[jax.Array, jax.Array]:
    """Expand seeds `hops` steps. Returns (visited (Q, V), hop (Q, V))
    where V = S + hops*frontier_cap; unvisited slots hold the sentinel
    and hop = -1. When `scores` is given, each hop keeps only the
    `frontier_cap` highest-scoring new nodes (beam-pruned expansion)."""
    n = adj.shape[0] - 1
    deg = adj.shape[1]
    q, s = seeds.shape
    sentinel = jnp.int32(n)

    def apply_mask(ids):
        if node_mask is None:
            return ids
        safe = jnp.clip(ids, 0, n)
        return jnp.where(node_mask[safe], ids, sentinel)

    visited = apply_mask(seeds)
    hop_tag = jnp.where(visited < n, 0, -1)
    frontier = visited

    for h in range(1, hops + 1):
        nbrs = adj[jnp.clip(frontier, 0, n)].reshape(q, -1)  # (Q, F*D)
        nbrs = jnp.where(
            jnp.repeat(frontier < n, deg, axis=-1), nbrs, sentinel
        )
        nbrs = apply_mask(nbrs)
        # dedup against visited and within the batch of new nodes
        seen = jnp.any(
            nbrs[:, :, None] == visited[:, None, :], axis=-1
        )
        pos = jnp.arange(nbrs.shape[-1])
        dup = jnp.any(
            (nbrs[:, :, None] == nbrs[:, None, :])
            & (pos[None, :, None] > pos[None, None, :]),
            axis=-1,
        )
        nbrs = jnp.where(seen | dup, sentinel, nbrs)
        # beam-prune new frontier to frontier_cap
        if scores is not None:
            sc = jnp.where(nbrs < n, scores[jnp.clip(nbrs, 0, n)], NEG_INF)
        else:
            sc = jnp.where(nbrs < n, 0.0, NEG_INF)
        keep = min(frontier_cap, nbrs.shape[-1])
        top_sc, top_pos = jax.lax.top_k(sc, keep)
        new_frontier = jnp.take_along_axis(nbrs, top_pos, axis=-1)
        new_frontier = jnp.where(jnp.isfinite(top_sc), new_frontier, sentinel)

        visited = jnp.concatenate([visited, new_frontier], axis=-1)
        hop_tag = jnp.concatenate(
            [hop_tag, jnp.where(new_frontier < n, h, -1)], axis=-1
        )
        frontier = new_frontier

    return visited, hop_tag


@functools.partial(jax.jit, static_argnames=("hops",))
def path_reachability(
    adj: jax.Array,    # (N+1, D)
    src: jax.Array,    # (Q,) int32
    dst: jax.Array,    # (Q,) int32
    hops: int,
) -> jax.Array:
    """Whether dst is reachable from src within `hops` hops (per pair).

    Dense-frontier variant: maintains a (Q, N) visited bitmap — the
    masked-adjacency-power formulation. Use for moderate N (the KG's
    entity count, not the chunk corpus)."""
    n = adj.shape[0] - 1
    q = src.shape[0]
    visited = jnp.zeros((q, n), dtype=bool)
    visited = visited.at[jnp.arange(q), jnp.clip(src, 0, n - 1)].set(src < n)

    def step(_, vis):
        return _expand_frontier(adj, vis)

    visited = jax.lax.fori_loop(0, hops, step, visited)
    ok = visited[jnp.arange(q), jnp.clip(dst, 0, n - 1)]
    return jnp.where(dst < n, ok, False)


def _expand_frontier(adj: jax.Array, vis: jax.Array) -> jax.Array:
    """One BFS step over the padded adjacency: for each node i visited,
    mark adj[i] — new[q, j] = any_i vis[q, i] & (adj[i, :] == j),
    implemented as a scatter-max per degree slot."""
    n = adj.shape[0] - 1
    q = vis.shape[0]
    new = vis
    for dslot in range(adj.shape[1]):
        col = adj[:n, dslot]  # (N,)
        contrib = jnp.zeros((q, n + 1), dtype=bool)
        contrib = contrib.at[:, jnp.clip(col, 0, n)].max(vis[:, :n])
        new = new | contrib[:, :n]
    return new


def path_first_hop(
    adj: jax.Array,    # (N+1, D)
    src: jax.Array,    # (Q,) int32
    dst: jax.Array,    # (Q,) int32
    hops: int,
) -> jax.Array:
    """Smallest hop count (0..hops) at which dst is reachable from src;
    -1 when not reachable within `hops`. 0 means src == dst.

    ONE compiled program covers every hop count — calling
    `path_reachability` per candidate h pays a distinct remote compile
    per h (2-5 s each on this backend, no warm cache) and re-walks hops
    1..h-1 every iteration."""
    n = adj.shape[0] - 1
    q = src.shape[0]
    visited = jnp.zeros((q, n), dtype=bool)
    visited = visited.at[jnp.arange(q), jnp.clip(src, 0, n - 1)].set(src < n)
    d_idx = jnp.clip(dst, 0, n - 1)
    d_ok = dst < n
    first = jnp.where(
        jnp.logical_and(jnp.logical_and(src == dst, src < n), d_ok),
        0, -1).astype(jnp.int32)

    def step(h, carry):
        vis, first = carry
        vis = _expand_frontier(adj, vis)
        at_dst = jnp.logical_and(vis[jnp.arange(q), d_idx], d_ok)
        first = jnp.where(jnp.logical_and(first < 0, at_dst),
                          h + 1, first)
        return vis, first

    _, first = jax.lax.fori_loop(0, hops, step, (visited, first))
    return first
