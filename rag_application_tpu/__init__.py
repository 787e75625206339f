"""rag_application_tpu — a TPU-native retrieval-augmented-generation framework.

A ground-up re-design of the capabilities of OmniRAG
(VivekMalipatel/RAG_Application) for TPU hardware. Where the reference
delegates its performance tier to external engines (Qdrant HNSW, Neo4j
vector indexes, fastembed BM25, HTTP model servers), this framework keeps
the index resident in device HBM and expresses search, fusion, traversal
and encoding as batched XLA/Pallas programs sharded over a `jax.sharding.Mesh`.

Layering (bottom-up):
  ops/       device kernels: fused top-k, int8/matryoshka quantization,
             BM25 sparse retrieval, RRF fusion, late-interaction rerank,
             HNSW beam search, masked-adjacency graph traversal
  index/     HBM-resident corpus shards (dense + int8 + matryoshka views,
             BM25 postings, payload/filter bitmaps), checkpoint/restore
  models/    JAX encoders (text / multimodal) + tokenizer + embedding cache
  search/    the hybrid query pipeline as one jitted program
  kg/        knowledge-graph store: entity/relationship/page/column spaces,
             multi-space kNN, k-hop traversal, dedup
  ingest/    host-side async ingest pipeline: chunk -> encode -> insert,
             priority work queue with retry/failed ledger
  parallel/  mesh construction, sharding rules, distributed top-k merge
  agents/    agent kernel (summarize -> llm -> tools loop), memory tiers
  tools/     knowledge-search toolbox over the native query API
  llm/       provider router abstraction for LLM calls (optional, host-side)
  api/       FastAPI surface reproducing the reference endpoints
"""

__version__ = "0.1.0"
