"""cuttana_spark — a PySpark-native link-graph analytics engine.

Capability parity target: Jacob-Chmura/cuttana (a single-threaded Rust
streaming graph partitioner), re-expressed Spark-first, plus the analytics
suite the north rule mandates (PageRank, connected components, label
propagation, triangle counting) and large-scale training-data operators
(dedup, similarity search, text analysis) over the same engine.

Layout:
  session        SparkSession factory with scale-oriented defaults
  transcripts    deterministic transcripts fixture generator (FIXTURES.md)
  sources/       adjacency CSV / in-memory / parquet edge sources
  operators/     edge derivation, dedup, similarity, text, multimodal
  partition/     Cuttana streaming partitioner (config/core/refine/metrics)
  analytics/     PageRank, CC, LPA, triangles, CSR blocks, superstep runner
  plans/         warehouse shim (Iceberg-shaped snapshot/commit/time-travel)
"""

__version__ = "0.1.0"
