"""Metis-Ray: a Ray-Data-native link-graph analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
Semi-ATE/Metis (streaming typed-record ingestion, stateful enrichment,
partition-by-key landing, checksummed lossless import) as a Ray Data engine
over source-code Parquet corpora:

    read_parquet(corpus) -> map_batches(edge extraction, zero-copy Arrow)
      -> symbol resolution (broadcast join) -> edge dedup (hash shuffle)
      -> partitioned CSR shards (stateful actors)
      -> iterative gather-scatter supersteps (PageRank, connected
         components, label propagation, triangle counting)
      -> checkpointed, lineage-tracked Parquet outputs.

See SURVEY.md for the operator-by-operator mapping to the reference
(/root/reference, Semi-ATE/Metis).
"""

__version__ = "0.1.0"
