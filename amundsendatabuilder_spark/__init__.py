"""amundsendatabuilder_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference ETL framework
(AndrewCiambrone/amundsendatabuilder — a single-threaded record-at-a-time
Extractor→Transformer→Loader→Publisher pipeline) as an idiomatic Spark engine:

* changelog scan  → DataFrame over parquet / Structured Streaming file source
* LWW dedup       → window-ranked ``row_number`` (salted two-phase variant for skew)
* entity extraction / model fan-out → JVM-side column expressions + Arrow UDFs
* upsert/publish  → bucketed copy-on-write MERGE into snapshot tables
                    (atomic manifest pointer swap, epoch ledger = exactly-once)
* staleness removal, additive schema evolution, per-partition lineage metrics

Layout:
    sources/    changelog generator, csv/jdbc-style extractors, stream sources
    operators/  dedup, extract, model expansions, merge, staleness
    functions/  key grammar, canonical serialization, text/dedup/similarity fns
    plans/      the snapshot lake (manifest + atomic commit + CoW merge)
    streaming/  foreachBatch pipeline wiring, checkpoints, epoch-idempotent replay
"""

__version__ = "0.1.0"
