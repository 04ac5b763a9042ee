"""movex_cdc_spark — a PySpark-native CDC / incremental-ingest engine.

Re-realizes the semantics of osp-ottogroup/movex-cdc (trigger-log →
ordered, exactly-once Kafka transfer) as an idiomatic Spark pipeline:

    change events → broadcast-join config → condition filters →
    key-partitioned shuffle → last-writer-wins dedup by sequence →
    MERGE-style upsert into a snapshot-versioned lake table →
    lineage/metrics append, all inside ``foreachBatch`` with
    idempotent epoch-id fencing.

Everything here is built on the public PySpark DataFrame API; no code
is copied from the reference (which is Ruby/PLSQL/Java).
"""

__version__ = "0.1.0"
