"""Initial snapshot bootstrap (SURVEY S8).

The reference snapshots existing table content by generating INIT
('i') events from a flashback-consistent SELECT with optional filter
and ORDER BY (db_trigger_generator_oracle.rb:499-569, flashback SCN at
:531). Spark-side, the same contract is: read a consistent snapshot
version of the base table, apply the initialization filter/order, emit
op='I' events at seq below every real change seq — then stream real
changes on top. The lake table's `overwrite` path is the degenerate
fast case (bulk load instead of event replay); both are provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movex_cdc_spark.config.table_config import TableCfg


def snapshot_to_init_events(
    base: DataFrame,
    cfg: TableCfg,
    snapshot_seq: int = 0,
) -> DataFrame:
    """Turn a base-table snapshot into INIT events (op='I', seq =
    snapshot_seq) honoring initialization_filter and order.

    `snapshot_seq` must be below the first real change seq so LWW and
    the MERGE `s.seq > t.last_seq` guard let every later change win —
    the exact role of the flashback SCN boundary in the reference."""
    df = base
    if cfg.initialization_filter:
        df = df.filter(F.expr(cfg.initialization_filter))
    if cfg.initialization_order_by:
        df = df.orderBy(F.expr(cfg.initialization_order_by))
    return df.withColumn("seq", F.lit(snapshot_seq).cast("long")).withColumn(
        "op", F.lit("I")
    )
