"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: CDC replay-to-final-state over the events
               change log at sf0.001.
queries()    — one entry per implemented operator from SURVEY §2
               (movex_cdc_spark.plans.entry_queries registry).
oracle_sql() — matching DuckDB SQL per query; omitted entries get the
               weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from movex_cdc_spark.plans.entry_queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["cdc_apply_final_state"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: oracle for name, (_fn, oracle) in REGISTRY.items() if oracle}
