"""Query registry: every engine capability as a (Spark fn, oracle SQL) pair.

Each registered query is the correctness contract for one operator (or a
small composition) from SURVEY.md §2: the Spark implementation and an
ANSI-SQL oracle DuckDB runs on the same parquet tables. The driver
hash-compares them at sf0.01 (BASELINE.json t2 gate).

Determinism rules every query follows:
- every computed column aliased identically in both dialects,
- float aggregates via exact DECIMAL sums (functions/exact.py) so results
  are bit-identical regardless of partitioning/engine,
- rankings/limits always carry a deterministic tie-break key,
- derived ints cast to BIGINT on both sides (schema parity).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from kinesis_log_watcher_spark.session import ensure_session_confs  # noqa: F401  (re-export)

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver table. Parquet → columnar scan with predicate
    pushdown and column pruning for whatever the query selects.

    Timestamp normalization (the driver regenerated testdata between
    rounds, so both layouts exist in the wild):

    - legacy layout: events.ts is parquet TIMESTAMP(NANOS); with
      spark.sql.legacy.parquet.nanosAsLong it scans as long — convert to
      a microsecond TimestampType (the data is µs-aligned; integer div
      keeps it exact).
    - current layout: naive timestamp[us] columns scan as TIMESTAMP_NTZ;
      cast them to session-zone TimestampType. ensure_session_confs pins
      the session to UTC first, so the cast preserves the wall-clock
      value exactly and every query/oracle sees the same dtypes either
      way."""
    ensure_session_confs(spark)
    from kinesis_log_watcher_spark.functions.tscompat import normalize_ts_cols

    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    return normalize_ts_cols(df)


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def registry() -> dict[str, Query]:
    # Import side-effect modules once, on first use.
    from kinesis_log_watcher_spark.queries import (  # noqa: F401
        extensions,
        llm,
        quality,
        relational,
        sampling,
        streaming,
        tpch_deep,
        watcher_surface,
    )

    return _REGISTRY
