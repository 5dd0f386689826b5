"""Timestamp layout compatibility for driver-generated testdata.

The driver has shipped the events/orders/lineitem timestamp columns in two
parquet layouts across rounds:

- legacy: ``TIMESTAMP(NANOS)`` — unreadable without
  ``spark.sql.legacy.parquet.nanosAsLong``, under which it scans as
  ``bigint`` nanoseconds;
- current: naive ``timestamp[us]`` — scans as ``TIMESTAMP_NTZ``.

Every reader (batch ``queries/base.load`` and the streaming sources)
normalizes to session-zone ``TimestampType`` so queries, tests, and the
DuckDB oracle see one stable dtype regardless of which layout is on disk.
``ensure_session_confs`` pins the session to UTC first, so the NTZ cast
preserves wall-clock values exactly; the nanos data is µs-aligned, so the
integer division is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_ts_cols(df: DataFrame, nanos_bigint_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Cast timestamp columns of either testdata layout to TimestampType.

    - columns named in ``nanos_bigint_cols`` that scan as ``bigint`` are
      treated as nanosecond epochs (legacy nanosAsLong layout);
    - any ``timestamp_ntz`` column is cast to session-zone timestamp
      (exact under the UTC session conf).
    """
    dtypes = dict(df.dtypes)
    out: dict[str, F.Column] = {}
    for name in nanos_bigint_cols:
        if dtypes.get(name) == "bigint":
            out[name] = F.timestamp_micros(F.expr(f"{name} div 1000"))
    for name, dtype in dtypes.items():
        if dtype == "timestamp_ntz":
            out[name] = F.col(name).cast("timestamp")
    return df.withColumns(out) if out else df
