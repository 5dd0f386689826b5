"""File-format source/sink coverage (SURVEY.md §2.2 row 1): the engine
reads and writes Parquet / ORC / JSON / CSV through the standard
DataFrame reader/writer, and the watch pipeline runs identically over any
of them (the source abstraction is format-agnostic — sources/files.py).

CSV carries no binary type, so the raw `data` column round-trips through
a base64 string there — the documented CSV envelope convention.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kinesis_log_watcher_spark.sources.files import TEXT_TS_FORMAT, read_raw_records
from kinesis_log_watcher_spark.sources.fixture import kinesis_records_fixture
from kinesis_log_watcher_spark.watcher import watch


@pytest.fixture(scope="module")
def records(spark):
    return kinesis_records_fixture(spark, n_records=200).cache()


def _rows(df):
    return sorted(
        df.select(
            "streamName", "shardId", "sequenceNumber",
            "approximateArrivalTimestamp", "partitionKey", "data",
        ).collect(),
        key=lambda r: r.sequenceNumber,
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_roundtrip_binary_formats(spark, records, tmp_path, fmt):
    path = str(tmp_path / fmt)
    w = records.write.format(fmt)
    if fmt == "json":
        w = w.option("timestampFormat", TEXT_TS_FORMAT)
    w.save(path)
    back = read_raw_records(spark, path, fmt=fmt)
    assert _rows(back) == _rows(records)


def test_roundtrip_csv_base64(spark, records, tmp_path):
    path = str(tmp_path / "csv")
    # base64() MIME-wraps at 76 chars; strip the newlines so the CSV
    # field is single-line (unbase64 accepts unwrapped input).
    records.withColumn(
        "data", F.translate(F.base64("data"), "\r\n", "")
    ).write.option("header", True).option(
        "timestampFormat", TEXT_TS_FORMAT
    ).csv(path)
    back = (
        spark.read.option("header", True)
        .option("timestampFormat", TEXT_TS_FORMAT)
        .schema(
            "streamName string, shardId string, sequenceNumber string, "
            "approximateArrivalTimestamp timestamp, partitionKey string, "
            "data string"
        )
        .csv(path)
        # CSV reads the empty field as null; the envelope's empty payload
        # is b"" (the reference renders it as an empty LogEntry, not nil)
        .withColumn("data", F.coalesce(F.unbase64("data"), F.lit(b"")))
    )
    assert _rows(back) == _rows(records)


def test_watch_runs_over_any_format(spark, records, tmp_path):
    expected = sorted(watch(records, one_shot=True))
    for fmt in ("parquet", "orc", "json"):
        path = str(tmp_path / f"w_{fmt}")
        w = records.write.format(fmt)
        if fmt == "json":
            w = w.option("timestampFormat", TEXT_TS_FORMAT)
        w.save(path)
        got = sorted(watch(read_raw_records(spark, path, fmt=fmt), one_shot=True))
        assert got == expected, fmt


def test_compaction_reduces_files_with_disjoint_ranges(spark, tmp_path):
    """compact_dataset: 64 fragments → exactly N right-sized files,
    non-overlapping on the sort column (min/max stats then prune range
    scans), content-identical."""
    import glob

    import pyarrow.parquet as pq

    from kinesis_log_watcher_spark.queries.base import load
    from kinesis_log_watcher_spark.sources.files import compact_dataset

    orders = load(spark, "/root/testdata/sf0.001", "orders")
    frag, packed = str(tmp_path / "frag"), str(tmp_path / "packed")
    orders.repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/part-*.parquet")) == 64

    back = compact_dataset(spark, frag, packed, target_files=4,
                           sort_col="o_orderkey")
    files = sorted(glob.glob(f"{packed}/part-*.parquet"))
    assert len(files) == 4
    # content preserved exactly
    assert back.count() == orders.count()
    dec = lambda df: df.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
    ).collect()[0][0]
    assert dec(back) == dec(orders)  # exact — partitioning-independent
    # sorted within each file; per-file o_orderkey ranges disjoint
    # (range partitioning → parquet min/max stats prune range scans)
    bounds = []
    for f in files:
        vals = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert vals == sorted(vals), f
        if vals:
            bounds.append((vals[0], vals[-1]))
    bounds.sort()
    for (_, hi1), (lo2, _) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2  # non-overlapping


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """zorder_write: files are Morton-ordered (monotone Z within each
    file, disjoint Z ranges across files) and content-identical — the
    layout that lets parquet stats prune scans on EITHER key."""
    import glob

    import pyarrow.parquet as pq

    from kinesis_log_watcher_spark.queries.base import load
    from kinesis_log_watcher_spark.sources.files import zorder_write

    def morton(a: int, b: int, bits: int = 16) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    li = load(spark, "/root/testdata/sf0.001", "lineitem")
    dest = str(tmp_path / "zordered")
    back = zorder_write(li, dest, "l_partkey", "l_suppkey", target_files=4)
    files = sorted(glob.glob(f"{dest}/part-*.parquet"))
    assert len(files) == 4
    assert back.count() == li.count()
    dec = lambda df: df.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    ).collect()[0][0]
    assert dec(back) == dec(li)
    bounds = []
    for f in files:
        t = pq.read_table(f, columns=["l_partkey", "l_suppkey"])
        zs = [
            morton(a, b)
            for a, b in zip(t["l_partkey"].to_pylist(), t["l_suppkey"].to_pylist())
        ]
        assert zs == sorted(zs), f  # Morton-monotone within the file
        if zs:
            bounds.append((zs[0], zs[-1]))
    bounds.sort()
    for (_, hi1), (lo2, _) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2  # disjoint Z ranges across files
