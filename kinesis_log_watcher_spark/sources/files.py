"""File-based record sources (batch + streaming).

The reference reads only from Kinesis (main.go:148-243); for offline
correctness the same logical stream is a parquet/json directory with the
RAW_KINESIS_SCHEMA. Structured Streaming's file source gives the same
micro-batch semantics the connector would (SURVEY.md §1.1).
"""

from __future__ import annotations

import contextlib
import os
import re
import threading

from pyspark.sql import DataFrame, SparkSession

from kinesis_log_watcher_spark.envelope import RAW_KINESIS_SCHEMA


# JSON/CSV are text formats: without an explicit pattern, timestamps
# round-trip at millisecond precision and lose the microseconds the
# envelope carries (arrival timestamps are µs, SURVEY.md §1.3).
TEXT_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def read_raw_records(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Batch read of a raw-record directory."""
    reader = spark.read.format(fmt).schema(RAW_KINESIS_SCHEMA)
    if fmt in ("json", "csv"):
        reader = reader.option("timestampFormat", TEXT_TS_FORMAT)
    return reader.load(path)


def read_raw_records_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of a raw-record directory.

    ``maxFilesPerTrigger`` is the file-source analogue of the reference's
    10k-records-per-GetRecords batch cap (main.go:218) — it bounds
    micro-batch size for backpressure.
    """
    reader = spark.readStream.format(fmt).schema(RAW_KINESIS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def compact_dataset(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_files: int,
    sort_col: str,
) -> DataFrame:
    """Small-files compaction — the storage-maintenance pass every
    large table needs (a 100 TB table accreting thousands of tiny
    micro-batch/task outputs reads orders of magnitude slower than the
    same bytes in right-sized files).

    Rewrites ``src_dir`` as ``target_files`` range-partitioned files
    sorted within each file by ``sort_col``: range partitioning gives
    non-overlapping per-file min/max on the sort column (parquet
    row-group statistics then prune file scans for range predicates),
    and the in-file sort maximizes RLE/dictionary compression. One
    range-exchange shuffle, no driver materialization. Returns the
    compacted dataset re-read from disk."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(src_dir)
    (
        df.repartitionByRange(target_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(dest_dir)
    )
    return spark.read.parquet(dest_dir)


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of an arbitrary parquet dataset (schema inferred
    from a batch read). Accepts a single FILE as well as a directory —
    the file stream source wants a directory, so a file path is turned
    into (parent dir + pathGlobFilter) here, ONCE, for every replay
    harness (streaming/tws.py, streaming/neardup.py, …)."""
    import os

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        # pathGlobFilter is a GLOB (Hadoop GlobPattern: * ? [..] {..} \),
        # not a literal — backslash-escape metacharacters so a filename
        # containing them matches itself only.
        base = re.sub(r"([\\*?\[\]{}])", r"\\\1", os.path.basename(path))
        reader = reader.option("pathGlobFilter", base)
        path = os.path.dirname(path)
    return reader.parquet(path)


# replay_partitions state: one depth counter + saved conf per session,
# guarded by a lock, so OVERLAPPING replays (the test harnesses run
# 12-wide thread pools against one session) compose: the first entry
# saves the session value and scopes down, nested/concurrent entries
# ride the already-reduced value, and only the LAST exit restores —
# never a stale 'prev' captured mid-scope by a sibling thread.
_REPLAY_LOCK = threading.Lock()
_REPLAY_SCOPES: dict[int, list] = {}  # id(jsparkSession) -> [depth, prev]


def python_state_partitions() -> int:
    """Replay partition count for PYTHON-stateful operators over
    HIGH-CARDINALITY keys (per-user sessionizers/limiters: thousands of
    groups, each group a Python invocation per micro-batch).

    For those, the state-store partition count is also the
    Python-worker parallelism, so the sweet spot scales with cores
    instead of being the fixed overhead-minimizing 2 that JVM-stateful
    replays want: measured at sf0.1 (32 cores) on the timer
    sessionizer, n=2 -> 11-16s vs n=16 -> 4-5s with identical output,
    with the curve flat past 16 (state-store instances start to cost).
    Few-group Python operators (keyed by event_type, ~5 groups) LOSE
    at 16 — parallelism is capped by group count while every partition
    still pays state machinery — so they keep the small default.
    Derived from $SPARK_GRAFT_CPUS so the driver's low-core scaling
    bench sees a proportionally smaller count, never a 32-core
    constant."""
    return max(2, min(16, _env_count("SPARK_GRAFT_CPUS", os.cpu_count() or 4)))


def _env_count(name: str, default: int) -> int:
    """Defensive env parse for partition counts: a malformed or
    non-positive value falls back to the default instead of raising at
    query start (or silently producing an invalid shuffle-partition
    count)."""
    try:
        n = int(os.environ.get(name, "") or default)
    except ValueError:
        return default
    return n if n >= 1 else default


@contextlib.contextmanager
def replay_partitions(spark, n: int | None = None):
    """Scope ``spark.sql.shuffle.partitions`` down for a BOUNDED replay.

    Stateful streaming fixes its state-store partition count from this
    conf at the first micro-batch; at the default 32, a tiny 3-batch
    replay pays 32 state-store instances per stateful operator per
    batch — pure fixed overhead (measured 14.5s -> 3.5s on the chained
    two-level aggregation at sf0.001; a further ~15% per replay going
    4 -> 2, measured on the neardup replay — still multi-partition, so
    cross-partition state merge stays exercised). Replay results are partitioning-
    independent by the repo's determinism contract (order-free state
    merges, exact arithmetic), so the replay harnesses wrap their
    start+await in this scope. Production streams keep the session
    default — this is bounded-replay plumbing only, like the memory
    sink. (Structured Streaming clones the session conf at query
    start, so restoring after the replay cannot affect the running
    query.)

    ``n`` defaults to $SPARK_GRAFT_REPLAY_PARTITIONS (else 4 — a
    2-vs-4-vs-8 sweep over twelve JVM-stateful replays at sf0.1 put 4
    first or tied-first on ten of them, e.g. two-level agg 4.0s -> 3.1s,
    watermark dedup 1.8s -> 1.3s; stream-stream JOINS still pin n=2:
    their per-partition cost is four join state stores, and the sweep
    read 5.6s/6.3s/10.2s at 2/4/8 on the full-outer replay). Callers
    whose per-group work crosses the Python boundary
    (applyInPandasWithState / transformWithState processors) pass a
    larger explicit ``n``: their micro-batch cost is ~|groups| Python
    invocations, and the state-store partition count is also the
    Python-worker parallelism — measured at sf0.1 on the timer
    sessionizer, n=2 -> 11-16s vs n=16 -> 4-5s replay wall with
    identical output. JVM-stateful replays (window aggregations,
    stream-stream joins) keep the small default: their per-partition
    cost is state-store fixed overhead, not parallelizable compute.

    Reentrant and thread-safe: concurrent scopes on one session share
    the first entrant's reduced value (their replays are equally happy
    at any small count) and the session value is restored exactly once,
    at depth 0. A concurrent BATCH query planned during a replay still
    sees the reduced count — that is the documented, perf-only trade
    the partitioning-independence contract allows."""
    if n is None:
        n = _env_count("SPARK_GRAFT_REPLAY_PARTITIONS", 4)
    key = "spark.sql.shuffle.partitions"
    sid = id(spark)
    with _REPLAY_LOCK:
        scope = _REPLAY_SCOPES.get(sid)
        if scope is None:
            prev = spark.conf.get(key)
            try:
                target = min(n, int(prev))  # only ever scope DOWN
            except ValueError:  # e.g. "auto" under AQE-managed settings
                target = n
            spark.conf.set(key, str(target))
            _REPLAY_SCOPES[sid] = scope = [1, prev]
        else:
            scope[0] += 1
    try:
        yield
    finally:
        with _REPLAY_LOCK:
            scope = _REPLAY_SCOPES[sid]
            scope[0] -= 1
            if scope[0] == 0:
                del _REPLAY_SCOPES[sid]
                spark.conf.set(key, scope[1])


def await_or_raise(query, timeout_s: int) -> None:
    """awaitTermination that REFUSES to return a partial answer: a
    bounded replay that hasn't terminated within the timeout raises
    instead of letting the caller read a half-populated memory sink."""
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"streaming replay did not finish within {timeout_s}s; "
            "partial sink contents would be silently wrong"
        )


def morton_code(a, b, bits: int = 16):
    """Interleave the low ``bits`` bits of two non-negative int columns
    into a Z-order (Morton) code — the multi-column clustering key
    behind Z-ORDER data layout: sorting by it keeps rows close in BOTH
    dimensions close in the file order, so parquet min/max statistics
    prune scans filtered on EITHER column (a single-column sort only
    prunes its own column). Pure codegen'd bit arithmetic, no UDF."""
    from pyspark.sql import functions as F

    one = F.lit(1).cast("long")
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(one), 2 * i + 1)
        )
    return code


def zorder_write(
    df: DataFrame,
    dest_dir: str,
    col_a: str,
    col_b: str,
    target_files: int,
    bits: int = 16,
) -> DataFrame:
    """Rewrite a dataset clustered by the Morton code of (col_a, col_b):
    range-partitioned into ``target_files`` files and sorted within each
    by the code — Z-ORDER compaction. One range-exchange shuffle."""
    from pyspark.sql import functions as F

    z = morton_code(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(target_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dest_dir)
    )
    spark = df.sparkSession
    return spark.read.parquet(dest_dir)


def stage_replay_files(spark, parts, prefix: str = "replay_") -> str:
    """Write each DataFrame in ``parts`` as ONE parquet file in a fresh
    replay directory, named and mtime-ordered by position — the shared
    harness for every bounded-replay runner that needs deterministic
    micro-batch boundaries (maxFilesPerTrigger=1 then consumes them in
    exactly this order). Test-scale plumbing: production streams are
    unbounded and never staged."""
    import glob as _glob
    import os
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    from kinesis_log_watcher_spark.staging import scratch_dir

    replay = scratch_dir(prefix=prefix)

    # The per-part writes are independent jobs into disjoint dirs —
    # submit them concurrently (Spark job submission is thread-safe);
    # a replay staging costs ~one write instead of len(parts) writes.
    # The mtime stamping stays sequential-by-index, so the consumption
    # order contract is unchanged.
    def write_part(item) -> None:
        i, part_df = item
        part_df.coalesce(1).write.parquet(os.path.join(replay, f"_s{i}"))

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(parts)))) as pool:
        list(pool.map(write_part, enumerate(parts)))
    for i in range(len(parts)):
        stage = os.path.join(replay, f"_s{i}")
        (part,) = _glob.glob(os.path.join(stage, "part-*.parquet"))
        dest = os.path.join(replay, f"f{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + 10 * i,) * 2)
        shutil.rmtree(stage)
    return replay


def stage_replay_files_split(
    spark, df: DataFrame, part_col: str, n_parts: int, prefix: str = "replay_"
) -> str:
    """Like :func:`stage_replay_files`, but the parts are expressed as a
    PART COLUMN (integer 0..n_parts-1) on one DataFrame and staged with
    a single partitioned write instead of one write job per part — the
    input is scanned ONCE instead of ``n_parts`` times. The part column
    is written as a directory key (never a data column), each part dir's
    single file is renamed to the mtime-ordered f{i}.parquet layout the
    replay readers consume. Parts must all be non-empty (the caller's
    split contract — an empty part would silently drop a micro-batch
    boundary, so it raises).

    SPARK_GRAFT_SPLIT_STAGING=0 falls back to the one-write-job-per-part
    path (the pre-round-12 staging shape) — the A/B hook and safety
    valve."""
    import glob as _glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from kinesis_log_watcher_spark.staging import scratch_dir

    if os.environ.get("SPARK_GRAFT_SPLIT_STAGING", "1") != "1":
        parts = [
            df.filter(F.col(part_col) == i).drop(part_col)
            for i in range(n_parts)
        ]
        return stage_replay_files(spark, parts, prefix=prefix)

    replay = scratch_dir(prefix=prefix)
    stage = os.path.join(replay, "_staged")
    (
        df.repartition(n_parts, part_col)
        .write.partitionBy(part_col)
        .parquet(stage)
    )
    for i in range(n_parts):
        files = _glob.glob(os.path.join(stage, f"{part_col}={i}", "*.parquet"))
        if not files:
            raise ValueError(f"replay part {i} is empty; staging aborted")
        if len(files) == 1:
            dest = os.path.join(replay, f"f{i}.parquet")
            shutil.copy(files[0], dest)
        else:
            # >1 file only if a repartition put one part in two tasks —
            # fold them through a local re-read to keep ONE file per
            # micro-batch (never happens with repartition(n, col), kept
            # for safety).
            sub = spark.read.parquet(*files)
            tmp = os.path.join(replay, f"_m{i}")
            sub.coalesce(1).write.parquet(tmp)
            (one,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
            dest = os.path.join(replay, f"f{i}.parquet")
            shutil.copy(one, dest)
            shutil.rmtree(tmp)
        os.utime(dest, (1_700_000_000 + 10 * i,) * 2)
    shutil.rmtree(stage)
    return replay
