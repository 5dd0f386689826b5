"""Event-time windowed aggregation over a replayed stream.

``run_windowed_counts`` drives a bounded parquet-backed stream through a
tumbling-window aggregate with Trigger.AvailableNow (the reference's -O
one-shot, main.go:89-92) into a memory sink and returns the static
result — the streaming analogue of a GROUP BY date_trunc query, which is
exactly what its DuckDB oracle computes.

At scale: the same plan with a real source + ``withWatermark`` bounds
state; complete-mode memory sink here is test-scale plumbing only.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.functions.tscompat import normalize_ts_cols

from kinesis_log_watcher_spark.session import ensure_session_confs

from kinesis_log_watcher_spark.functions.exact import dec
from kinesis_log_watcher_spark.sources.files import (
    replay_partitions,
    await_or_raise,
    read_parquet_stream,
)

_counter = itertools.count()


def run_windowed_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    timeout_s: int = 300,
) -> DataFrame:
    ensure_session_confs(spark)
    stream = read_parquet_stream(spark, events_path)
    # events.ts layout varies by testdata round (nanos-as-long or NTZ);
    # windowing needs a session-zone timestamp — see functions/tscompat.
    stream = normalize_ts_cols(stream)
    agg = (
        stream.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec(F.col("value"), 28, 4)).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    name = f"windowed_counts_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return spark.table(name)


def run_session_windows(
    spark: SparkSession,
    events_path: str,
    gap: str = "30 minutes",
    timeout_s: int = 300,
) -> DataFrame:
    """Native session windows (``F.session_window``): Spark's built-in
    gap-merge stateful aggregation — the engine-supplied version of what
    streaming/stateful.py builds by hand with applyInPandasWithState.

    Semantics note: a session window's end is ``last event + gap`` (the
    instant the session *would have* timed out), so the SQL oracle
    computes MAX(ts) + gap, not MAX(ts).

    At scale: same state-store story as any streaming agg — state is one
    entry per open session, shuffled by (user, session); with a watermark
    the store evicts closed sessions (complete-mode memory sink here is
    bounded-replay test plumbing).
    """
    ensure_session_confs(spark)
    stream = normalize_ts_cols(read_parquet_stream(spark, events_path))
    agg = (
        stream.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    name = f"session_windows_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return spark.table(name)


def run_streaming_dedup(
    spark: SparkSession,
    events_path: str,
    keys: list[str] | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicates`` over a bounded replay —
    first arrival per key wins, later duplicates are suppressed by the
    state store. Output = the distinct key set (key-only projection, so
    the result is deterministic regardless of which physical row arrived
    first — the oracle is SELECT DISTINCT).

    At scale: state is one entry per distinct key; with a watermark the
    ``dropDuplicatesWithinWatermark`` variant bounds the store for
    unbounded keyspaces (pinned in tests/test_streaming_dedup.py).
    """
    ensure_session_confs(spark)
    keys = keys or ["user_id", "event_type"]
    stream = read_parquet_stream(spark, events_path)
    deduped = stream.select(*keys).dropDuplicates(keys)
    name = f"stream_dedup_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return spark.table(name)


def run_watermark_dedup(
    spark: SparkSession,
    events_path: str,
    delay: str = "400 days",
    timeout_s: int = 300,
) -> DataFrame:
    """Watermark-bounded streaming dedup: ``dropDuplicatesWithinWatermark``
    on (user_id, event_type, minute(ts)). Unlike ``dropDuplicates``, the
    state store EVICTS keys once the watermark passes them — state is
    bounded by the lateness window, not the keyspace, which is the only
    viable dedup shape over an unbounded stream.

    The default delay exceeds the bounded replay's whole time span, so
    every duplicate is in-watermark and the output equals the batch
    DISTINCT (the oracle). Production uses its real out-of-orderness
    bound (minutes) with the identical plan; correctness then holds for
    duplicates within the bound — the documented semantics.
    """
    ensure_session_confs(spark)
    stream = normalize_ts_cols(read_parquet_stream(spark, events_path))
    deduped = (
        stream.withWatermark("ts", delay)
        .select(
            "user_id",
            "event_type",
            F.date_trunc("minute", F.col("ts")).alias("minute_ts"),
            F.col("ts"),
        )
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "minute_ts"])
        .select("user_id", "event_type", "minute_ts")
    )
    name = f"stream_wm_dedup_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return spark.table(name)


def run_sliding_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "2 hours",
    slide: str = "1 hour",
    timeout_s: int = 300,
) -> DataFrame:
    """Sliding event-time windows over a bounded replay: each event lands
    in window/slide overlapping windows (2 here). Same AvailableNow →
    memory-sink plumbing as run_windowed_counts; at scale the identical
    plan runs with a watermark bounding state to window+lateness."""
    ensure_session_confs(spark)
    stream = normalize_ts_cols(read_parquet_stream(spark, events_path))
    agg = (
        stream.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
    name = f"sliding_counts_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return spark.table(name)


# Streaming corpus admission (the curation gate applied at ingest time).
ADMISSION_SOURCES = tuple(f"src{i}" for i in range(0, 20, 2))
ADMISSION_MIN_CHARS = 120
ADMISSION_SAMPLE_THRESHOLD = "40000000"  # hash_draw < t ≈ 25%


def run_streaming_admission(
    spark: SparkSession,
    docs_path: str,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Corpus admission at INGEST time: the same per-document gates a
    batch curation pass applies (source allowlist, length floor,
    deterministic md5-threshold sampling) evaluated on a document
    stream, rolled up per language in complete mode. Stateless row
    flags + one streaming aggregation — at 100 TB/day of crawl this is
    the shape that avoids landing rejected documents at all: the gate
    runs in the ingest job, only admitted docs reach storage, and the
    per-language counters are the live curation dashboard. The
    deterministic hash sample means an ingest-time 25% draw admits
    exactly the docs a later batch re-run would pick (no RNG drift
    between the streaming and batch paths — the md5 convention from
    operators/sampling.py)."""
    from kinesis_log_watcher_spark.sources.files import (
        await_or_raise,
        read_parquet_stream,
    )

    ensure_session_confs(spark)
    stream = read_parquet_stream(
        spark, docs_path, max_files_per_trigger=max_files_per_trigger
    )
    admitted = F.col("source").isin(*ADMISSION_SOURCES) & (
        F.col("n_chars") >= ADMISSION_MIN_CHARS
    )
    sampled = admitted & (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
        < ADMISSION_SAMPLE_THRESHOLD
    )
    flags = stream.select(
        "lang", admitted.alias("p_admit"), sampled.alias("p_samp")
    )
    agg = flags.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_seen"),
        F.sum(F.when(F.col("p_admit"), 1).otherwise(0))
        .cast("long")
        .alias("n_admitted"),
        F.sum(F.when(F.col("p_samp"), 1).otherwise(0))
        .cast("long")
        .alias("n_sampled"),
    )
    name = f"stream_admission_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return spark.table(name)


def run_streaming_hll(
    spark: SparkSession,
    events_path: str,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """STREAMING HyperLogLog: maintain the per-group register table of
    operators/sketch.hll_build as streaming aggregation state, then
    finalize the cardinality estimate batch-side on the sink contents.

    The register update is groupBy-MAX — associative, commutative, and
    order-free — so incremental micro-batch folding provably converges
    to the batch sketch whatever the replay split: state is the
    ≤ groups x 2^p register rows themselves (the sketch IS the state,
    never the keys). The estimate step is a second aggregation over the
    registers; streaming doesn't chain two stateful aggs, and real
    deployments don't want it to — registers live in the store/sink and
    estimates are computed on read (here: hll_estimate over the memory
    sink). At 100 TB/day this is the live-NDV dashboard shape: tiny
    bounded state, mergeable across streams and days."""
    from kinesis_log_watcher_spark.operators.sketch import (
        hll_build,
        hll_estimate,
    )

    ensure_session_confs(spark)
    stream = read_parquet_stream(
        spark, events_path, max_files_per_trigger=max_files_per_trigger
    )
    regs = hll_build(stream, "user_id", group_cols=("event_type",), p=4)

    name = f"stream_hll_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            regs.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return hll_estimate(spark.table(name), group_cols=("event_type",), p=4)


def run_late_data_accounting(
    spark: SparkSession,
    events_path: str,
    late_day: int = 5,
    timeout_s: int = 300,
) -> DataFrame:
    """Watermark LATE-DATA DROP semantics, replayed deterministically.

    Spark's actual guarantee (pinned in tests/test_watermark.py and
    re-confirmed empirically here) is narrower than 'late rows are
    dropped': a late row is dropped only when its window was already
    FINALIZED AND EVICTED in an earlier batch — late rows for windows
    the store never held are admitted and close immediately. The
    harness therefore stages exactly the guaranteed case:

      f0: everything except the late slice (day ``late_day``'s
          even-event_id half — the odd half stays on time, giving the
          late windows on-time state to finalize);
      f1: a far-future sentinel — its watermark push makes batch 2 run
          with wm past EVERY real window, so all real windows
          (day-``late_day`` ones included) finalize and evict first;
      f2: the late slice — each row's window is now gone from state,
          so the rows are dropped (numRowsDroppedByWatermark);
      f3: a second sentinel, so f1's own sentinel window finalizes and
          can be filtered POST-SINK (in-plan the event_type predicate
          would be pushed below the watermark node and the sentinels
          could never advance it — the pushdown trap of
          streaming/joins.py).

    Final append-mode counts therefore exclude exactly the late slice,
    which the SQL oracle states directly."""
    from kinesis_log_watcher_spark.sources.files import (
        await_or_raise,
        read_parquet_stream,
        stage_replay_files,
    )

    ensure_session_confs(spark)
    base = normalize_ts_cols(spark.read.parquet(events_path))
    is_late = (F.dayofmonth("ts") == late_day) & (F.col("event_id") % 2 == 0)
    mx = base.groupBy().agg(F.max("ts").alias("mxts"))

    def sentinel(i: int) -> DataFrame:
        cols = []
        for f in base.schema.fields:
            if f.name == "ts":
                cols.append(
                    (F.col("mxts") + F.expr(f"INTERVAL {2 * i} HOURS"))
                    .cast(f.dataType)
                    .alias("ts")
                )
            elif f.name == "event_type":
                cols.append(F.lit("sentinel").cast(f.dataType).alias(f.name))
            elif f.name == "event_id":
                cols.append(F.lit(-1000 - i).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return mx.select(*cols)

    replay = stage_replay_files(
        spark,
        [base.filter(~is_late), sentinel(1), base.filter(is_late), sentinel(2)],
        prefix="late_replay_",
    )

    stream = normalize_ts_cols(
        read_parquet_stream(spark, replay, max_files_per_trigger=1)
    )
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    name = f"late_accounting_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return spark.table(name).filter(F.col("event_type") != "sentinel")


def run_dynamic_session_windows(
    spark: SparkSession,
    events_path: str,
    timeout_s: int = 300,
) -> DataFrame:
    """Session windows with a PER-EVENT gap expression — the dynamic
    form of ``F.session_window`` (each event holds its session open for
    its own duration; clicks linger 30 minutes, purchases 2 hours,
    everything else 1 hour). Sessions are the union of the per-event
    intervals [ts, ts + gap): order-free, so the batch oracle can state
    them as interval-union islands (a running prefix-max of interval
    ends). Same state story as the fixed-gap form — one store entry per
    open session."""
    ensure_session_confs(spark)
    stream = normalize_ts_cols(read_parquet_stream(spark, events_path))
    gap = (
        F.when(F.col("event_type") == "click", F.lit("30 minutes"))
        .when(F.col("event_type") == "purchase", F.lit("2 hours"))
        .otherwise(F.lit("1 hour"))
    )
    agg = (
        stream.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    name = f"dyn_session_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return spark.table(name)


def run_streaming_minhash_overlap(
    spark: SparkSession,
    events_path: str,
    m: int = 64,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """STREAMING cross-stream Jaccard via one-permutation hashing (Li,
    Owen & Zhang 2012): per (split, register) keep MIN(60-bit md5 hash)
    of the split's activity keys — 2*m state rows total, and MIN is
    associative, commutative, order-free AND duplicate-insensitive, so
    any micro-batch replay split (and any at-least-once re-delivery)
    converges to the batch register table without a streaming distinct.
    Finalized on read: a register where both splits are present votes
    'equal mins' with probability = local Jaccard (the argmin of the
    union lands in the intersection), so the equal-register fraction
    estimates cross-stream key overlap from O(m) state — the live
    'how much does stream A's audience overlap stream B's' dashboard
    that would otherwise need both raw key sets. Registers where only
    one split is present are excluded (the densification refinement of
    OPH; at m << NDV every register is occupied and this is moot)."""
    ensure_session_confs(spark)
    stream = read_parquet_stream(
        spark, events_path, max_files_per_trigger=max_files_per_trigger
    )
    stream = normalize_ts_cols(stream)
    from kinesis_log_watcher_spark.operators.sketch import user_day_key

    sub = stream.filter(F.col("event_type").isin("click", "purchase")).select(
        F.col("event_type").alias("split"), user_day_key().alias("k")
    )
    h = F.conv(F.substring(F.md5(F.col("k")), 1, 15), 16, 10).cast("long")
    regs = (
        sub.select("split", h.alias("h"))
        .withColumn("r", F.col("h") % m)
        .groupBy("split", "r")
        .agg(F.min("h").alias("vmin"))
    )
    name = f"stream_oph_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            regs.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    # (split, r) is unique in the register table, so the a-vs-b
    # comparison is a conditional pivot per register — no self-join of
    # the sink view (which trips conflicting-attribute resolution).
    per_reg = (
        spark.table(name)
        .groupBy("r")
        .agg(
            F.min(F.when(F.col("split") == "click", F.col("vmin"))).alias("va"),
            F.min(F.when(F.col("split") == "purchase", F.col("vmin"))).alias(
                "vb"
            ),
        )
        .filter(F.col("va").isNotNull() & F.col("vb").isNotNull())
    )
    return per_reg.agg(
        F.count("*").cast("long").alias("n_regs_both"),
        F.coalesce(
            F.sum(F.when(F.col("va") == F.col("vb"), 1)), F.lit(0)
        )
        .cast("long")
        .alias("n_regs_equal"),
    )


def run_two_level_agg(
    spark: SparkSession,
    events_path: str,
    timeout_s: int = 300,
) -> DataFrame:
    """CHAINED stateful aggregation in one streaming query (Spark 3.4+
    multiple-stateful-operator support): 10-minute tumbling counts per
    event_type, re-aggregated into per-hour rollups (bucket count, max
    bucket, total) downstream IN THE SAME QUERY — the pre-aggregation
    cascade a 100 TB metrics pipeline runs to keep the wide shuffle at
    the fine granularity and the hourly state tiny.

    Chained aggregation REQUIRES append mode + a watermark (complete
    mode forbids it), and append only emits a window once the watermark
    passes its end — so the bounded replay stages two far-future
    sentinel batches (the run_late_data_accounting trick): sentinel 1's
    batch advances the watermark past every real hour, sentinel 2's
    batch runs with that watermark and flushes the real windows through
    BOTH stateful operators. Sentinel rows are filtered post-sink (an
    in-plan filter would be pushed below the watermark node and defeat
    them); their own never-flushed windows simply never reach the sink.

    At scale: level 1 state is one row per (10-min window, type); level
    2 receives |types| rows per closed 10-min window — the second
    shuffle is negligible by construction. Same append-mode memory-sink
    caveat as every replay harness: test-scale plumbing only.
    """
    from kinesis_log_watcher_spark.sources.files import stage_replay_files

    ensure_session_confs(spark)
    base = normalize_ts_cols(spark.read.parquet(events_path))
    mx = base.groupBy().agg(F.max("ts").alias("mxts"))

    def sentinel(i: int) -> DataFrame:
        cols = []
        for f in base.schema.fields:
            if f.name == "ts":
                cols.append(
                    (F.col("mxts") + F.expr(f"INTERVAL {2 * i} HOURS"))
                    .cast(f.dataType)
                    .alias("ts")
                )
            elif f.name == "event_type":
                cols.append(F.lit("sentinel").cast(f.dataType).alias(f.name))
            elif f.name == "event_id":
                cols.append(F.lit(-2000 - i).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return mx.select(*cols)

    replay = stage_replay_files(
        spark,
        [base, sentinel(1), sentinel(2)],
        prefix="two_level_",
    )
    stream = normalize_ts_cols(
        read_parquet_stream(spark, replay, max_files_per_trigger=1)
    )
    lvl1 = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    lvl2 = (
        lvl1.groupBy(
            F.window(F.window_time("w"), "1 hour").alias("h"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("n").cast("long").alias("total_n"),
            F.max("n").cast("long").alias("max_bucket_n"),
        )
        .select(
            F.col("h.start").alias("hour_start"),
            "event_type",
            "n_buckets",
            "total_n",
            "max_bucket_n",
        )
    )
    name = f"two_level_{next(_counter)}"
    with replay_partitions(spark):
        q = (
            lvl2.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        await_or_raise(q, timeout_s)
    return spark.table(name).filter(F.col("event_type") != "sentinel")
