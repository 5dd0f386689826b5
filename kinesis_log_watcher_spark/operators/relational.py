"""Relational operators (SURVEY.md §2.2 coverage).

All pure DataFrame compositions — Catalyst plans them (broadcast vs
shuffle joins, partial aggregation, AQE skew handling). The helpers here
encode the *shape* decisions that matter at scale:

- dimension joins broadcast explicitly (no shuffle of the fact side),
- top-k is aggregate-style (``limit`` after ``orderBy`` → Spark plans a
  TakeOrderedAndProject: per-partition heap + driver merge, no full sort),
- per-group top-k uses a ranking window (single shuffle on the group key),
- sessionization is the lag/cumsum trick (one shuffle, two window passes
  over the same partitioning — Spark reuses the sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact⋈dim with the dim side broadcast — zero shuffle of the fact.

    At 100 TB the fact side must never move for a dimension join;
    region/nation/supplier-sized dims are KBs→MBs."""
    return fact.join(F.broadcast(dim), on, how)


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k. orderBy+limit → TakeOrderedAndProject (no total sort,
    no single-partition shuffle of everything — each partition keeps a
    k-heap, driver merges k×partitions rows)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, group_by: list[str], order_by: list[Column], k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k within each group via row_number — one shuffle on the group
    key; ties must be broken deterministically by the caller's order_by."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def running_total(
    df: DataFrame, partition_by: list[str], order_by: list[Column], value: Column,
    out_col: str = "running",
) -> DataFrame:
    """Prefix aggregate (rows unbounded-preceding..current). Deterministic
    iff order_by is a total order within each partition."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value).over(w))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Gap-based sessionization: session starts where the gap to the
    previous event exceeds ``gap_seconds``; session_id = running count of
    session starts. Both window passes share one partitioning/sort —
    a single shuffle on the user key."""
    order = [F.col(ts_col), F.col(tiebreak_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = F.col(ts_col).cast("long") - prev_ts.cast("long")
    is_start = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_start).over(run))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_id: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str,
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row (identified by unique ``left_id``),
    the single latest right row with ``right_ts <= left_ts`` on the same
    key (Spark has no native as-of). ``direction='forward'`` flips the
    inequality and ranking: the EARLIEST right row with
    ``right_ts >= left_ts`` (the next-event lookup).

    Shape: equi-join on the key + time inequality, then a per-left-row
    ranking window keeps the newest (oldest, for forward) match (ties
    broken by ``tiebreak`` for determinism). One shuffle on the key. For
    dense per-key history at extreme scale, pre-bucket the right side by
    time range so the inequality join fans out per bucket instead of per
    key-history. Unmatched left rows survive with nulls under
    how='left'."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if direction == "backward":
        cond = right[right_ts] <= left[left_ts]
        order = [F.col(right_ts).desc(), F.col(tiebreak).desc()]
    else:
        cond = right[right_ts] >= left[left_ts]
        order = [F.col(right_ts).asc_nulls_last(), F.col(tiebreak).asc_nulls_last()]
    joined = left.join(
        right, (left[on] == right[on]) & cond, how
    ).drop(right[on])
    w = Window.partitionBy(left_id).orderBy(*order)
    # _rn == 1 alone is correct for matched AND unmatched left rows:
    # an unmatched row (all right cols null under how='left') is its own
    # partition of one, so it ranks 1. An extra isNull(tiebreak) escape
    # would leak duplicate rank>1 rows whenever a matched right row has a
    # NULL tiebreak value.
    return joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for fact⋈fact when one key dominates.

    AQE's skew-join splitting (enabled in session.py) handles most skew
    at runtime; this is the explicit technique for known pathological
    keys, or engines/modes where AQE can't re-plan (streaming joins):

    - the LEFT (skewed) side gets a random salt in [0, salt);
    - the RIGHT side is replicated ``salt`` times (explode);
    - the join key becomes (key, salt) → a hot key's rows spread over
      ``salt`` shuffle partitions instead of one straggler task.

    Cost: right side × salt (keep it the smaller input or a pre-shrunk
    projection). Result equals a plain equi-join row-for-row."""
    salt_l = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    salt_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salt_l.join(salt_r, [key, "_salt"], how)
    return out.drop("_salt")


def set_ops_tagged(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """union / intersect / except of two key sets, tagged in one result
    (distinct keys only). Spark plans these as aggregates/joins."""
    union = a.select(key).union(b.select(key)).distinct().withColumn("op", F.lit("union"))
    inter = a.select(key).intersect(b.select(key)).withColumn("op", F.lit("intersect"))
    # NB: EXCEPT (distinct) semantics — exceptAll would keep a key that
    # appears in both sides whenever `a` holds it with multiplicity > |b|.
    diff = a.select(key).distinct().subtract(b.select(key).distinct()).withColumn(
        "op", F.lit("except")
    )
    return union.unionByName(inter).unionByName(diff)


def pivot_counts(
    df: DataFrame, row_key: Column, pivot_col: str, values: list[str],
    row_key_name: str = "row_key",
) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for distinct
    pivot values on a huge input — that's an extra job)."""
    return (
        df.groupBy(row_key.alias(row_key_name))
        .pivot(pivot_col, values)
        .count()
        .na.fill(0, values)
    )
