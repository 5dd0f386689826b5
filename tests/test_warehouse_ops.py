"""Behavior pins for the warehouse-governance queries (queries/warehouse.py).

The oracle gate proves value equality with DuckDB; these tests pin the
semantic invariants that make the operators trustworthy as governance
tools — invariants a value hash alone wouldn't explain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_log_watcher_spark.queries.base import load, registry

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry()[name].fn


class TestScd2History:
    def test_one_current_row_per_customer(self, spark):
        out = _q("customer_scd2_history")(spark, SF).toPandas()
        seg_counts = (
            load(spark, SF, "customer")
            .groupBy("c_mktsegment")
            .count()
            .toPandas()
            .set_index("c_mktsegment")["count"]
        )
        got = out.set_index("c_mktsegment")["n_current"]
        for seg, n in seg_counts.items():
            assert got[seg] == n, f"segment {seg}: expected one current row per key"

    def test_closed_spans_are_exactly_one_version_period(self, spark):
        # versions are emitted every 7 days, so every CLOSED history row
        # spans exactly 7 days — the SCD2 ranges tile with no gap/overlap.
        out = _q("customer_scd2_history")(spark, SF).toPandas()
        closed = out["history_rows"] - out["n_current"]
        assert (out["closed_span_days"] == 7 * closed).all()


class TestPointInTimeJoin:
    def test_at_most_one_version_matches_each_fact(self, spark):
        # per-key effective ranges tile disjointly, so the temporal join
        # preserves fact multiplicity: exactly the facts on/after their
        # key's first version day match, each exactly once. The expected
        # count comes from the closed form, independent of the join.
        out = _q("orders_pointintime_scd2")(spark, SF).toPandas()
        orders = load(spark, SF, "orders")
        expected = orders.filter(
            (F.col("o_orderkey") % 21) >= (F.col("o_custkey") % 5)
        ).count()
        assert out["n_orders"].sum() == expected
        assert out["n_orders"].sum() <= orders.count()

    def test_no_broadcast_nested_loop(self, spark):
        plan = (
            _q("orders_pointintime_scd2")(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestExpectationAudit:
    def test_check_suite_shape_and_bounds(self, spark):
        out = _q("orders_expectation_audit")(spark, SF).toPandas()
        expected = {
            "null_custkey",
            "nonpositive_price",
            "invalid_status",
            "invalid_priority",
            "stale_order_date",
            "duplicate_orderkey",
            "orphan_custkey",
        }
        assert set(out["check_name"]) == expected
        n_orders = load(spark, SF, "orders").count()
        assert (out["n_rows"] == n_orders).all()
        assert ((out["violations"] >= 0) & (out["violations"] <= n_orders)).all()

    def test_clean_load_passes_integrity_checks(self, spark):
        # the generated data is referentially intact with unique keys —
        # those checks must report zero, while the freshness check is
        # deliberately tight and must fire.
        out = (
            _q("orders_expectation_audit")(spark, SF)
            .toPandas()
            .set_index("check_name")["violations"]
        )
        assert out["duplicate_orderkey"] == 0
        assert out["orphan_custkey"] == 0
        assert out["null_custkey"] == 0
        assert out["stale_order_date"] > 0

    def test_single_fact_scan(self, spark):
        # the whole suite is one pass over orders: exactly one orders
        # file scan in the plan (plus one over the customer key dim).
        plan = (
            _q("orders_expectation_audit")(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("orders.parquet") == 1


class TestDailyMetrics:
    def test_rolling_actives_match_direct_window_count(self, spark):
        # cross-check three window-end days against the direct
        # definition: distinct users with an event in [d-6, d].
        out = (
            _q("rolling_active_users")(spark, SF)
            .toPandas()
            .set_index("day")["active_users"]
        )
        ud = (
            load(spark, SF, "events")
            .select("user_id", F.expr("unix_micros(ts) div 86400000000").alias("day"))
            .distinct()
            .toPandas()
        )
        days = sorted(ud["day"].unique())
        for d in (days[0], days[len(days) // 2], days[-1]):
            direct = ud[(ud["day"] >= d - 6) & (ud["day"] <= d)]["user_id"].nunique()
            assert out[d] == direct, f"day {d}"

    def test_growth_accumulates_to_total_distinct_users(self, spark):
        out = _q("user_growth_accumulation")(spark, SF).toPandas().sort_values("day")
        assert (out["cum_users"] == out["new_users"].cumsum()).all()
        total = load(spark, SF, "events").select("user_id").distinct().count()
        assert out["cum_users"].iloc[-1] == total


class TestPhraseSearch:
    def test_matches_direct_adjacent_pair_count(self, spark):
        out = (
            _q("phrase_search_inverted")(spark, SF)
            .toPandas()
            .set_index("phrase")
        )
        texts = load(spark, SF, "documents").select("doc_id", "text").toPandas()
        for w1, w2 in (("table", "hash"), ("merge", "group"), ("slow", "key")):
            occ = docs = 0
            for t in texts["text"]:
                toks = t.split(" ")
                c = sum(
                    1
                    for i in range(len(toks) - 1)
                    if toks[i] == w1 and toks[i + 1] == w2
                )
                occ += c
                docs += 1 if c else 0
            key = f"{w1} {w2}"
            if occ == 0:
                assert key not in out.index
            else:
                assert out.loc[key, "n_occurrences"] == occ
                assert out.loc[key, "n_docs"] == docs

    def test_no_cartesian_in_positional_join(self, spark):
        plan = (
            _q("phrase_search_inverted")(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestGroupwiseLinearFit:
    def test_matches_numpy_least_squares(self, spark):
        import numpy as np

        out = (
            _q("groupwise_linear_fit")(spark, SF)
            .toPandas()
            .set_index("l_returnflag")
        )
        li = load(spark, SF, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        ).toPandas()
        for flag, grp in li.groupby("l_returnflag"):
            slope, intercept = np.polyfit(
                grp["l_quantity"], grp["l_extendedprice"], 1
            )
            assert abs(out.loc[flag, "slope_q6"] / 1e6 - slope) < 1e-3
            assert abs(out.loc[flag, "intercept_q6"] / 1e6 - intercept) < 1e-2


class TestCmsJoinSize:
    def test_estimate_upper_bounds_exact_and_grid_is_bounded(self, spark):
        out = _q("cms_join_size_estimate")(spark, SF).toPandas()
        assert len(out) == 1
        # CMS collisions only ADD cross terms: est >= exact, always.
        assert out["est_join_size"][0] >= out["exact_join_size"][0]
        # the sketches the estimate reads are bounded-row regardless of
        # input volume (depth x width), the property that makes the
        # estimator free at 100 TB.
        from kinesis_log_watcher_spark.operators.sketch import cms_build
        from pyspark.sql import functions as SF_

        ev = load(spark, SF, "events").filter(SF_.col("event_type") == "click")
        assert cms_build(ev.select("user_id"), "user_id").count() <= 4 * 64

    def test_disjoint_and_empty_inputs_estimate_zero(self, spark):
        """Zero-overlap semantics: grids whose cells never collide must
        estimate 0 (a cell present only in A contributes ca*0), and an
        empty sketch estimates 0 — never NULL, never a min taken over
        only the colliding rows (which inflates past the classical
        estimator)."""
        from kinesis_log_watcher_spark.operators.sketch import (
            cms_build,
            cms_join_size,
        )

        # width 4096 makes md5-bucket collisions between the two small
        # disjoint key sets overwhelmingly unlikely in all 4 rows; if a
        # freak collision made this flaky the keys are fixed, so it is
        # deterministic either way — and it passes today.
        a = cms_build(
            spark.range(0, 8).selectExpr("id AS k"), "k", depth=4, width=4096
        )
        b = cms_build(
            spark.range(100000, 100008).selectExpr("id AS k"),
            "k",
            depth=4,
            width=4096,
        )
        [row] = cms_join_size(a, b).collect()
        assert row.est_join_size == 0

        empty = cms_build(
            spark.range(0).selectExpr("id AS k"), "k", depth=4, width=4096
        )
        [row] = cms_join_size(a, empty).collect()
        assert row.est_join_size == 0
        [row] = cms_join_size(empty, a).collect()
        assert row.est_join_size == 0


class TestSeasonalityHotspots:
    def test_full_weekly_cycle_and_conservation(self, spark):
        out = _q("events_seasonality_hotspots")(spark, SF).toPandas()
        # only slots with at least one non-empty hour bucket appear (the
        # rollup never fabricates empty groups); sf0.001 is sparse
        # enough to leave a slot empty, so pin containment + bounds.
        assert len(out) <= 168
        assert set(out["slot"]) <= set(range(168))
        events = load(spark, SF, "events")
        assert out["slot_total"].sum() == events.count()
        n_buckets = events.select(
            F.expr("unix_micros(ts) div 3600000000").alias("b")
        ).distinct().count()
        assert out["n_buckets"].sum() == n_buckets
        assert (out["n_hot_buckets"] <= out["n_buckets"]).all()
