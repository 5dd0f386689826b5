"""Plan-audit registration gate.

The full-registry physical-plan audit (tools/plan_audit.py) runs out of
band (it compiles all 300+ plans); what the SUITE must guarantee is that
no query can be REGISTERED past it: every registry entry absent from the
manifest of the last clean full audit is audited here, so a post-audit
addition that plans an unlisted BroadcastNestedLoopJoin / CartesianProduct
/ row-at-a-time Python node fails the suite immediately (the r7
``association_rules_lift`` whitelist miss, made structurally impossible).
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_spec = importlib.util.spec_from_file_location(
    "plan_audit",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "plan_audit.py"),
)
plan_audit = importlib.util.module_from_spec(_spec)
sys.modules["plan_audit"] = plan_audit
_spec.loader.exec_module(plan_audit)


def test_manifest_exists_and_covers_most_of_registry():
    """A missing/stale manifest would silently shrink the gate to
    nothing; require it to exist and cover the bulk of the registry
    (new additions since the last full audit are audited below)."""
    from kinesis_log_watcher_spark.queries import registry

    manifest = plan_audit.load_manifest()
    assert manifest, (
        "tools/plan_audit_manifest.json missing — run "
        "`python tools/plan_audit.py` for a clean full audit"
    )
    names = set(registry()) - plan_audit.STREAMING
    assert len(manifest & names) >= 0.9 * len(names), (
        "manifest stale: most of the registry is unaudited — rerun "
        "the full audit"
    )
    # a manifest naming queries that no longer exist is also stale
    assert not (manifest - names), sorted(manifest - names)


def test_queries_added_since_last_full_audit_plan_clean(spark, sf_dir):
    """Audit exactly the registry entries the last full audit never
    saw. Empty delta → trivially green; a new query with an unlisted
    BNLJ/cartesian/BatchEvalPython fails HERE, in-suite."""
    from kinesis_log_watcher_spark.queries import registry

    manifest = plan_audit.load_manifest()
    delta = [
        (name, q)
        for name, q in registry().items()
        if name not in manifest and name not in plan_audit.STREAMING
    ]
    flagged = {}
    for name, q in delta:
        hard, _soft = plan_audit.audit_one(spark, name, q.fn, sf_dir)
        if hard:
            flagged[name] = hard
    assert not flagged, (
        f"unaudited queries trip hard plan flags: {flagged} — fix the "
        "plan or (for a bounded build side) add an ALLOWED_BNLJ entry, "
        "then rerun the full audit"
    )


def test_unlisted_bnlj_is_flagged(spark):
    """The gate must actually fire: a deliberate keyless broadcast join
    under a name with no ALLOWED_BNLJ entry trips a hard flag, and the
    same plan under a whitelisted name is downgraded to a note."""
    from pyspark.sql import functions as F

    def bad(spark_, _sf):
        big = spark_.range(100)
        tiny = spark_.range(3).select(F.col("id").alias("rid"))
        return big.crossJoin(F.broadcast(tiny))

    hard, _ = plan_audit.audit_one(spark, "not_whitelisted_bnlj", bad, "")
    assert "BroadcastNestedLoopJoin" in hard

    listed = next(iter(plan_audit.ALLOWED_BNLJ))
    hard, soft = plan_audit.audit_one(spark, listed, bad, "")
    assert not hard and any("BNLJ (allowed" in s for s in soft)


def test_association_rules_lift_whitelisted():
    """The specific r7 miss: the 1-row basket-count broadcast is now a
    documented ALLOWED_BNLJ entry."""
    assert "association_rules_lift" in plan_audit.ALLOWED_BNLJ
