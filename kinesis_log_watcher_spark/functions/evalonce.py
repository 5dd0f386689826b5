"""Evaluate-once pinning for expensive expressions.

Catalyst has no common-subexpression elimination for interpreted
(CodegenFallback) expressions — higher-order functions, ``from_json``
chains — and three optimizer rules conspire to duplicate any expression
you try to hoist into a named column: ColumnPruning drops helper
columns nothing references, CollapseProject merges the then-trivial
projection upward, and PushDownPredicates substitutes column aliases
into filter conditions. The net effect: a column computed once per row
on paper is evaluated once per *reference site* in the physical plan
(measured 2× on the template render path, see
template.CompiledTemplate._gate history).

``gate(col)`` wraps an expression in a condition Catalyst treats as
non-deterministic but cannot fold: ``monotonically_increasing_id() >= 0``
is always true, but the id is non-deterministic, so no rule simplifies
it, collapses through it, or substitutes it into a predicate. A
``rand()``-based gate does NOT work — the optimizer constant-folds
``rand()`` comparisons against out-of-range constants.

Use on a projection column that (a) is expensive (JSON parse, HOF
fold), and (b) is referenced more than once downstream (filter + select,
or several derived columns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def gate(c: Column) -> Column:
    """Pin ``c`` to evaluate exactly once per row when aliased in a
    projection (see module docstring). Batch plans only —
    monotonically_increasing_id is rejected by the streaming analyzer;
    use ``gate_streaming`` there."""
    return F.when(F.monotonically_increasing_id() >= 0, c)


def gate_streaming(c: Column) -> Column:
    """Streaming-safe evaluate-once pin: ``shuffle`` of a one-element
    array is non-deterministic to Catalyst (so nothing folds, collapses,
    or substitutes through it) but semantically the identity, and it is
    allowed in streaming plans. Slightly more per-row overhead than
    ``gate`` (one single-element array allocation)."""
    return F.shuffle(F.array(c))[0]
