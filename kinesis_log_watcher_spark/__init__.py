"""kinesis_log_watcher_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference CLI ``dacut/kinesis-log-watcher`` (a Kinesis stream tailer
that renders each record through a Go text template — see
``/root/reference/main.go``), built Spark-first:

- the record envelope (reference main.go:264-279) is a ``StructType`` and a
  set of declarative Column derivations (``envelope``),
- the Go-template "query language" (reference README.md:13-24) compiles to a
  Catalyst Column expression tree (``template``),
- the strftime/Go-layout timestamp formatting (reference main.go:400-416)
  translates to JVM ``date_format`` patterns (``functions.strftime``),
- the per-shard streaming runtime (reference main.go:295-396) is Structured
  Streaming: triggers, checkpoints, graceful stop (``streaming``),
- plus the full relational surface and LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal) the reference lacks
  (``operators``), all designed to scale to very large data.

No code is copied from the reference; it is a native Go binary and this is a
declarative Spark library. Reference citations in docstrings are for
behavior parity only.
"""

from kinesis_log_watcher_spark.session import get_spark
from kinesis_log_watcher_spark.envelope import ENVELOPE_FIELDS, with_envelope
from kinesis_log_watcher_spark.template import compile_template
from kinesis_log_watcher_spark.watcher import watch

__all__ = [
    "get_spark",
    "ENVELOPE_FIELDS",
    "with_envelope",
    "compile_template",
    "watch",
]

__version__ = "0.1.0"
