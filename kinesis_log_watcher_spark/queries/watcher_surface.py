"""The reference's own operator surface (SURVEY.md §2.1) as oracle-checked
queries over the driver tables.

The driver tables have no Kinesis records, so these queries *synthesize*
the envelope inputs deterministically from `events` (partition keys from
user_id, payload from props) and then run the real engine derivations —
the same Column expressions the watcher path uses — against a DuckDB
re-statement of the reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.envelope import short_host_id
from kinesis_log_watcher_spark.functions.strftime import (
    go_default_render_col,
    strftime_col,
)
from kinesis_log_watcher_spark.queries.base import load, register

# Reconstruct the reference's four documented PartitionKey shapes
# (main.go:249-262; FIXTURES.md §1) from user_id — same expression in SQL.
_PK_SQL = """
    CASE CAST(user_id % 4 AS BIGINT)
      WHEN 0 THEN 'arn:aws:ecs:us-east-1:123456789012:task/task-' || CAST(user_id AS VARCHAR)
      WHEN 1 THEN 'arn:aws:ec2:us-east-1:123456789012:instance/i-' || CAST(user_id AS VARCHAR)
      WHEN 2 THEN 'ip-address:10.0.0.' || CAST(user_id AS VARCHAR)
      ELSE 'uuid:00000000-0000-0000-0000-' || lpad(CAST(user_id AS VARCHAR), 12, '0')
    END
"""


def _partition_key() -> F.Column:
    uid = F.col("user_id").cast("string")
    return (
        F.when(F.col("user_id") % 4 == 0,
               F.concat(F.lit("arn:aws:ecs:us-east-1:123456789012:task/task-"), uid))
        .when(F.col("user_id") % 4 == 1,
              F.concat(F.lit("arn:aws:ec2:us-east-1:123456789012:instance/i-"), uid))
        .when(F.col("user_id") % 4 == 2,
              F.concat(F.lit("ip-address:10.0.0."), uid))
        .otherwise(
            F.concat(F.lit("uuid:00000000-0000-0000-0000-"),
                     F.lpad(uid, 12, "0")))
    )


@register(
    "shorthost_derivation",
    f"""
    SELECT host_id,
           regexp_replace(
             list_extract(string_split(host_id, ':'), -1),
             '^(task/|instance/)', '') AS short_host_id,
           COUNT(*) AS n
    FROM (SELECT {_PK_SQL} AS host_id FROM events)
    GROUP BY host_id
    """,
    doc="X1+X2 (main.go:252-262): split/take-last + conditional prefix "
    "strip — the engine's actual short_host_id() expression vs a SQL "
    "restatement of the reference's Go code.",
)
def shorthost_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(_partition_key().alias("host_id"))
    return ev.groupBy("host_id").agg(F.count("*").alias("n")).select(
        "host_id",
        short_host_id(F.col("host_id")).alias("short_host_id"),
        "n",
    )


@register(
    "strftime_render",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS micros,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_s,
           strftime(ts, '%H') || 'h' AS hour_label
    FROM events
    WHERE event_id < 500
    """,
    doc="X6 (main.go:400-416): the engine's strftime→date_format "
    "translation vs DuckDB's native strftime, incl. %f and %s.",
)
def strftime_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        strftime_col("%Y-%m-%dT%H:%M:%S", ts).alias("iso"),
        strftime_col("%Y-%m-%d %H:%M:%S.%f", ts).alias("micros"),
        strftime_col("%s", ts).cast("long").alias("unix_s"),
        strftime_col("%Hh", ts).alias("hour_label"),
    )


@register(
    "template_render_line",
    f"""
    SELECT event_id,
           regexp_replace(
             list_extract(string_split({_PK_SQL}, ':'), -1),
             '^(task/|instance/)', '')
           || ' ' ||
           strftime(ts, '%Y-%m-%d %H:%M:%S')
           || CASE WHEN regexp_replace(strftime(ts, '.%f'), '0+$', '') = '.'
                   THEN '' ELSE regexp_replace(strftime(ts, '.%f'), '0+$', '') END
           || ' +0000 UTC ' || props AS line
    FROM events
    """,
    doc="T1 (main.go:65, 281-289): the default template "
    "'{{.ShortHostId}} {{.Timestamp}} {{.LogEntry}}' rendered by the real "
    "template compiler vs a SQL restatement (incl. Go's trailing-zero "
    "fraction trimming).",
)
def template_render_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Build the envelope from events, then use the engine's own
    # template-compiled columns.
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").alias("Timestamp"),
        _partition_key().alias("HostId"),
        F.col("props").alias("LogEntry"),
    )
    line = F.concat(
        short_host_id(F.col("HostId")),
        F.lit(" "),
        go_default_render_col(F.col("Timestamp")),
        F.lit(" "),
        F.col("LogEntry"),
    )
    return ev.select("event_id", line.alias("line"))


@register(
    "template_conditional_render",
    f"""
    SELECT event_id,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE) < 50
                THEN 'low' ELSE 'high' END
           || ' ' ||
           printf('k=%03d', CAST(json_extract_string(props, '$.k') AS BIGINT))
           || ' ' ||
           regexp_replace(
             list_extract(string_split({_PK_SQL}, ':'), -1),
             '^(task/|instance/)', '') AS line
    FROM events
    WHERE event_id % 7 <> 0
    """,
    doc="T1 control flow (main.go:109 parses the FULL text/template "
    "dialect): {{if lt …}}/{{else}}, a printf pipeline, and error-drop — "
    "rows whose payload is made unparseable (event_id%7=0) vanish, Go's "
    "render-error semantics (main.go:283-287). Compiled entirely to "
    "CASE WHEN / format_string Columns, zero Python per row.",
)
def template_conditional_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_log_watcher_spark.template import compile_template

    tpl = (
        '{{if lt .Log.k 50}}low{{else}}high{{end}} '
        '{{printf "k=%03d" .Log.k}} {{.ShortHostId}}'
    )
    compiled = compile_template(tpl)
    ev = load(spark, sf_dir, "events")
    env = ev.select(
        "event_id",
        F.col("ts").alias("Timestamp"),
        _partition_key().alias("HostId"),
        short_host_id(_partition_key()).alias("ShortHostId"),
        # poison ~1/7 of payloads to exercise the render-error drop path
        F.when(F.col("event_id") % 7 == 0, F.lit("not json"))
        .otherwise(F.col("props"))
        .alias("LogEntry"),
    )
    return compiled.apply(env, keep=("event_id",))


@register(
    "template_vars_render",
    """
    SELECT event_id,
           CASE WHEN event_id % 7 <> 0
                THEN 'u=u' || CAST(user_id % 100 AS VARCHAR)
                ELSE 'anon'
           END
           || '[' || CAST(event_id % 9 AS VARCHAR) || ']'
           || '{' || CAST(event_id % 9 AS VARCHAR) || '}' AS line
    FROM events
    """,
    doc="T1 general variables + named sub-templates (main.go:109 parses "
    "the FULL text/template dialect): {{$x := P}} declaration used "
    "across branches, an {{if $x}} test on the variable, and a "
    "{{define}}/{{template}} pair invoked twice with dot rebound to the "
    "argument — all inlined at compile time into one CASE WHEN / concat "
    "projection, zero Python per row. The payload is synthesized from "
    "event fields so DuckDB restates the render as string concatenation.",
)
def template_vars_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_log_watcher_spark.template import compile_template

    tpl = (
        '{{define "tag"}}[{{.}}]{{end}}'
        '{{define "brace"}}{{"{"}}{{.}}{{"}"}}{{end}}'
        "{{$u := .Log.user}}{{$lvl := .Log.lvl}}"
        "{{if $u}}u={{$u}}{{else}}anon{{end}}"
        '{{template "tag" $lvl}}{{template "brace" $lvl}}'
    )
    compiled = compile_template(tpl)
    ev = load(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 7 == 0,
        F.format_string('{"lvl": %d}', F.col("event_id") % 9),
    ).otherwise(
        F.format_string(
            '{"user": "u%d", "lvl": %d}',
            F.col("user_id") % 100,
            F.col("event_id") % 9,
        )
    )
    env = ev.select("event_id", payload.alias("LogEntry"))
    return compiled.apply(env, keep=("event_id",))


@register(
    "template_range_render",
    """
    SELECT event_id,
           CASE WHEN event_id % 10 = 0 THEN 'none'
                ELSE '<' || CAST(event_id % 5 AS VARCHAR) || '><'
                     || CAST(event_id % 97 AS VARCHAR) || '>'
           END
           || '|' || CAST(user_id % 7 AS VARCHAR) || ','
           || CAST(event_id % 3 AS VARCHAR) || ',' AS line
    FROM events
    """,
    doc="T1 {{range}} (main.go:109: the reference parses the full "
    "text/template dialect): array iteration with an {{else}} empty "
    "branch, and object iteration in Go's sorted-key order — compiled to "
    "transform/array_join higher-order functions (one line per row, no "
    "row fan-out, no Python). The payload is synthesized from event "
    "fields so DuckDB can restate the render as string concatenation.",
)
def template_range_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_log_watcher_spark.template import compile_template

    tpl = (
        "{{range .Log.xs}}<{{.}}>{{else}}none{{end}}"
        "|{{range .Log.m}}{{.}},{{end}}"
    )
    compiled = compile_template(tpl)
    ev = load(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 10 == 0,
        F.format_string(
            '{"xs": [], "m": {"b": %d, "a": %d}}',
            F.col("event_id") % 3,
            F.col("user_id") % 7,
        ),
    ).otherwise(
        F.format_string(
            '{"xs": [%d, %d], "m": {"b": %d, "a": %d}}',
            F.col("event_id") % 5,
            F.col("event_id") % 97,
            F.col("event_id") % 3,
            F.col("user_id") % 7,
        )
    )
    env = ev.select("event_id", payload.alias("LogEntry"))
    # apply() hoists the two range-collection parses into prep columns
    # (parsed once per row, not once per HOF reference site).
    return compiled.apply(env, keep=("event_id",))


@register(
    "lenient_json_classify",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN json_valid(props)
                          AND json_type(json(props)) = 'OBJECT'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_object,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k
    FROM events
    GROUP BY event_type
    """,
    doc="X4 (main.go:273-279): lenient JSON parse classification — "
    "object vs not, field present vs not; null on failure, never error.",
)
def lenient_json_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    is_obj = F.json_object_keys(F.col("props")).isNotNull()
    has_k = F.get_json_object(F.col("props"), "$.k").isNotNull()
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(is_obj, 1).otherwise(0)).alias("n_object"),
        F.sum(F.when(has_k, 1).otherwise(0)).alias("n_with_k"),
    )


@register(
    "golayout_render",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS rfc3339,
           strftime(ts, '%d %b %Y') AS date_layout,
           strftime(ts, '%-I:%M:%S %p') AS kitchen_s
    FROM events
    WHERE event_id < 500
    """,
    doc="X7 (README.md:21-23): Go reference-time layouts "
    "({{.Timestamp.Format ...}}) via the layout→JVM-pattern translator "
    "vs DuckDB strftime equivalents. RFC3339's Z07:00 renders 'Z' in "
    "the UTC session.",
)
def golayout_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_log_watcher_spark.functions.strftime import go_layout_col

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    ts = F.col("ts")
    return ev.select(
        "event_id",
        go_layout_col("2006-01-02T15:04:05Z07:00", ts).alias("rfc3339"),
        go_layout_col("02 Jan 2006", ts).alias("date_layout"),
        go_layout_col("3:04:05 PM", ts).alias("kitchen_s"),
    )


@register(
    "template_mutation_render",
    r"""
    SELECT event_id,
           CASE WHEN event_id % 10 = 0 THEN ''
                ELSE '<' || CAST(event_id % 5 AS VARCHAR) || '><'
                     || CAST(event_id % 97 AS VARCHAR) || '>'
           END
           || '|' ||
           CASE WHEN event_id % 7 <> 0 THEN 'q\"x' ELSE 'n' END AS line
    FROM events
    """,
    doc="T1 cross-scope {{$x = P}} mutation (main.go:109 parses the full "
    "text/template dialect incl. assignment): a range body folds an "
    "accumulator ({{$s = printf \"%s<%s>\" $s .}} — compiled to ONE "
    "F.aggregate whose accumulator struct carries the binding), and an "
    "if-branch reassigns a second variable through the js escaper "
    "(binding escapes the block as a CASE-joined value). DuckDB "
    "restates the render as string concatenation; the escaped literal "
    "pins Go's JSEscapeString byte output.",
)
def template_mutation_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_log_watcher_spark.template import compile_template

    tpl = (
        '{{$s := ""}}{{range .Log.xs}}{{$s = printf "%s<%s>" $s .}}{{end}}'
        '{{$t := "n"}}{{if .Log.u}}{{$t = js .Log.u}}{{end}}'
        "{{$s}}|{{$t}}"
    )
    compiled = compile_template(tpl)
    # spread=True: the range-loop + js-escape render map side measured
    # 2.5 -> 1.1s at sf0.1 (A/B r12).
    ev = load(spark, sf_dir, "events", spread=True)
    e = F.col("event_id")
    xs_part = F.when(e % 10 == 0, F.lit('"xs": []')).otherwise(
        F.format_string('"xs": [%d, %d]', e % 5, e % 97)
    )
    u_part = F.when(e % 7 == 0, F.lit("")).otherwise(
        F.lit(', "u": "q\\"x"')
    )
    payload = F.concat(F.lit("{"), xs_part, u_part, F.lit("}"))
    env = ev.select("event_id", payload.alias("LogEntry"))
    return compiled.apply(env, keep=("event_id",))
