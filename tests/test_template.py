"""Template compiler tests — the reference dialect (README.md:13-24)."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from kinesis_log_watcher_spark.envelope import RAW_KINESIS_SCHEMA, with_envelope
from kinesis_log_watcher_spark.template import (
    DEFAULT_TEMPLATE,
    NO_VALUE,
    TemplateError,
    compile_template,
)


def _env(spark, payload: bytes, pk="uuid:abc", ts=datetime(2024, 5, 1, 12, 0, 0, 123456)):
    raw = spark.createDataFrame(
        [("s", "shardId-0", "0001", ts, pk, bytearray(payload))], RAW_KINESIS_SCHEMA
    )
    return with_envelope(raw)


def _render(spark, template, payload, **kw):
    compiled = compile_template(template)
    rows = compiled.apply(_env(spark, payload, **kw)).collect()
    return [r["line"] for r in rows]


def test_default_template(spark):
    """main.go:65: '{{.ShortHostId}} {{.Timestamp}} {{.LogEntry}}'."""
    [line] = _render(spark, DEFAULT_TEMPLATE, b"hello world")
    assert line == "abc 2024-05-01 12:00:00.123456 +0000 UTC hello world"


def test_field_access_and_aliases(spark):
    [line] = _render(spark, "{{.HostId}}|{{.HostID}}|{{.SequenceNumber}}", b"x")
    assert line == "uuid:abc|uuid:abc|0001"


def test_unknown_field_renders_no_value(spark):
    [line] = _render(spark, "[{{.Nope}}]", b"x")
    assert line == f"[{NO_VALUE}]"


def test_log_field_access(spark):
    payload = json.dumps({"FieldName": "v1", "n": 42, "f": 1.5, "b": True}).encode()
    [line] = _render(
        spark, "{{.Log.FieldName}} {{.Log.n}} {{.Log.f}} {{.Log.b}}", payload
    )
    assert line == "v1 42 1.5 true"


def test_log_missing_key_renders_no_value(spark):
    [line] = _render(spark, "[{{.Log.missing}}]", b'{"a": 1}')
    assert line == f"[{NO_VALUE}]"


def test_log_null_value_renders_no_value(spark):
    [line] = _render(spark, "[{{.Log.a}}]", b'{"a": null}')
    assert line == f"[{NO_VALUE}]"


def test_log_nested_access(spark):
    [line] = _render(spark, "{{.Log.nested.code}}", b'{"nested": {"code": 7}}')
    assert line == "7"


def test_log_on_unparseable_payload_drops_row(spark):
    """main.go:276-287: Log=nil → template error → row dropped."""
    assert _render(spark, "{{.Log.a}}", b"not json") == []
    assert _render(spark, "{{.Log.a}}", b"") == []


def test_log_on_non_object_payload_drops_row(spark):
    assert _render(spark, "{{.Log.a}}", b"[1,2]") == []
    assert _render(spark, "{{.Log.a}}", b"42") == []


def test_log_nested_through_non_object_drops_row(spark):
    assert _render(spark, "{{.Log.a.b}}", b'{"a": 5}') == []
    assert _render(spark, "{{.Log.a.b}}", b'{"x": 1}') == []


def test_row_without_log_access_survives_bad_json(spark):
    """Rows only die when the template actually touches .Log."""
    assert _render(spark, "{{.ShortHostId}}", b"not json") == ["abc"]


def test_strftime_call(spark):
    [line] = _render(spark, '{{strftime "%Y-%m-%dT%H:%M:%S" .Timestamp}}', b"x")
    assert line == "2024-05-01T12:00:00"


def test_strftime_extensions(spark):
    """%f µs, %L ms, %s unix secs (main.go:406)."""
    [line] = _render(spark, '{{strftime "%f|%L|%s" .Timestamp}}', b"x")
    assert line == "123456|123|1714564800"


def test_strftime_invalid_falls_back_rfc3339(spark):
    """main.go:411-415: bad format → RFC3339Nano for every row."""
    with pytest.warns(UserWarning):
        [line] = _render(spark, '{{strftime "%Q" .Timestamp}}', b"x")
    assert line == "2024-05-01T12:00:00.123456Z"


def test_go_layout_format(spark):
    [line] = _render(
        spark, '{{.Timestamp.Format "2006-01-02T15:04:05Z07:00"}}', b"x"
    )
    assert line == "2024-05-01T12:00:00Z"


def test_go_layout_trimmed_fraction(spark):
    [line] = _render(
        spark,
        '{{.Timestamp.Format "15:04:05.999999"}}',
        b"x",
        ts=datetime(2024, 5, 1, 12, 0, 0, 120000),
    )
    assert line == "12:00:00.12"


def test_whole_log_renders_json_or_no_value(spark):
    assert _render(spark, "{{.Log}}", b'{"a":1}') == ['{"a":1}']
    assert _render(spark, "{{.Log}}", b"nope") == [NO_VALUE]


def test_unsupported_action_raises(spark):
    # invoking a template that was never {{define}}d is a parse-time
    # error (define/template/block themselves compile — see
    # test_template_control.py)
    with pytest.raises(TemplateError):
        compile_template('{{template "sub" .}}')


def test_unclosed_action_raises(spark):
    """Go's parser errors on unclosed actions (main.go:110-114 exit-2)."""
    with pytest.raises(TemplateError):
        compile_template("{{.Nope")
    with pytest.raises(TemplateError):
        compile_template("{{.HostId}} and {{.Tail")


def test_compile_is_pure_columns_no_python_in_plan(spark):
    """The render must be codegen-able: no BatchEvalPython/ArrowEval."""
    compiled = compile_template(DEFAULT_TEMPLATE)
    df = compiled.apply(_env(spark, b"x"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_trim_markers(spark):
    """{{- and -}} trim adjacent whitespace (Go text/template)."""
    env = _env(spark, b"x")
    got = (
        compile_template("  {{- .HostId -}}   end")
        .apply(env)
        .collect()[0]["line"]
    )
    host = env.collect()[0]["HostId"]
    assert got == f"{host}end"
