"""Go-text/template (the reference's query language) → Column compiler.

The reference's only user-facing query surface is a Go text/template
applied per record (reference main.go:103-114 compile, 281-289 execute;
README.md:13-24 documents the dialect). Documented constructs:

- ``{{.Field}}`` — envelope field access (README.md:15-19)
- ``{{.Log.FieldName}}`` — nested access into the dynamic JSON payload
  (README.md:19)
- ``{{.Timestamp.Format "<go layout>"}}`` — method call (README.md:21-23)
- ``{{strftime "<fmt>" .Timestamp}}`` — function call (README.md:24,
  main.go:106)

This compiler turns a template into ONE string Column (the rendered line)
plus ONE boolean Column (the render-error condition). That reproduces the
reference's execution semantics declaratively:

- render error → the row is dropped from output and the stream continues;
  the first error is reported once (main.go:283-289) — see
  ``CompiledTemplate.apply`` and watcher.py.
- unparseable payload → ``Log`` is nil (main.go:276-279); any
  ``{{.Log.x}}`` then errors → row dropped.
- a *missing* key on a parsed JSON object renders Go's ``<no value>``
  placeholder (Go map semantics), not an error.
- an unknown top-level field likewise renders ``<no value>`` (the
  reference's row is a ``map[string]interface{}``, main.go:264).

Everything is built-ins (``concat``, ``get_json_object``,
``json_object_keys``, ``date_format``): the whole render is a codegen'd
narrow projection — no Python in the per-row path, no shuffle, linear
scale-out with input partitions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_log_watcher_spark.envelope import ENVELOPE_ALIASES, ENVELOPE_FIELDS
from kinesis_log_watcher_spark.functions.strftime import (
    go_default_render_col,
    go_layout_col,
    strftime_or_fallback,
)

# The reference's default template (main.go:65).
DEFAULT_TEMPLATE = "{{.ShortHostId}} {{.Timestamp}} {{.LogEntry}}"

NO_VALUE = "<no value>"  # Go text/template placeholder for missing values


class TemplateError(ValueError):
    """Template failed to compile (reference exits with code 2, main.go:110-114)."""


_ACTION_RE = re.compile(r"\{\{-?\s*(.*?)\s*-?\}\}", re.DOTALL)
_TRIM_LEFT = re.compile(r"\{\{-")
_TRIM_RIGHT = re.compile(r"-\}\}")

_FIELD_PATH_RE = re.compile(r"^\.(\w+(?:\.\w+)*)$")
_FORMAT_CALL_RE = re.compile(r'^\.(\w+)\.Format\s+"((?:[^"\\]|\\.)*)"$')
_STRFTIME_CALL_RE = re.compile(r'^strftime\s+"((?:[^"\\]|\\.)*)"\s+\.(\w+(?:\.\w+)*)$')


def _unescape(s: str) -> str:
    return s.encode().decode("unicode_escape")


def _canonical(name: str) -> str | None:
    """Resolve an envelope field name incl. the reference's alias pairs
    (HostID/HostId etc., main.go:266-269). None if not an envelope field."""
    if name in ENVELOPE_FIELDS:
        return name
    if name in ENVELOPE_ALIASES:
        return ENVELOPE_ALIASES[name]
    return None


@dataclass
class CompiledTemplate:
    """A template compiled to (rendered line, render-error condition)."""

    line: Column
    error: Column
    source: str

    def apply(self, df: DataFrame, out_col: str = "line") -> DataFrame:
        """Render against an envelope DataFrame, dropping error rows
        (reference E1 semantics: bad rows vanish from output,
        main.go:283-287)."""
        return df.filter(~self.error).select(self.line.alias(out_col))

    def apply_with_errors(self, df: DataFrame, out_col: str = "line") -> DataFrame:
        """Keep all rows; adds a boolean ``_render_error`` column. Used by
        the sink to implement report-first-error-once (main.go:283-286)."""
        return df.select(
            self.line.alias(out_col), self.error.alias("_render_error")
        )


def _json_path(parts: list[str]) -> str:
    return "$." + ".".join(parts)


def _compile_log_access(parts: list[str]) -> tuple[Column, Column]:
    """Access ``{{.Log.p1.p2…}}`` into the dynamic JSON payload.

    Returns (value segment, error condition). Faithful Go semantics
    (main.go:273-279 + text/template map rules):
    - payload not a JSON object (incl. unparseable) → render error
    - any intermediate path element missing or non-object → render error
    - leaf missing or JSON null → ``<no value>``
    - leaf scalar → raw text (numbers/bools as JSON text, strings unquoted
      — ``get_json_object`` matches this)
    - leaf object/array → its JSON text (divergence: Go prints Go-syntax
      ``map[…]``; we print JSON — documented, not load-bearing)
    """
    entry = F.col("LogEntry")
    # Log itself must be an object or access errors (nil / non-object).
    error = F.json_object_keys(entry).isNull()
    for i in range(1, len(parts)):
        inter = F.get_json_object(entry, _json_path(parts[:i]))
        error = error | F.json_object_keys(inter).isNull()
    leaf = F.get_json_object(entry, _json_path(parts))
    value = F.coalesce(leaf, F.lit(NO_VALUE))
    return value, error


def _compile_log_access_variant(parts: list[str]) -> tuple[Column, Column]:
    """Variant-engine ``{{.Log.p…}}`` access (Spark 4 ``VariantType`` —
    the closest native match to the reference's ``interface{}`` payload,
    SURVEY.md §1.3).

    Same semantics as the string path (tests assert equality on random
    templates): parse failure / non-object → render error; missing or
    null leaf → ``<no value>``; scalars and nested objects render
    exactly as ``get_json_object`` does (variant→string cast). The win:
    the payload is parsed ONCE into the binary variant encoding and each
    access is an O(log fields) lookup, vs one full JSON re-parse per
    ``get_json_object`` call — the fast path for many-field templates.
    (Whole-stage codegen's subexpression elimination shares the single
    try_parse_json across all accesses in the projection.)"""
    v = F.try_parse_json(F.col("LogEntry"))

    def not_object(col: Column) -> Column:
        return ~F.coalesce(
            F.schema_of_variant(col).startswith("OBJECT"), F.lit(False)
        )

    error = not_object(v)
    for i in range(1, len(parts)):
        inter = F.try_variant_get(v, _json_path(parts[:i]), "variant")
        error = error | not_object(inter)
    leaf = F.try_variant_get(v, _json_path(parts), "variant").cast("string")
    value = F.coalesce(leaf, F.lit(NO_VALUE))
    return value, error


def _compile_action(body: str, variant_log: bool = False) -> tuple[Column, Column]:
    """Compile one ``{{…}}`` action → (segment, error condition)."""
    false = F.lit(False)

    m = _FORMAT_CALL_RE.match(body)
    if m:
        name, layout = m.group(1), _unescape(m.group(2))
        canon = _canonical(name)
        if canon != "Timestamp":
            raise TemplateError(f".Format is only supported on .Timestamp, got .{name}")
        return go_layout_col(layout, F.col("Timestamp")), false

    m = _STRFTIME_CALL_RE.match(body)
    if m:
        fmt, path = _unescape(m.group(1)), m.group(2)
        canon = _canonical(path)
        if canon != "Timestamp":
            raise TemplateError(f"strftime expects .Timestamp, got .{path}")
        return strftime_or_fallback(fmt, F.col("Timestamp")), false

    m = _FIELD_PATH_RE.match(body)
    if m:
        parts = m.group(1).split(".")
        head = parts[0]
        if head == "Log":
            if len(parts) == 1:
                # {{.Log}}: nil payload → <no value> (Go zero value);
                # otherwise render the JSON text (divergence noted above).
                entry = F.col("LogEntry")
                parsed_ok = F.json_object_keys(entry).isNotNull()
                return (
                    F.when(parsed_ok, entry).otherwise(F.lit(NO_VALUE)),
                    false,
                )
            if variant_log:
                return _compile_log_access_variant(parts[1:])
            return _compile_log_access(parts[1:])
        canon = _canonical(head)
        if canon is None:
            # Unknown key on the map[string]interface{} row → <no value>.
            return F.lit(NO_VALUE), false
        if len(parts) > 1:
            raise TemplateError(
                f"nested access only supported under .Log, got .{m.group(1)}"
            )
        if canon == "Timestamp":
            return go_default_render_col(F.col("Timestamp")), false
        return F.coalesce(F.col(canon), F.lit(NO_VALUE)), false

    raise TemplateError(
        f"unsupported template action {{{{{body}}}}}: this engine compiles the "
        "documented dialect (field access, .Log access, .Timestamp.Format, "
        "strftime); for arbitrary templates use watcher.watch(render_fn=…)"
    )


def compile_template(
    template: str = DEFAULT_TEMPLATE, variant_log: bool = False
) -> CompiledTemplate:
    """Compile a template string (see module docstring for the dialect).

    ``variant_log=True`` routes ``{{.Log.x}}`` accesses through Spark 4's
    VariantType (parse once, O(log n) per access) instead of per-access
    ``get_json_object`` — identical semantics, faster for templates that
    touch many payload fields.

    Compile errors raise TemplateError — the analogue of the reference's
    exit-2-on-parse-failure (main.go:110-114).
    """
    segments: list[Column] = []
    errors: list[Column] = []
    pos = 0
    for m in _ACTION_RE.finditer(template):
        literal = template[pos : m.start()]
        if "{{" in literal:
            raise TemplateError(f"unclosed action in template: {template!r}")
        if m.group(0).startswith("{{-"):
            literal = literal.rstrip()
        if literal:
            segments.append(F.lit(literal))
        seg, err = _compile_action(m.group(1), variant_log)
        segments.append(seg)
        errors.append(err)
        pos = m.end()
        # {{- … -}} right-trim applies to the following literal; handle by
        # peeking at next literal slice lazily via a flag.
        if m.group(0).endswith("-}}"):
            rest = template[pos:]
            stripped = rest.lstrip()
            pos += len(rest) - len(stripped)
    tail = template[pos:]
    if "{{" in tail:
        raise TemplateError(f"unclosed action in template: {template!r}")
    if tail:
        segments.append(F.lit(tail))

    line = F.concat(*segments) if segments else F.lit("")
    error = errors[0] if errors else F.lit(False)
    for e in errors[1:]:
        error = error | e
    return CompiledTemplate(line=line, error=error, source=template)
