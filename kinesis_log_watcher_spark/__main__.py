"""CLI parity with the reference (README.md:9-12):

    kinesis-log-watcher [-f <template>] [-s <start>] [-w <poll>] [-O] <stream>
    python -m kinesis_log_watcher_spark [same flags] <stream>

``<stream>`` is a Kinesis stream name in production (needs a connector
jar, sources/kinesis.py) or a local directory of raw-record files for
offline use (sources/files.py) — the pipeline downstream of the source is
identical (SURVEY.md §1.1).

Flag semantics match the reference exactly:
  -f/--format   render template       (default main.go:65)
  -s/--start    lookback duration     (default 5m, main.go:66)
  -w/--watch    poll interval         (default 10s, main.go:67)
  -O/--one-shot read until caught up, then exit (main.go:64, 89-92)
  -r/--region   AWS region; unset → $AWS_REGION / SDK default chain
                (main.go:68, 133-138)
  -p/--profile  named profile in ~/.aws/credentials (main.go:69)
Invalid durations/templates exit with code 2 (main.go:86, 99, 113);
SIGINT stops the query gracefully (main.go:191-208 ≙ query.stop()).
--help prints the template-field documentation the reference embeds in
its usage text (main.go:36-59, README.md:13-25) as the epilog.
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime, timedelta, timezone

from kinesis_log_watcher_spark.session import get_spark
from kinesis_log_watcher_spark.template import DEFAULT_TEMPLATE, TemplateError
from kinesis_log_watcher_spark.watcher import parse_duration, watch


# The reference's usage text documents every template field and the
# duration/timestamp-format conventions (main.go:36-59; same content as
# README.md:10-25) — parity requires --help to carry the same docs.
USAGE_EPILOG = """\
Watch incoming log entries from a Kinesis stream (or a local directory of
raw-record files). This is intended to be a companion to
kinesis-log-streamer.

Valid durations are a number followed by a unit abbreviation.
Examples: 30s, 5m, 3h, 1d.

The format string uses the Go template format; full documentation is
available at https://golang.org/pkg/text/template/. Fields available are:
    {{.HostId}} {{.HostID}} -- The full ARN of the host generating the log.
    {{.ShortHostId}} {{.ShortHostID}} -- Short hostname (just the last part).
    {{.Timestamp}} -- The timestamp when the log was sent to Kinesis.
    {{.LogEntry}} -- The log entry in string format.
    {{.Log}} -- If the log entry could be parsed as JSON, the resulting JSON
        structure. You can get embedded fields using {{.Log.FieldName}}.

To format the timestamp in different formats (e.g. ISO 8601), you can use:
    {{strftime "%Y-%m-%dT%H:%M:%S" .Timestamp}}
"""


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kinesis-log-watcher-spark",
        description="Tail a log stream and render each record through a template.",
        epilog=USAGE_EPILOG,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("-f", "--format", default=DEFAULT_TEMPLATE,
                   help="render template (Go text/template dialect)")
    p.add_argument("-s", "--start", default="5m",
                   help="how far back to start reading (e.g. 30s, 5m, 3h, 1d)")
    p.add_argument("-w", "--watch", default="10s",
                   help="poll interval when caught up")
    p.add_argument("-O", "--one-shot", action="store_true",
                   help="read each shard until caught up, then exit")
    p.add_argument("-r", "--region", default=None,
                   help="the AWS region to use; if unspecified, the value "
                        "from the $AWS_REGION environment variable is used")
    p.add_argument("-p", "--profile", default=None,
                   help="if specified, obtain AWS credentials from the "
                        "specified profile in ~/.aws/credentials")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir for durable resume (improves on the "
                        "reference's in-memory-only offsets)")
    p.add_argument("stream", help="Kinesis stream name, or a local directory "
                                  "of raw-record files")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)

    try:
        start_delta = parse_duration(args.start)
        parse_duration(args.watch)
    except ValueError as exc:
        print(exc, file=sys.stderr)
        return 2

    spark = spark or get_spark(app_name="kinesis-log-watcher")
    now = datetime.now(timezone.utc)

    if os.path.isdir(args.stream):
        from kinesis_log_watcher_spark.sources.files import read_raw_records_stream

        records = read_raw_records_stream(spark, args.stream)
    else:
        from kinesis_log_watcher_spark.sources.kinesis import read_kinesis_stream

        # The reference starts every shard at AT_TIMESTAMP now-start
        # (main.go:300-305); without start_timestamp the connector would
        # default to 'latest' and the -s lookback records could never be
        # read — the downstream >=cutoff filter only drops, never recovers.
        records = read_kinesis_stream(
            spark,
            args.stream,
            # region unset → option omitted → connector/SDK default
            # chain ($AWS_REGION), exactly the reference's flag handling
            # (main.go:133-138); profile resolves ~/.aws/credentials
            region=args.region,
            profile=args.profile,
            start_timestamp=now - start_delta,
        )

    try:
        query = watch(
            records,
            template=args.format,
            start=args.start,
            now=now,
            poll=args.watch,
            one_shot=args.one_shot,
            checkpoint_dir=args.checkpoint,
            # reference-faithful: every line streams to stdout
            # (main.go:288-292) — the CLI is the one opt-in to the
            # unbounded path; the library default stays bounded.
            max_lines=None,
        )
    except TemplateError as exc:
        print(exc, file=sys.stderr)
        return 2

    try:
        query.awaitTermination()
    except KeyboardInterrupt:
        # the reference's SIGINT path: broadcast close, wait for workers
        # (main.go:191-208) — here: stop the streaming query cleanly
        query.stop()
        query.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
