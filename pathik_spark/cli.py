"""Command-line surface: the reference's CLI re-expressed over the
facade (``python -m pathik_spark crawl|r2|kafka|version ...``).

Flag surface mirrors /root/reference/pathik/cli.py:287-359 (``crawl`` /
``r2`` / ``kafka`` subcommands; urls positional, -o/-p/-s/-sf/-l/-v,
--content-type, --session-id, the kafka-*/r2-* option families,
--compression/--max-message-size/--buffer-memory). Engine differences,
by design:

- ``--pages`` points at the replay pages table (parquet) — the sandbox
  engine fetches by join, not by HTTP, so a content source is required
  where the reference dials the network.
- Live-client knobs (-w workers, -t timeout, -k skip-tls, -d delay,
  -c chrome-path) are accepted for drop-in parity and ignored: Spark
  owns parallelism and there is no HTTP client. Each logs a notice.
- Results print as one JSON object on stdout (the reference pretty-
  prints per-url lines; JSON is machine-checkable and stable).
"""

from __future__ import annotations

import argparse
import json
import sys

__version__ = "0.1.0"

_IGNORED = {
    "workers": "Spark owns parallelism",
    "timeout": "replay-from-table has no request timeout",
    "skip_tls": "no live HTTP client",
    "delay": "politeness is the scheduler's host-delay model",
    "chrome_path": "no browser rendering in the engine",
}


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("urls", nargs="+", help="URLs to crawl")
    p.add_argument("-o", "--output-dir", help="Output directory")
    p.add_argument("-p", "--parallel", action="store_true",
                   help="Process URLs in parallel (always true under Spark)")
    p.add_argument("-s", "--selector", help="CSS selector to extract specific content")
    p.add_argument("-sf", "--selector-files", action="store_true",
                   help="Save selector output to separate files")
    p.add_argument("-w", "--workers", type=int, default=4, help="(parity; ignored)")
    p.add_argument("-t", "--timeout", type=int, default=60, help="(parity; ignored)")
    p.add_argument("-l", "--limit", type=int, default=1000,
                   help="Maximum number of pages to crawl")
    p.add_argument("-v", "--validate", action="store_true",
                   help="Validate URLs before crawling (engine always validates)")
    p.add_argument("-k", "--skip-tls", action="store_true", help="(parity; ignored)")
    p.add_argument("-d", "--delay", type=int, default=0, help="(parity; ignored)")
    p.add_argument("-c", "--chrome-path", help="(parity; ignored)")
    p.add_argument("--session-id", help="Session ID for grouping crawls")
    # engine-specific: the replay content source + spark shape
    p.add_argument("--pages", required=True,
                   help="Parquet path of the pages table (url, warc_ts, html, ...)")
    p.add_argument("--master", default="local[*]", help="Spark master")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="pathik_spark")
    parser.add_argument("--version", action="version", version=f"pathik_spark {__version__}")
    sub = parser.add_subparsers(dest="command")

    crawl_p = sub.add_parser("crawl", help="Crawl URLs")
    _add_common(crawl_p)

    r2_p = sub.add_parser("r2", help="Crawl URLs and upload to R2")
    _add_common(r2_p)
    r2_p.add_argument("--uuid", dest="uuid_str", help="Fixed uuid prefix for R2 keys")
    r2_p.add_argument("--r2-account-id", help="R2 account ID")
    r2_p.add_argument("--r2-access-key-id", help="R2 access key ID")
    r2_p.add_argument("--r2-access-key-secret", help="R2 access key secret")
    r2_p.add_argument("--r2-bucket-name", help="R2 bucket name")
    r2_p.add_argument("--r2-public", action="store_true", help="(parity; ignored)")

    kafka_p = sub.add_parser("kafka", help="Crawl URLs and stream to Kafka")
    _add_common(kafka_p)
    kafka_p.add_argument("--content-type", default="both",
                         choices=["html", "markdown", "both"])
    kafka_p.add_argument("--kafka-brokers", help="Kafka brokers")
    kafka_p.add_argument("--kafka-topic", help="Kafka topic")
    kafka_p.add_argument("--kafka-username", help="Kafka username")
    kafka_p.add_argument("--kafka-password", help="Kafka password")
    kafka_p.add_argument("--kafka-client-id", help="Kafka client ID")
    kafka_p.add_argument("--kafka-use-tls", action="store_true")
    kafka_p.add_argument("--compression", choices=["gzip", "snappy", "lz4", "zstd"])
    kafka_p.add_argument("--max-message-size", type=int)
    kafka_p.add_argument("--buffer-memory", type=int)
    kafka_p.add_argument("--output-table",
                         help="No-broker fallback: write kafka-shaped rows here")

    sub.add_parser("version", help="Print version information")
    return parser


def _notice_ignored(args: argparse.Namespace) -> None:
    defaults = {"workers": 4, "timeout": 60, "skip_tls": False, "delay": 0,
                "chrome_path": None}
    for name, why in _IGNORED.items():
        if getattr(args, name, defaults.get(name)) not in (defaults.get(name), None):
            print(f"notice: --{name.replace('_', '-')} accepted for parity; {why}",
                  file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "version":
        print(f"pathik_spark {__version__}")
        return 0
    if not args.command:
        build_parser().print_help()
        return 1

    _notice_ignored(args)
    urls = args.urls[: args.limit]

    from pathik_spark import api
    from pathik_spark.session import get_spark

    spark = get_spark("pathik_spark_cli", master=args.master)
    try:
        if args.command == "crawl":
            result = api.crawl(
                urls, output_dir=args.output_dir, spark=spark, pages=args.pages,
                selector=args.selector, selector_files=args.selector_files,
            )
        elif args.command == "r2":
            result = api.crawl_to_r2(
                urls, uuid_str=args.uuid_str, spark=spark, pages=args.pages,
                output_dir=args.output_dir,
            )
        else:  # kafka
            result = api.stream_to_kafka(
                urls, content_type=args.content_type,
                topic=args.kafka_topic, session=args.session_id,
                compression_type=args.compression,
                max_message_size=args.max_message_size,
                buffer_memory=args.buffer_memory,
                spark=spark, pages=args.pages,
                brokers=args.kafka_brokers, username=args.kafka_username,
                password=args.kafka_password, use_tls=args.kafka_use_tls,
                output_table=args.output_table,
            )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    print(json.dumps(result, indent=2, sort_keys=True))
    ok = sum(1 for r in result.values() if r.get("success"))
    print(f"{ok}/{len(result)} URLs succeeded", file=sys.stderr)
    return 0 if ok == len(result) else 2


if __name__ == "__main__":
    raise SystemExit(main())
