#!/usr/bin/env python
"""spark-submit entry point (north_rule packaging requirement).

Cluster usage:

    zip -r pathik_spark.zip pathik_spark
    spark-submit --py-files pathik_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        submit_job.py --pages <pages_table> --seeds <seeds_table> \
        --robots <robots_table> --links <links_table> \
        --state-dir <checkpoint_dir> --rounds 3 --run-id prod-1

Local smoke (no cluster):

    python submit_job.py --synthetic 2000 --rounds 2 --state-dir /tmp/ps

The job resumes from the last committed round automatically (B5).

Iceberg round state (the north-rule 10^10 deployment) — add the runtime
jars and a hadoop-catalog warehouse; round tables + the visibility
manifest then live in the catalog (sources/tables.IcebergSnapshotStore):

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        --py-files pathik_spark.zip submit_job.py ... \
        --state-backend iceberg --iceberg-warehouse s3a://bucket/warehouse
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages")
    ap.add_argument("--seeds")
    ap.add_argument("--robots")
    ap.add_argument("--links")
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--n-salts", type=int, default=16)
    ap.add_argument("--num-shards", type=int, default=4096)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--content-type", default="both")
    ap.add_argument("--session-id", default=None)
    ap.add_argument("--synthetic", type=int, default=0, help="use a synthetic corpus of N pages")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--blocked-hosts",
        default=None,
        help="host blocklist: a parquet/text file with one host per row "
        "(subdomains of listed hosts are blocked too), or a comma-separated "
        "inline list",
    )
    ap.add_argument(
        "--adaptive-backoff",
        action="store_true",
        help="error-aware per-host backoff: AIMD fetch budgets + "
        "exponential crawl delays from each round's error rates "
        "(operators/metrics.backoff_budgets/backoff_delays)",
    )
    ap.add_argument("--backoff-base-budget", type=int, default=1000)
    ap.add_argument("--backoff-threshold-bp", type=int, default=2000)
    ap.add_argument(
        "--state-backend",
        default="auto",
        choices=("auto", "parquet", "iceberg"),
        help="round-state backend; iceberg needs the iceberg-spark-runtime "
        "jars on the cluster (--packages) plus --iceberg-warehouse",
    )
    ap.add_argument(
        "--iceberg-warehouse",
        default=None,
        help="warehouse path/URI for a hadoop-type Iceberg catalog; when "
        "set, the session is configured with catalog 'pathik' "
        "(sources/tables.iceberg_session_conf)",
    )
    args = ap.parse_args()

    from pathik_spark.config import CrawlConfig
    from pathik_spark.plans.driver import CrawlRun
    from pathik_spark.session import get_spark

    extra_conf = None
    if args.iceberg_warehouse:
        from pathik_spark.sources.tables import iceberg_session_conf

        extra_conf = iceberg_session_conf(args.iceberg_warehouse)
    spark = get_spark(f"pathik_crawl_{args.run_id}", extra_conf=extra_conf)

    if args.synthetic:
        from pathik_spark.fixtures import corpus_to_spark, gen_corpus

        tables = corpus_to_spark(spark, gen_corpus(args.synthetic, max(50, args.synthetic // 10)))
    else:
        tables = {
            "pages": spark.read.parquet(args.pages),
            "seeds": spark.read.parquet(args.seeds),
            "robots": spark.read.parquet(args.robots),
            "links": spark.read.parquet(args.links) if args.links else None,
        }

    cfg = CrawlConfig(
        run_id=args.run_id,
        session_id=args.session_id,
        content_type=args.content_type,
        limit_per_round=args.limit,
        n_salts=args.n_salts,
        num_shards=args.num_shards,
        n_rounds=args.rounds,
        state_backend=args.state_backend,
        adaptive_backoff=args.adaptive_backoff,
        backoff_base_budget=args.backoff_base_budget,
        backoff_threshold_bp=args.backoff_threshold_bp,
    )
    blocklist = None
    if args.blocked_hosts:
        import os

        if os.path.exists(args.blocked_hosts):
            if args.blocked_hosts.endswith(".parquet"):
                blocklist = spark.read.parquet(args.blocked_hosts)
            else:
                blocklist = spark.read.text(args.blocked_hosts).withColumnRenamed(
                    "value", "host"
                )
        else:
            blocklist = spark.createDataFrame(
                [(h.strip(),) for h in args.blocked_hosts.split(",") if h.strip()],
                "host string",
            )

    run = CrawlRun(
        spark,
        pages=tables["pages"],
        robots=tables["robots"],
        links=tables.get("links"),
        state_dir=args.state_dir,
        config=cfg,
        blocklist=blocklist,
    )
    stats = run.run(tables["seeds"], n_rounds=args.rounds, resume=not args.no_resume)
    for st in stats:
        print(json.dumps(st.__dict__))
    spark.stop()


if __name__ == "__main__":
    main()
