"""The round-based frontier driver loop (SURVEY.md §3.1 Spark lifecycle,
§7-M5): the engine's flagship end-to-end plan.

Per round:

    frontier -> validate/canonicalize/dedup (F1/F2, B1)
             -> robots join + disallow filter (J4/B3)
             -> URL-seen anti-join with bloom pre-filter (J3/B2)
             -> politeness schedule within per-host budgets (B4/W1/W2/W4)
             -> fetch join against pages (J2/S2)
             -> extract text/markdown + derive filenames (X1-X7, F6-F8)
             -> artifacts + metrics + lineage written (A1/A3/B6)
             -> retries (W3) + discovered links (§2.7) -> next frontier
             -> snapshot commit (B5)

Spark has no native iteration, so the loop is driver-side Python; each
round is one declarative DataFrame plan that Catalyst optimizes whole
(SURVEY.md §4.3.3). Checkpoint/resume comes from the SnapshotStore's
atomic per-round manifests: a killed run resumes from the last complete
round and recomputes the partial one idempotently.

Scale defaults: frontier repartitioned by host_hash before the
scheduler, AQE skew-join on (session.py), bloom-sharded seen filter.
The reference's global 1 rps token bucket (crawler.go:26) is available
as parity mode (config.global_period_ms) and OFF at scale.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pathik_spark.config import CrawlConfig
from pathik_spark.operators.discover import discover_links
from pathik_spark.operators.fetch import extract_artifacts, fetch_join
from pathik_spark.operators.frontier import prepare_frontier
from pathik_spark.operators.metrics import host_metrics, partition_lineage
from pathik_spark.operators.robots import attach_robots, filter_disallowed
from pathik_spark.operators.scheduler import schedule_round
from pathik_spark.operators.seen import build_bloom_shards, seen_filter
from pathik_spark.sources.tables import SnapshotStore

FRONTIER_COLS = ["url", "seq", "priority", "attempt"]
SEEN_COLS = ["url_hash", "host_hash", "url"]


@dataclass
class RoundStats:
    round: int
    scheduled: int
    fetched: int
    missing: int
    deferred: int
    retried: int
    discovered: int
    seen_total: int
    extras: dict = field(default_factory=dict)


class CrawlRun:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        links: DataFrame | None,
        state_dir: str,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.pages = pages
        self.robots = robots
        self.links = links
        self.config = (config or CrawlConfig()).validate()
        self.store = SnapshotStore(spark, state_dir, self.config.run_id)
        self._pages_prepared: DataFrame | None = None
        self._links_prepared: DataFrame | None = None

    def _table_name(self, suffix: str) -> str:
        import re

        return "pathik_" + re.sub(r"[^A-Za-z0-9_]", "_", self.config.run_id) + "_" + suffix

    def _prepared_pages(self) -> DataFrame:
        """Pages keyed by canonical url_hash, materialized ONCE per run as
        a table BUCKETED by url_hash (the fetch-join key): the canonicalize
        UDF never re-runs over the corpus, and the per-round fetch join
        never re-shuffles the (html-heavy) pages side — only the small
        scheduled frontier shuffles onto the bucketing. This mirrors the
        10^10 deployment, where pages live in an Iceberg table bucketed by
        url_hash."""
        if self._pages_prepared is None:
            from pathik_spark.operators.fetch import pages_by_hash

            name = self._table_name("pages")
            path = os.path.join(self.store.root, "pages_prepared")
            marker = os.path.join(self.store.root, "pages_prepared.done")
            n_buckets = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            if not os.path.exists(marker):
                (
                    pages_by_hash(self.pages)
                    .write.mode("overwrite")
                    .bucketBy(n_buckets, "url_hash")
                    .sortBy("url_hash")
                    .option("path", path)
                    .saveAsTable(name)
                )
                with open(marker, "w") as f:
                    f.write("ok")
            elif not self.spark.catalog.tableExists(name):
                # resume in a fresh session: re-register the external table
                self.spark.catalog.createTable(
                    name, path=path, source="parquet"
                )  # bucketing metadata lost on re-register; join still correct
            self._pages_prepared = self.spark.table(name)
        return self._pages_prepared

    def _prepared_links(self) -> DataFrame | None:
        """Links with the canonical src_hash precomputed once per run."""
        if self.links is None:
            return None
        if getattr(self, "_links_prepared", None) is None:
            from pathik_spark.functions import urls as U

            path = os.path.join(self.store.root, "links_prepared.parquet")
            marker = os.path.join(self.store.root, "links_prepared.done")
            if not os.path.exists(marker):
                self.links.withColumn(
                    "src_hash", U.url_hash_expr(U.canonicalize_udf(F.col("src_url")))
                ).write.mode("overwrite").parquet(path)
                with open(marker, "w") as f:
                    f.write("ok")
            self._links_prepared = self.spark.read.parquet(path)
        return self._links_prepared

    # -- one round ----------------------------------------------------------
    def run_round(
        self,
        round_no: int,
        frontier: DataFrame,
        seen: DataFrame | None,
        seen_size_hint: int = 0,
    ) -> tuple[DataFrame, DataFrame, RoundStats]:
        cfg = self.config
        spark = self.spark

        fr = prepare_frontier(frontier, num_shards=cfg.num_shards)
        fr = fr.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "host_hash"
        )
        candidates = filter_disallowed(attach_robots(fr, self.robots))

        bloom_bc = None
        if cfg.use_bloom and seen is not None and seen_size_hint >= cfg.bloom_min_seen:
            shards = build_bloom_shards(seen, fpp=cfg.bloom_fpp)
            if shards:
                bloom_bc = spark.sparkContext.broadcast(shards)
        unseen = seen_filter(candidates, seen, bloom_bc)

        scheduled, deferred = schedule_round(
            unseen,
            n_salts=cfg.n_salts,
            global_period_ms=cfg.global_period_ms,
            global_burst=cfg.global_burst,
        )
        if cfg.limit_per_round is not None:
            over = scheduled.filter(F.col("crawl_order") > cfg.limit_per_round)
            deferred = deferred.unionByName(
                over.select(*deferred.columns), allowMissingColumns=False
            )
            scheduled = scheduled.filter(F.col("crawl_order") <= cfg.limit_per_round)

        artifacts_plan = extract_artifacts(
            fetch_join(scheduled, self._prepared_pages(), prepared=True),
            fetch_cap=cfg.fetch_cap,
            with_markdown=cfg.content_type in ("markdown", "both"),
        ).withColumn("bytes_fetched", F.coalesce(F.length("html"), F.lit(0)))

        # ONE pass through fetch join + extraction UDFs: write the
        # artifacts snapshot, then every consumer (incl. lineage) scans the
        # columnar file.
        arts = self.store.write_table(round_no, "artifacts", artifacts_plan.drop("html"))
        lineage = partition_lineage(arts, self.config.run_id, round_no)

        # W3 retry semantics (crawler.go:173-224): missing rows re-enter
        # with attempt+1 until max_attempts; exhausted rows become seen.
        retry = arts.filter(
            (F.col("status") == "missing") & (F.col("attempt") + 1 < cfg.max_attempts)
        ).select("url", "seq", "priority", (F.col("attempt") + 1).alias("attempt"))
        consumed = arts.filter(
            (F.col("status") == "fetched") | (F.col("attempt") + 1 >= cfg.max_attempts)
        ).select("url_hash", "host_hash", "url")
        new_seen = (
            consumed
            if seen is None
            else seen.select(*SEEN_COLS).unionByName(consumed).distinct()
        )

        next_frontier = deferred.select(*FRONTIER_COLS).withColumn("src", F.lit("deferred"))
        next_frontier = next_frontier.unionByName(
            retry.select(*FRONTIER_COLS).withColumn("src", F.lit("retry"))
        )
        if self.links is not None:
            # discovered rows take a per-round disjoint seq range: always
            # after every seed/deferred seq (FIFO: discoveries queue behind
            # the original frontier) and unique without a max(seq) job
            seq_base = (round_no + 1) * 1_000_000_000_000
            fetched_only = arts.filter(F.col("status") == "fetched")
            discovered = discover_links(
                self._prepared_links(), fetched_only, seq_base=seq_base, prepared=True
            )
            next_frontier = next_frontier.unionByName(
                discovered.withColumn("attempt", F.lit(0))
                .select(*FRONTIER_COLS)
                .withColumn("src", F.lit("discovered"))
            )

        self.store.write_table(round_no, "host_metrics", host_metrics(arts, self.config.run_id, round_no))
        self.store.write_table(round_no, "lineage", lineage)
        seen_out = self.store.write_table(round_no, "seen", new_seen)
        frontier_out = self.store.write_table(round_no, "next_frontier", next_frontier)

        # stats from the committed files (cheap columnar aggs; no UDF rerun)
        art_counts = arts.agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("status") == "fetched", 1)).alias("f"),
        ).collect()[0]
        if cfg.collect_stats:
            nf_counts = {
                r["src"]: r["n"]
                for r in frontier_out.groupBy("src").agg(F.count("*").alias("n")).collect()
            }
            seen_total = seen_out.count()
        else:
            nf_counts = {}
            seen_total = seen_size_hint + art_counts["f"]  # upper-bound estimate
        stats = RoundStats(
            round=round_no,
            scheduled=art_counts["n"],
            fetched=art_counts["f"],
            missing=art_counts["n"] - art_counts["f"],
            deferred=nf_counts.get("deferred", 0),
            retried=nf_counts.get("retry", 0),
            discovered=nf_counts.get("discovered", 0),
            seen_total=seen_total,
        )
        self.store.commit(
            round_no,
            ["artifacts", "host_metrics", "lineage", "seen", "next_frontier"],
            stats={k: getattr(stats, k) for k in (
                "scheduled", "fetched", "missing", "deferred", "retried", "discovered", "seen_total"
            )},
        )
        return frontier_out.drop("src"), seen_out, stats

    # -- multi-round with resume --------------------------------------------
    def run(self, seeds: DataFrame, n_rounds: int | None = None, resume: bool = True) -> list[RoundStats]:
        n_rounds = n_rounds or self.config.n_rounds
        start = 0
        frontier: DataFrame = seeds.select(
            "url", F.col("seq").cast("long"), F.col("priority").cast("int")
        ).withColumn("attempt", F.lit(0))
        seen: DataFrame | None = None
        if resume:
            last = self.store.latest_complete_round()
            if last is not None:
                start = last + 1
                frontier = self.store.read_table(last, "next_frontier")
                seen = self.store.read_table(last, "seen")
        if resume and start > 0:
            prev = self.store.read_manifest(start - 1)
            seen_hint = int((prev or {}).get("stats", {}).get("seen_total", 0))
        else:
            seen_hint = 0
        stats = []
        for k in range(start, n_rounds):
            if len(frontier.take(1)) == 0:
                break
            frontier, seen, st = self.run_round(k, frontier, seen, seen_size_hint=seen_hint)
            seen_hint = st.seen_total
            stats.append(st)
        return stats
