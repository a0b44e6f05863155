"""Sequential ordering + seen-set oracle (SURVEY.md §5.2.3, §7-H2).

A plain-Python simulator of the deterministic scheduling semantics the
engine implements (spec in pathik_spark/operators/scheduler.py): FIFO by
(priority, seq) within host, per-host crawl-delay budgets and
max_per_round caps, optional global token bucket (the reference's
1 req/s burst-3 limiter, crawler/crawler.go:26, and sequential loop
main.go:167-177), first-occurrence-wins dedup of canonical URLs.

This file is intentionally Spark-free: it is the *independent*
implementation the distributed job is tested against.
"""

from __future__ import annotations

from dataclasses import dataclass

from pathik_spark.kernels.canonical import canonicalize_url, url_host, validate_url


@dataclass
class OracleResult:
    order: list[dict]  # [{rank, url, host, scheduled_ms, priority, seq}]
    deferred: list[str]  # canonical urls pushed to the next round
    seen: set[str]  # canonical urls consumed (scheduled) this round


def simulate_round(
    seeds: list[dict],
    robots: dict[str, dict],
    already_seen: set[str] | None = None,
    global_period_ms: int | None = None,
    global_burst: int = 3,
) -> OracleResult:
    """seeds: [{url, seq, priority}]; robots: host -> {crawl_delay_ms,
    max_per_round, disallow_prefixes}."""
    already_seen = already_seen or set()

    # validate -> canonicalize -> first-occurrence dedup (by priority, seq)
    best: dict[str, dict] = {}
    for row in sorted(seeds, key=lambda r: (r["priority"], r["seq"])):
        if not validate_url(row["url"]):
            continue
        canon = canonicalize_url(row["url"])
        if canon is None or canon in best:
            continue
        best[canon] = {**row, "url": canon}

    candidates = []
    for canon, row in best.items():
        if canon in already_seen:
            continue
        host = url_host(canon) or ""
        rb = robots.get(host, {})
        path = "/" + canon.split("://", 1)[1].split("/", 1)[1] if "/" in canon.split("://", 1)[1] else "/"
        if any(path.startswith(p) for p in rb.get("disallow_prefixes", [])):
            continue
        candidates.append(
            {
                **row,
                "host": host,
                "crawl_delay_ms": int(rb.get("crawl_delay_ms", 0)),
                "max_per_round": int(rb.get("max_per_round", 10**9)),
            }
        )

    # per-host FIFO rank + budget
    per_host_count: dict[str, int] = {}
    selected, deferred = [], []
    for cand in sorted(candidates, key=lambda r: (r["priority"], r["seq"])):
        k = per_host_count.get(cand["host"], 0)
        if k >= cand["max_per_round"]:
            deferred.append(cand["url"])
            continue
        per_host_count[cand["host"]] = k + 1
        cand["rank_in_host"] = k + 1
        cand["desired_ms"] = k * cand["crawl_delay_ms"]
        selected.append(cand)

    # global token bucket over (desired_ms, priority, seq) order
    selected.sort(key=lambda r: (r["desired_ms"], r["priority"], r["seq"]))
    if global_period_ms:
        credits = global_burst * global_period_ms
        last_t = 0
        for cand in selected:
            t = cand["desired_ms"]
            credits = min(global_burst * global_period_ms, credits + (t - last_t))
            if credits >= global_period_ms:
                sched = t
                credits -= global_period_ms
            else:
                sched = t + (global_period_ms - credits)
                credits = 0
            last_t = sched
            cand["scheduled_ms"] = sched
    else:
        for cand in selected:
            cand["scheduled_ms"] = cand["desired_ms"]

    selected.sort(key=lambda r: (r["scheduled_ms"], r["priority"], r["seq"]))
    order = [
        {
            "rank": i + 1,
            "url": c["url"],
            "host": c["host"],
            "scheduled_ms": c["scheduled_ms"],
            "priority": c["priority"],
            "seq": c["seq"],
        }
        for i, c in enumerate(selected)
    ]
    return OracleResult(
        order=order,
        deferred=deferred,
        seen={c["url"] for c in selected},
    )
