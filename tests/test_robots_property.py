"""Parity sweep: the relational robots.txt parser == an independent
pure-Python reference parser on 250 randomized adversarial robots files
(seeded, one Spark job). The reference implements the same documented
subset (operators/robots.parse_robots_txt docstring) from scratch —
different code path, same spec."""

from __future__ import annotations

import random
import re

from pathik_spark.operators.robots import parse_robots_txt

UA = "pathik"


def ref_parse(text: str, ua: str):
    """Independent reference implementation of the documented subset."""
    ua = ua.lower()
    directives = []
    for raw in text.split("\n"):
        line = re.sub(r"#.*$", "", raw).strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field not in ("user-agent", "disallow", "allow", "crawl-delay"):
            continue
        directives.append((field, value))
    groups: list[dict] = []
    prev_ua = False
    for field, value in directives:
        if field == "user-agent":
            if not prev_ua:
                groups.append({"agents": set(), "rules": []})
            groups[-1]["agents"].add(value.lower())
            prev_ua = True
        else:
            prev_ua = False
            if groups:
                groups[-1]["rules"].append((field, value))
    exact = [g for g in groups if ua in g["agents"]]
    chosen = exact if exact else [g for g in groups if "*" in g["agents"]]
    if not chosen:
        return None
    dis, allow, delays = set(), set(), []
    for g in chosen:
        for field, value in g["rules"]:
            if field == "disallow" and value:
                dis.add(value)
            elif field == "allow" and value:
                allow.add(value)
            elif field == "crawl-delay":
                try:
                    delays.append(float(value))
                except ValueError:
                    pass
    delay_ms = int(min(delays) * 1000) if delays else None
    return delay_ms, sorted(dis), sorted(allow)


def gen_robots(rng: random.Random) -> str:
    agents = ["pathik", "PATHIK", "Pathik", "otherbot", "GoogleBot", "*"]
    paths = ["/a", "/a/b", "/api", "/api/public", "/private", "", "/x y", "/%7Ej"]
    fields = []
    for _ in range(rng.randrange(0, 14)):
        kind = rng.random()
        if kind < 0.30:
            f = rng.choice(["User-agent", "USER-AGENT", "user-agent", "User-Agent"])
            fields.append(f"{f}: {rng.choice(agents)}")
        elif kind < 0.55:
            f = rng.choice(["Disallow", "disallow", "DISALLOW"])
            fields.append(f"{f}: {rng.choice(paths)}")
        elif kind < 0.70:
            fields.append(f"Allow: {rng.choice(paths)}")
        elif kind < 0.80:
            fields.append(f"Crawl-delay: {rng.choice(['0', '0.25', '0.5', '1', '2'])}")
        elif kind < 0.88:
            fields.append(f"# comment {rng.randrange(100)}")
        elif kind < 0.94:
            fields.append(rng.choice(["", "   ", "garbage line", "Sitemap: https://x/s.xml"]))
        else:
            fields.append(f"Disallow: {rng.choice(paths)}  # trailing")
    return "\n".join(fields)


def test_parser_matches_reference_on_random_files(spark):
    rng = random.Random(20260817)
    docs = [(f"h{i}", gen_robots(rng)) for i in range(250)]
    df = spark.createDataFrame(docs, ["host", "robots_txt"])
    got = {
        r["host"]: (
            r["crawl_delay_ms"],
            list(r["disallow_prefixes"]),
            list(r["allow_prefixes"]),
        )
        for r in parse_robots_txt(df, UA).collect()
    }
    for host, text in docs:
        want = ref_parse(text, UA)
        if want is None:
            assert host not in got, f"{host} should be absent\n{text}"
        else:
            assert host in got, f"{host} missing\n{text}"
            assert got[host] == want, f"{host}\n{text}\n{got[host]} != {want}"
