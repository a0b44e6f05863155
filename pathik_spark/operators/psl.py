"""Registrable-domain (eTLD+1) derivation — the public-suffix-list
algorithm as relational Spark, for politeness grouping at the
*site* rather than *hostname* granularity.

Why it matters at crawl scale: a large site fans out over hundreds of
subdomains (``img1.shop.example.co.uk``, ``img2...``); per-hostname
politeness would hit the registrant's origin with hundreds of parallel
budgets. Grouping by the registrable domain (one label left of the
public suffix) restores the one-site-one-budget contract, matching how
production crawlers (Heritrix "queue by authority", Common Crawl)
group queues.

Algorithm (publicsuffix.org/list/ spec, reimplemented from the public
rules semantics):

- a rule matches when its labels are a suffix of the host's labels;
  ``*`` matches exactly one label at its position;
- exception rules (``!``) beat everything; their public suffix is the
  rule minus its leftmost label;
- otherwise the matching rule with the MOST labels prevails; when no
  rule matches, the implicit default rule ``*`` applies (public suffix
  = the last label);
- registrable domain = public suffix + exactly one preceding label;
  a host that IS a public suffix has no registrable domain (NULL).

The embedded ``PSL_SNAPSHOT`` is a small representative subset of the
ICANN section (multi-label suffixes, one wildcard + exception family)
— the algorithm is exact; swap in the full ~9k-rule list at deploy by
passing ``rules=`` (any iterable of rule strings, same grammar). Rules
are broadcast (kilobytes); the host side is deduplicated before the
join so the rule explosion touches |distinct hosts| rows, never |urls|.

Everything is built-in expressions: split -> bounded suffix explode ->
broadcast equi-join on the candidate key -> one groupBy(host). No UDFs.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, functions as F

# Representative ICANN-section snapshot. Single-label TLDs are covered
# by the spec's implicit default rule "*" and do not need listing; what
# changes behavior is the multi-label and wildcard/exception families.
PSL_SNAPSHOT: tuple[str, ...] = (
    # UK second-level registrations
    "co.uk", "org.uk", "ac.uk", "gov.uk", "ltd.uk", "plc.uk", "net.uk",
    "me.uk", "nhs.uk", "sch.uk", "police.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    # Japan (plus prefecture examples)
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp", "tokyo.jp", "osaka.jp",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    # India / China / Korea / Taiwan / Hong Kong / Singapore
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "pe.kr",
    "com.tw", "org.tw", "idv.tw", "com.hk", "org.hk", "edu.hk",
    "com.sg", "org.sg", "edu.sg", "gov.sg",
    # Europe / elsewhere
    "co.nz", "org.nz", "net.nz", "govt.nz", "ac.nz",
    "co.za", "org.za", "web.za", "gov.za", "ac.za",
    "com.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "org.ar", "net.ar", "gob.ar", "edu.ar",
    "com.tr", "org.tr", "net.tr", "gov.tr", "edu.tr", "bel.tr",
    "com.ua", "org.ua", "net.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ru", "org.ru", "net.ru", "msk.ru", "spb.ru",
    "com.eg", "org.eg", "gov.eg", "com.sa", "org.sa", "gov.sa",
    "com.ng", "org.ng", "gov.ng", "co.ke", "or.ke", "go.ke",
    "com.vn", "org.vn", "gov.vn", "com.ph", "org.ph", "gov.ph",
    "com.my", "org.my", "gov.my", "co.id", "or.id", "go.id", "web.id",
    "com.es", "org.es", "gob.es", "nom.es", "edu.es",
    "co.il", "org.il", "gov.il", "ac.il", "muni.il",
    "com.co", "org.co", "gov.co", "edu.co", "com.pe", "org.pe", "gob.pe",
    "com.ve", "org.ve", "gob.ve", "com.uy", "org.uy", "gub.uy",
    # Wildcard + exception family (Cook Islands, the canonical example):
    # every *.ck label pair is a public suffix EXCEPT www.ck, which is a
    # registrable domain itself.
    "*.ck", "!www.ck",
    # Wildcard-only examples
    "*.bd", "*.kw",
    # US locality structure
    "k12.ca.us", "cc.ca.us", "state.ca.us", "k12.ny.us", "cc.ny.us",
)

MAX_SUFFIX_LABELS = 5  # longest rule in the full PSL is 5 labels


def psl_rules_df(spark, rules: Iterable[str] | None = None) -> DataFrame:
    """Normalize rule strings into the join-ready shape:
    (match_key, n_labels, is_exception, is_wildcard). Wildcard rules
    keep their literal '*.tail' key; the host side generates the same
    key form for each candidate length."""
    rows = []
    for raw in (rules if rules is not None else PSL_SNAPSHOT):
        r = raw.strip().lower()
        if not r or r.startswith("//"):
            continue
        is_exc = r.startswith("!")
        if is_exc:
            r = r[1:]
        labels = r.split(".")
        rows.append((r, len(labels), is_exc, labels[0] == "*"))
    return spark.createDataFrame(
        rows, "match_key string, n_labels int, is_exception boolean, is_wildcard boolean"
    )


def registrable_domain(
    hosts: DataFrame,
    host_col: str = "host",
    rules: Iterable[str] | None = None,
) -> DataFrame:
    """(host, public_suffix, registrable_domain) for each DISTINCT host.

    ``registrable_domain`` is NULL when the host itself is a public
    suffix (nothing registrable) and for empty/NULL hosts. The rule
    table is broadcast; the only shuffle is the final groupBy(host) over
    |hosts| x MAX_SUFFIX_LABELS candidate rows.
    """
    spark = hosts.sparkSession
    rules_df = psl_rules_df(spark, rules)

    h = (
        hosts.select(
            F.regexp_replace(F.lower(F.col(host_col)), r"\.$", "").alias("host")
        )
        .filter(F.col("host") != "")
        .distinct()
        .withColumn("_labels", F.split("host", r"\."))
        .withColumn("_n", F.size("_labels"))
    )
    # candidate suffix of length i = last i labels; also its wildcarded
    # twin '*.' + last (i-1) labels so '*.ck'-style rules equi-join too
    cand = h.select(
        "host",
        "_labels",
        "_n",
        F.explode(
            F.sequence(F.lit(1), F.least(F.col("_n"), F.lit(MAX_SUFFIX_LABELS)))
        ).alias("_i"),
    ).select(
        "host",
        "_labels",
        "_n",
        "_i",
        F.array_join(F.slice("_labels", F.col("_n") - F.col("_i") + 1, F.col("_i")), ".").alias("_exact_key"),
    )
    keyed = cand.select(
        "host", "_labels", "_n", "_i", F.col("_exact_key").alias("match_key")
    ).unionByName(
        cand.filter(F.col("_i") >= 2).select(
            "host",
            "_labels",
            "_n",
            "_i",
            F.concat(
                F.lit("*."),
                F.array_join(F.slice("_labels", F.col("_n") - F.col("_i") + 2, F.col("_i") - 1), "."),
            ).alias("match_key"),
        )
    )
    matched = keyed.join(F.broadcast(rules_df), "match_key")
    # prevailing rule per host: exceptions win, then most labels.
    # suffix length in LABELS: exception rule minus its leftmost label
    # -> _i - 1; normal rule -> _i.
    per_host = (
        matched.select(
            "host",
            F.struct(
                F.col("is_exception").cast("int").alias("exc"),
                F.when(F.col("is_exception"), F.col("_i") - 1)
                .otherwise(F.col("_i"))
                .alias("sfx_len"),
            ).alias("_cand"),
        )
        .groupBy("host")
        .agg(F.max("_cand").alias("_best"))
        .select("host", F.col("_best.sfx_len").alias("_sfx"))
    )
    # hosts matching no rule at all: implicit default rule '*' -> suffix
    # is the last label
    all_hosts = h.join(per_host, "host", "left").withColumn(
        "_sfx", F.coalesce(F.col("_sfx"), F.lit(1))
    )
    return all_hosts.select(
        "host",
        F.array_join(
            F.slice("_labels", F.col("_n") - F.col("_sfx") + 1, F.col("_sfx")), "."
        ).alias("public_suffix"),
        F.when(
            F.col("_n") > F.col("_sfx"),
            F.array_join(
                F.slice("_labels", F.col("_n") - F.col("_sfx"), F.col("_sfx") + 1), "."
            ),
        ).alias("registrable_domain"),
    )


def attach_registrable_domain(
    df: DataFrame,
    host_col: str = "host",
    rules: Iterable[str] | None = None,
) -> DataFrame:
    """Add a ``registrable_domain`` column (coalesced to the host when
    the host is itself a public suffix or an IP-ish label, so the value
    is always usable as a grouping key). The lookup is computed on the
    deduplicated host set then joined back — at frontier scale the
    distinct-host table is orders of magnitude smaller than the URL
    table."""
    lut = registrable_domain(df.select(host_col), host_col=host_col, rules=rules)
    lut = lut.select(
        F.col("host").alias(host_col),
        F.coalesce("registrable_domain", "host").alias("registrable_domain"),
    )
    return df.join(lut, host_col, "left").withColumn(
        "registrable_domain",
        F.coalesce("registrable_domain", F.lower(F.col(host_col))),
    )


def group_politeness_by_domain(
    frontier: DataFrame,
    host_col: str = "host",
    rules: Iterable[str] | None = None,
) -> DataFrame:
    """Politeness-key switch: rewrite ``host`` to the registrable domain
    (keeping the original as ``hostname``) so the UNCHANGED scheduler
    (operators/scheduler.py — rank, crawl-delay spacing, budgets, salted
    top-k) enforces one budget per registered site instead of per
    hostname. The scheduler is key-agnostic; this is a column rewrite,
    not a second code path."""
    out = attach_registrable_domain(frontier, host_col=host_col, rules=rules)
    return out.withColumn("hostname", F.col(host_col)).withColumn(
        host_col, F.col("registrable_domain")
    ).drop("registrable_domain")
