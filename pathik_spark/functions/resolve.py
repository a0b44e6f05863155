"""RFC 3986 §5.2 relative-reference resolution as Spark expressions.

Redirect ``Location`` headers (and ``<a href>`` values) are frequently
relative — root-relative ``/login``, directory-relative ``../next``,
scheme-relative ``//cdn.example/x``, query-only ``?page=2`` — so a
crawler that follows redirects or discovers links needs reference
resolution against the request URL. The reference delegates this to the
headless browser / Go ``net/http`` client, which resolve Locations
internally before re-issuing the request (crawler/crawler.go:162-226
never sees an unresolved Location); re-expressed relationally, the
resolution must be an explicit column function.

Two tiers, following functions/urls.py:

- :func:`resolve_reference_expr` — the whole algorithm as pure JVM
  expressions (``regexp_extract/regexp_replace/concat/when`` only, so
  the identical chain can be stated in DuckDB for the oracle). The
  dot-segment removal loop of RFC 3986 §5.2.4 is expressed as
  :data:`DOT_POP_ROUNDS` bounded rounds of the three
  :data:`POP_PATTERNS` rewrites — each round removes one nesting level
  of ``..`` (a global regexp pass cannot re-examine text it just
  produced), so paths with up to ``DOT_POP_ROUNDS`` nested up-pops
  resolve exactly; deeper nesting is vanishingly rare in real Location
  headers (depth >2 is already pathological) and resolves to a
  still-valid prefix-correct path.
- :func:`resolve_reference` — the normative Python kernel
  (``urllib.parse.urljoin``, itself the stdlib's RFC 3986
  implementation) used by tests as the independent reference the
  expression must match on the supported subset.

Crawl-semantics deviations from the raw RFC, applied identically in
kernel, expression, and oracle (all deliberate, all documented here):

- fragments are ALWAYS dropped — from the base, the reference, and the
  result — because a fragment never reaches the server and the crawl
  identity of a URL excludes it (kernels/canonical.py does the same);
- a reference that is empty/NULL (or fragment-only) resolves to the
  de-fragmented base — i.e. "no redirect target" rather than an error;
- same-scheme non-hierarchical refs (``http:g``) are out of scope: the
  expression returns them verbatim while urljoin applies the RFC's
  backward-compatibility merge; such Locations do not occur in practice
  (servers emit absolute or path forms) and the oracle corpus excludes
  them.
"""

from __future__ import annotations

from urllib.parse import urljoin

from pyspark.sql import Column
from pyspark.sql import functions as F

from pathik_spark.functions.urls import _NETLOC_RE, _PATH_RE

#: rounds of the pop rewrites — bounds the resolvable ``..`` nesting.
DOT_POP_ROUNDS = 8

#: RFC 3986 §5.2.4 remove_dot_segments as order-sensitive global regex
#: rewrites (applied in order, DOT_POP_ROUNDS times). RE2-compatible
#: (no lookaround) so the identical patterns run in DuckDB:
#:   1. drop "." segments:      /./        -> /   (and trailing /.)
#:   2. pop "seg/.." pairs:     /seg/../   -> /   (seg itself != "..")
#:   3. drop leading up-pops:   ^/../      -> /
#: Pattern 2's alternation admits every segment except the bare ".."
#: (".." + more, "." + non-dot, or non-dot-initial) — "." segments are
#: already gone after pattern 1 within the same round.
POP_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"/\.(/|$)", "/"),
    (r"/(\.\.[^/]+|\.[^/.][^/]*|[^/.][^/]*)/\.\.(/|$)", "/"),
    (r"^/\.\.(/|$)", "/"),
)

_SCHEME_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"


def remove_dot_segments_expr(path: Column) -> Column:
    """§5.2.4 over an absolute path column (leading '/'), bounded."""
    out = path
    for _ in range(DOT_POP_ROUNDS):
        for pat, rep in POP_PATTERNS:
            out = F.regexp_replace(out, pat, rep)
    return out


def _strip_fragment(c: Column) -> Column:
    return F.regexp_replace(c, r"#.*$", "")


def resolve_reference_expr(base: Column, ref: Column) -> Column:
    """Resolve ``ref`` against absolute http(s) ``base`` — RFC 3986
    §5.2.2 as one whole-stage-codegen'd expression (see module doc for
    the crawl-semantics deviations). NULL-safe: NULL/empty/whitespace
    ``ref`` resolves to the de-fragmented base."""
    ref_nf = _strip_fragment(F.trim(F.coalesce(ref, F.lit(""))))
    base_nf = _strip_fragment(base)
    scheme = F.lower(
        F.regexp_extract(base_nf, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    netloc = F.regexp_extract(base_nf, _NETLOC_RE, 1)
    origin = F.concat(scheme, F.lit("://"), netloc)
    bpath = F.regexp_extract(base_nf, _PATH_RE, 1)
    # base directory: path up to and including the last '/'; an empty
    # base path acts as '/' (http://h + g -> http://h/g)
    bdir = F.when(bpath == "", F.lit("/")).otherwise(
        F.regexp_replace(bpath, r"[^/]*$", "")
    )
    # the reference's own path?query split (dot-pops must never touch
    # the query: "?next=/a/../b" is payload, not path)
    rpath = F.regexp_replace(ref_nf, r"\?.*$", "")
    rquery = F.regexp_extract(ref_nf, r"(\?.*)$", 1)
    return (
        F.when(ref_nf == "", base_nf)
        .when(ref_nf.rlike(_SCHEME_PREFIX_RE), ref_nf)
        .when(ref_nf.startswith("//"), F.concat(scheme, F.lit(":"), ref_nf))
        # query-only ref keeps the base path VERBATIM (RFC §5.2.2
        # "T.path = Base.path" — no '/' is invented for an empty path)
        .when(ref_nf.startswith("?"), F.concat(origin, bpath, ref_nf))
        .when(
            ref_nf.startswith("/"),
            F.concat(origin, remove_dot_segments_expr(rpath), rquery),
        )
        .otherwise(
            F.concat(
                origin,
                remove_dot_segments_expr(F.concat(bdir, rpath)),
                rquery,
            )
        )
    )


def resolve_reference(base: str, ref: str | None) -> str:
    """Normative Python kernel: stdlib urljoin with the same
    fragment-dropping crawl semantics as the expression."""
    ref_nf = (ref or "").strip().split("#", 1)[0]
    base_nf = base.split("#", 1)[0]
    if ref_nf == "":
        return base_nf
    return urljoin(base_nf, ref_nf).split("#", 1)[0]
