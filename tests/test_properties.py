"""Property-based tests (hypothesis) for the normative URL kernels."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pathik_spark.kernels import canonical as K

_host = st.from_regex(r"[a-z]([a-z0-9\-]{0,10}[a-z0-9])?(\.[a-z]{2,6}){1,3}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,4}/?", fullmatch=True)
_query = st.from_regex(r"([a-z_]{1,8}=[A-Za-z0-9]{0,6}&?){0,4}", fullmatch=True)
_frag = st.from_regex(r"[A-Za-z0-9]{0,6}", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    q = draw(_query)
    f = draw(_frag)
    url = f"{scheme}://{host}{port}{path}"
    if q:
        url += "?" + q
    if f:
        url += "#" + f
    return url


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(url):
    once = K.canonicalize_url(url)
    assert once is not None
    assert K.canonicalize_url(once) == once


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_strips_fragment_and_tracking(url):
    canon = K.canonicalize_url(url)
    assert "#" not in canon
    assert "utm_" not in canon.split("?")[-1] if "?" in canon else True
    assert canon.split("://")[0] == canon.split("://")[0].lower()


@given(urls())
@settings(max_examples=200, deadline=None)
def test_sanitize_output_is_filename_safe(url):
    out = K.sanitize_url(url)
    assert len(out) <= 200
    for ch in ':/\\?*"<>| ':
        assert ch not in out
    assert ".." not in out


@given(urls())
@settings(max_examples=200, deadline=None)
def test_domain_name_never_raises_and_nonempty(url):
    out = K.domain_name_for_file(url)
    assert out and "/" not in out


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_kernels_total_on_garbage(s):
    # every kernel is total: never raises on arbitrary input
    K.canonicalize_url(s)
    K.validate_url(s)
    K.domain_name_for_file(s)
    K.sanitize_url(s)


@given(st.binary(max_size=4096))
@settings(max_examples=100, deadline=None)
def test_extractor_total_on_garbage_bytes(b):
    from pathik_spark.kernels import extract as X

    text, md = X.extract_both(b)
    assert isinstance(text, str) and isinstance(md, str)
    # determinism
    assert X.extract_both(b) == (text, md)


@given(st.binary(max_size=4096))
@settings(max_examples=100, deadline=None)
def test_metadata_and_anchors_total_on_garbage_bytes(b):
    from pathik_spark.kernels import extract as X

    meta = X.extract_metadata(b)
    assert isinstance(meta, tuple) and len(meta) == 4
    assert all(isinstance(v, str) for v in meta[:3]) and isinstance(meta[3], int)
    assert meta[3] >= 0
    pairs = X.extract_anchors(b, "https://h.example/base")
    assert all(
        isinstance(u, str) and isinstance(t, str) and u.split(":", 1)[0].lower() in ("http", "https")
        for u, t in pairs
    )
    # determinism
    assert X.extract_metadata(b) == meta
    assert X.extract_anchors(b, "https://h.example/base") == pairs
