"""Canonicalizer property + example tests (SURVEY §5.4).

The canonicalizer upgrades the reference's raw-string URL-seen set
(dags/crawler/seek_crawler.py:196) per the north rule: RFC-3986
normalization + tracking-param strip.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.urlnorm import canonicalize, host_of, path_after_host

CASES = {
    # scheme + host lowercase
    "HTTPS://WWW.Seek.com.au/Job/123": "https://www.seek.com.au/Job/123",
    # default port strip
    "https://host0.generic.example:443/page/1?id=1": "https://host0.generic.example/page/1?id=1",
    "http://example.com:80/x": "http://example.com/x",
    "http://example.com:8080/x": "http://example.com:8080/x",
    # dot segments (RFC 3986 §5.2.4)
    "https://h.example/a/../page/7": "https://h.example/page/7",
    "https://h.example/a/./b": "https://h.example/a/b",
    "https://h.example/../x": "https://h.example/x",
    # percent normalization: unreserved decoded, rest uppercased
    "https://h.example/page/%7e9": "https://h.example/page/~9",
    "https://h.example/p%2fq": "https://h.example/p%2Fq",
    # tracking params stripped, others kept in order
    "https://h.example/p?utm_source=feed&id=3&fbclid=X": "https://h.example/p?id=3",
    "https://h.example/p?gclid=1&a=2&b=3": "https://h.example/p?a=2&b=3",
    # fragment dropped; empty path → /
    "https://h.example?x=1#frag": "https://h.example/?x=1",
    "https://h.example": "https://h.example/",
}


def test_examples():
    for raw, want in CASES.items():
        assert canonicalize(raw) == want, raw


def test_null_and_empty():
    assert canonicalize(None) is None
    assert canonicalize("") == ""


url_strategy = st.builds(
    lambda scheme, host, path, query, frag: (
        f"{scheme}://{host}{path}"
        + (f"?{query}" if query else "")
        + (f"#{frag}" if frag else "")
    ),
    scheme=st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
    host=st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.-]{0,20}\.example", fullmatch=True),
    path=st.from_regex(r"(/[A-Za-z0-9._~%!$&'()*+,;=:@-]{0,8}){0,4}", fullmatch=True),
    query=st.from_regex(r"([a-z_]{1,8}=[A-Za-z0-9]{0,6}&?){0,3}", fullmatch=True),
    frag=st.text(string.ascii_lowercase, max_size=5),
)


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_idempotent(url):
    c1 = canonicalize(url)
    assert canonicalize(c1) == c1


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_no_tracking_params_survive(url):
    c = canonicalize(url)
    if "?" in c:
        for kv in c.split("?", 1)[1].split("&"):
            name = kv.split("=", 1)[0].lower()
            assert not name.startswith("utm_")
            assert name not in {"gclid", "fbclid", "msclkid"}


def test_host_and_path_helpers():
    assert host_of("https://WWW.Seek.com.au/job/1") == "www.seek.com.au"
    assert path_after_host("https://www.seek.com.au/job/1?x=2") == "/job/1?x=2"
    assert path_after_host("https://www.seek.com.au") == "/"
    assert host_of(None) == ""


def test_spark_udf_matches_pure(spark):
    """attach_canonical (Arrow UDF) must agree with the pure function —
    the simulator uses the pure function, the engine the UDF."""
    urls = list(CASES) + [
        "https://au.jora.com/job/123?token=tk1",
        "https://HOST3.GENERIC.EXAMPLE/page/5?id=5&fbclid=Z",
    ]
    from crawlspark.urlnorm import attach_canonical

    df = attach_canonical(
        spark.createDataFrame([(u,) for u in urls], "url string")
    )
    for r in df.collect():
        assert r["url_canon"] == canonicalize(r["url"])
        assert r["host"] == host_of(r["url"])
        assert r["path_q"] == path_after_host(r["url"])
