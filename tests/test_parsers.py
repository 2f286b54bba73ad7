"""Byte-identical extraction tests (SURVEY §5.1) + HTML text-semantics
unit tests for the stdlib selector engine.

Golden files are pinned output of the pure-Python parser cores
(tests/gen_golden.py); this suite asserts

1. the selector engine's bs4-compatible semantics on handcrafted HTML,
2. the pure parsers still reproduce the pinned bytes, and
3. the Spark pandas-UDF path (``parse_detail_udf``) reproduces the
   SAME bytes per URL — the north rule's per-row invariant.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from crawlspark.parsers.careerone import page_count, parse_careerone_page
from crawlspark.parsers.htmltext import parse_html
from crawlspark.parsers.jora import parse_jora_detail
from crawlspark.parsers.seek import parse_seek_detail

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _index():
    with open(os.path.join(GOLDEN_DIR, "index.json")) as f:
        return json.load(f)


def _golden_bytes(name: str) -> bytes:
    with open(os.path.join(GOLDEN_DIR, "extracted", name), "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# 1. selector-engine semantics (bs4 contract, SURVEY §2.3)
# ---------------------------------------------------------------------------


def test_get_text_plain_concatenates_raw():
    soup = parse_html("<div><b>A</b> and <i>B</i></div>")
    assert soup.find("div").get_text() == "A and B"


def test_get_text_separator_strip():
    html = "<div>\n  <p>\n    <strong>One</strong> &amp; two.<br/>\n    three.\n  </p>\n  <ul>\n    <li>item</li>\n  </ul>\n</div>"
    assert (
        parse_html(html).find("div").get_text(separator="\n", strip=True)
        == "One\n& two.\nthree.\nitem"
    )


def test_entities_decoded():
    assert parse_html("<p>a &lt;b&gt; &quot;c&quot;</p>").find("p").get_text() == 'a <b> "c"'


def test_br_contributes_no_text():
    assert parse_html("<p>a<br>b</p>").find("p").get_text() == "ab"


def test_multiclass_exact_match():
    html = (
        '<span class="y735df0 _1akoxc50 _1akoxc56">yes</span>'
        '<span class="y735df0 _1akoxc50 _1akoxc56 extra">no</span>'
        '<span class="_1akoxc50">single</span>'
    )
    soup = parse_html(html)
    found = soup.find_all("span", class_="y735df0 _1akoxc50 _1akoxc56")
    assert [e.get_text() for e in found] == ["yes"]
    # single-class matches membership
    assert len(soup.find_all("span", class_="_1akoxc50")) == 3


def test_find_attrs_and_id():
    html = '<h1 data-automation="job-detail-title">T</h1><div id="x">D</div>'
    soup = parse_html(html)
    assert soup.find("h1", attrs={"data-automation": "job-detail-title"}).get_text() == "T"
    assert soup.find("div", id="x").get_text() == "D"
    assert soup.find("div", id="y") is None


def test_document_order():
    soup = parse_html('<div class="a"><a href="/1">1</a><a href="/2">2</a></div><div class="a"><a href="/3">3</a></div>')
    hrefs = [a.get("href") for d in soup.find_all("div", class_="a") for a in d.find_all("a")]
    assert hrefs == ["/1", "/2", "/3"]


# ---------------------------------------------------------------------------
# 2. pure parsers vs pinned goldens
# ---------------------------------------------------------------------------


def test_pure_parsers_match_golden(tiny_pages_dict):
    idx = _index()
    assert len(idx) >= 50
    for entry in idx:
        html = tiny_pages_dict[entry["url"]]
        parse = parse_seek_detail if entry["site"] == "seek" else parse_jora_detail
        job_info, job_description = parse(html)
        text = f"url: {entry['url']}\n\n{json.dumps(job_info)}\n\n{job_description}"
        assert text.encode("utf-8") == _golden_bytes(entry["file"]), entry["url"]


def test_careerone_pages_match_golden(tiny_pages_dict):
    with open(os.path.join(GOLDEN_DIR, "careerone_pages.json")) as f:
        for page in json.load(f):
            got = parse_careerone_page(tiny_pages_dict[page["url"]])
            assert got == page["jobs"], page["url"]


def test_careerone_page_count(tiny_pages_dict):
    for url, html in tiny_pages_dict.items():
        if "careerone.com.au" in url:
            n = page_count(html)
            jc = json.loads(bytes(html))["search_results"]["job_count"]
            assert n == jc // 20 + 1
            break
    else:
        pytest.fail("no careerone page in fixtures")


# ---------------------------------------------------------------------------
# 3. Spark pandas-UDF path — byte-identical per URL
# ---------------------------------------------------------------------------


def test_udf_matches_golden(spark, tiny_pages, tiny_pages_dict):
    from crawlspark.parsers.udfs import parse_detail_udf

    idx = _index()
    urls = {e["url"]: e for e in idx}
    sel = spark.createDataFrame(
        [(e["url"], e["site"]) for e in idx], "url string, site string"
    )
    df = tiny_pages.join(sel, "url").withColumn(
        "_p", parse_detail_udf(F.col("site"), F.col("url"), F.col("html"))
    ).select("url", F.col("_p.combination_text").alias("ct"))
    rows = df.collect()
    assert len(rows) == len(idx)
    for r in rows:
        want = _golden_bytes(urls[r["url"]]["file"])
        assert r["ct"].encode("utf-8") == want, r["url"]


def test_careerone_column_extraction_matches_pure(spark, tiny_pages):
    """E5 as from_json column expressions must agree with the pure
    parser on every careerone page field the warehouse consumes."""
    from crawlspark.parsers.udfs import careerone_jobs_col

    c1 = tiny_pages.filter(F.col("url").contains("careerone.com.au"))
    jobs = c1.select(
        "url", F.posexplode(careerone_jobs_col(F.col("html"))).alias("i", "job")
    ).select("url", "i", "job.*").collect()
    got = {}
    for r in jobs:
        got.setdefault(r["url"], []).append(r)
    pages = {r["url"]: bytes(r["html"]) for r in c1.select("url", "html").collect()}
    assert got
    for url, rows in got.items():
        pure = parse_careerone_page(pages[url])
        assert len(rows) == len(pure)
        for r, p in zip(sorted(rows, key=lambda x: x["i"]), pure):
            assert r["role"] == p["role"]
            assert r["company"] == p["company"]
            assert r["min_salary"] == p["min_salary"]
            assert r["max_salary"] == p["max_salary"]
            assert r["location"] == p["location"]
            assert r["listed_date_raw"] == p["listed_date"]
            assert r["contract_type_raw"] == p["contract_type"]
            assert list(r["skills"]) == p["skills"]
