"""Arrow-batched pandas UDFs wrapping the pure-Python parser cores.

These are the ONLY places per-page Python runs in the engine, and they
run Arrow-batched inside executors (no per-row Python at the plan
level, per the north rule). Two UDFs:

* ``extract_links(site, html) -> struct<detail:array<string>,
  next:array<string>>`` — search-page link extraction (reference DFS
  body, seek_crawler.py:160-184 / jora_cralwer.py:217-241).

* ``parse_detail(site, url, html) -> struct<...>`` — detail-page
  extraction. ``combination_text`` is assembled *inside* the UDF with
  ``json.dumps`` so it is byte-identical to the reference
  (dags/utils.py:137 — Python dict-insertion order + ``", "``/``": "``
  separators, which Spark's ``to_json`` cannot reproduce).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from crawlspark.parsers.careerone import parse_careerone_page
from crawlspark.parsers.jora import extract_jora_links, parse_jora_detail
from crawlspark.parsers.seek import extract_seek_links, parse_seek_detail

LINKS_SCHEMA = StructType(
    [
        StructField("detail", ArrayType(StringType())),
        StructField("next", ArrayType(StringType())),
    ]
)

DETAIL_SCHEMA = StructType(
    [
        StructField("job_info_json", StringType()),
        StructField("job_description", StringType()),
        StructField("combination_text", StringType()),
        StructField("role", StringType()),
        StructField("company", StringType()),
        StructField("location", StringType()),
        StructField("contract_type_raw", StringType()),
        StructField("listed_date_raw", StringType()),
    ]
)


def _links_one(site: str, html) -> dict:
    if html is None:
        return {"detail": [], "next": []}
    if site == "seek":
        detail, nxt = extract_seek_links(html)
    elif site == "jora":
        detail, nxt = extract_jora_links(html)
    else:
        detail, nxt = [], []
    return {"detail": detail, "next": nxt}


def _parse_one(site: str, url: str, html) -> dict:
    empty = {f.name: None for f in DETAIL_SCHEMA.fields}
    if html is None:
        return empty
    if site == "seek":
        job_info, job_description = parse_seek_detail(html)
        # jora-path post-fill keys (jora_job_description_extraction.py:201-205)
        # read "location"/"contract_type"/"listed_date"; the seek job_info
        # has none of those and carries "listed date" (with a space), so
        # they resolve to "" — faithful.
        role = job_info.get("role", "")
        company = job_info.get("company", "")
        location = ""
        contract_type = ""
        listed_date = ""
    elif site == "jora":
        job_info, job_description = parse_jora_detail(html)
        role = job_info.get("role", "")
        company = job_info.get("company", "")
        location = job_info.get("location", "")
        contract_type = job_info.get("contract_type", "")
        listed_date = job_info.get("listed_date", "")
    elif site == "generic":
        # engine extension beyond the reference's site parsers: generic
        # Common-Crawl pages get whole-document text extraction with
        # the same get_text('\n', strip=True) semantics the site
        # parsers use — every fetched page is parsed, none passed
        # through raw.
        from crawlspark.parsers.htmltext import parse_html

        job_info = {}
        job_description = parse_html(html).get_text(separator="\n", strip=True)
        role = company = location = contract_type = listed_date = ""
    else:
        return empty
    job_info_json = json.dumps(job_info)
    # byte-identical artifact text, dags/utils.py:137
    combination_text = f"url: {url}\n\n{job_info_json}\n\n{job_description}"
    return {
        "job_info_json": job_info_json,
        "job_description": job_description,
        "combination_text": combination_text,
        "role": role,
        "company": company,
        "location": location,
        "contract_type_raw": contract_type,
        "listed_date_raw": listed_date,
    }


@F.pandas_udf(LINKS_SCHEMA)
def extract_links_udf(site: pd.Series, html: pd.Series) -> pd.DataFrame:
    rows = [_links_one(s, h) for s, h in zip(site, html)]
    return pd.DataFrame(rows, columns=["detail", "next"])


@F.pandas_udf(DETAIL_SCHEMA)
def parse_detail_udf(
    site: pd.Series, url: pd.Series, html: pd.Series
) -> pd.DataFrame:
    rows = [_parse_one(s, u, h) for s, u, h in zip(site, url, html)]
    return pd.DataFrame(rows, columns=[f.name for f in DETAIL_SCHEMA.fields])


def careerone_jobs_col(html_col):
    """CareerOne extraction as pure Column expressions (no UDF): the
    page payload is JSON, so ``from_json`` + ``explode`` suffices
    (SURVEY §2.3 E5; career_one_crawler.py:1129-1188). Returns a Column
    of array<struct> ready to explode; null contract_type_label →
    'permanent' (the reference's dict-default at :1165)."""
    from crawlspark.parsers.careerone import CAREERONE_JSON_SCHEMA

    parsed = F.from_json(html_col.cast("string"), CAREERONE_JSON_SCHEMA)
    loc = parsed["search_filters"]["location"]
    location = F.concat_ws(
        " ",
        F.coalesce(loc["region_name"], F.lit("")),
        F.coalesce(loc["state_name"], F.lit("")),
    )
    return F.transform(
        parsed["search_results"]["jobs"],
        lambda j: F.struct(
            j["job_title"].alias("role"),
            j["company_name"].alias("company"),
            j["pay_min_normalised"].alias("min_salary"),
            j["pay_max_normalised"].alias("max_salary"),
            location.alias("location"),
            F.coalesce(j["date_label"], F.lit("")).alias("listed_date_raw"),
            F.coalesce(j["contract_type_label"], F.lit("permanent")).alias(
                "contract_type_raw"
            ),
            F.filter(
                F.transform(
                    F.coalesce(j["skills_details"], F.array()),
                    lambda s: s["value"],
                ),
                lambda v: v.isNotNull() & (v != ""),
            ).alias("skills"),
        ),
    )
