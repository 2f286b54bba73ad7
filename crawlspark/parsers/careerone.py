"""CareerOne API-page extractor — reproduces the field plucks of
dags/crawler/career_one_crawler.py:1129-1188 over the JSON the search
API returns (:1114-1124).

Per job object:
  * role        = job["job_title"]                     (:1156)
  * company     = job["company_name"]                  (:1157)
  * min/max     = pay_min_normalised / pay_max_normalised (:1158-1159)
  * location    = f"{region_name} {state_name}" from search_filters.location
                  (:1117,1155,1160,1170)
  * listed_date = job["date_label"] (relative, converted later) (:1143-1147,1162)
  * contract    = job["contract_type_label"] default "permanent" (:1165)
  * job_type    = "on-site" hardcoded                   (:1164)
  * skills      = [s["value"] for s in job["skills_details"] if value] (:1134-1141)

Page-count math (:1093-1102): pages = job_count // resultsPerPage + 1,
fetched as pages 1..pages-1 (range(1, number_of_pages), :1109 — page 0
of the range is skipped, faithfully).

This extractor is pure JSON → columns; the Spark path uses
``from_json`` + native expressions (no UDF).
"""

from __future__ import annotations

import json

CAREERONE_JSON_SCHEMA = """
    STRUCT<
      search_results: STRUCT<
        job_count: BIGINT,
        jobs: ARRAY<STRUCT<
          job_title: STRING,
          company_name: STRING,
          pay_min_normalised: DOUBLE,
          pay_max_normalised: DOUBLE,
          career_level_label: STRING,
          contract_type_label: STRING,
          date_label: STRING,
          skills_details: ARRAY<STRUCT<value: STRING>>
        >>
      >,
      search_filters: STRUCT<
        resultsPerPage: BIGINT,
        location: STRUCT<region_name: STRING, state_name: STRING>
      >
    >
"""


def get_skills(job: dict) -> list[str]:
    """career_one_crawler.py:1134-1141 — falsy values dropped."""
    out = []
    for skill in job.get("skills_details", []) or []:
        value = skill.get("value", "")
        if value:
            out.append(value)
    return out


def parse_careerone_page(payload: bytes | str) -> list[dict]:
    """Pure-Python core (simulator/golden oracle)."""
    if isinstance(payload, (bytes, bytearray)):
        payload = payload.decode("utf-8")
    data = json.loads(payload)
    location = data.get("search_filters", {}).get("location", {}) or {}
    city = location.get("region_name", "")
    state = location.get("state_name", "")
    jobs = data.get("search_results", {}).get("jobs", []) or []
    out = []
    for job in jobs:
        out.append(
            {
                "role": job.get("job_title"),
                "company": job.get("company_name"),
                "min_salary": job.get("pay_min_normalised"),
                "max_salary": job.get("pay_max_normalised"),
                "location": f"{city} {state}",
                "listed_date": job.get("date_label", ""),
                "career_levels": job.get("career_level_label", []),
                "contract_type": job.get("contract_type_label", "permanent"),
                "job_type": "on-site",
                "skills": get_skills(job),
            }
        )
    return out


def page_count(payload: bytes | str) -> int:
    """career_one_crawler.py:1093-1102."""
    if isinstance(payload, (bytes, bytearray)):
        payload = payload.decode("utf-8")
    data = json.loads(payload)
    result_per_page = data.get("search_filters", {}).get("resultsPerPage", 0)
    job_count = data.get("search_results", {}).get("job_count", 0)
    if result_per_page and job_count:
        return job_count // result_per_page + 1
    return 0
