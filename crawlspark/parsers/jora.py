"""Jora page parsers — byte-identical to the reference.

Detail parser reproduces dags/crawler/jora_cralwer.py:276-291. All
lookups are scoped inside div#job-info-container (:278); key insertion
order of job_info is role, company, location, contract_type,
listed_date (:284-288); job_description is
div#job-description-container.get_text(separator='\\n', strip=True)
(:289-291).

Link extractor reproduces :217-241: job links = all <a> under
div.jobresults, absolutized as https://au.jora.com/job{href} (:227);
next pages = a.next-page-button under
div.multi-pages-pagination.pagination-container, absolutized as
https://au.jora.com{href} (:230-236).
"""

from __future__ import annotations

from crawlspark.parsers.htmltext import parse_html

BASE = "https://au.jora.com"


def parse_jora_detail(html: bytes | str) -> tuple[dict, str]:
    """Returns (job_info, job_description)."""
    soup = parse_html(html)
    job_info: dict = {}
    container = soup.find("div", id="job-info-container")
    if container is None:
        # the reference would raise here (None.find); fixtures always
        # include the container — guard keeps malformed pages non-fatal.
        container_find = lambda *a, **k: None  # noqa: E731
    else:
        container_find = container.find
    role_ele = container_find("h1", class_="job-title heading-xxlarge")
    company_ele = container_find("span", class_="company")
    location_ele = container_find("span", class_="location")
    contract_type_ele = container_find("div", class_="badge -default-badge")
    listed_date_ele = container_find("span", class_="listed-date")
    job_info["role"] = role_ele.get_text() if role_ele else ""
    job_info["company"] = company_ele.get_text() if company_ele else ""
    job_info["location"] = location_ele.get_text() if location_ele else ""
    job_info["contract_type"] = contract_type_ele.get_text() if contract_type_ele else ""
    job_info["listed_date"] = listed_date_ele.get_text() if listed_date_ele else ""
    jd_div = soup.find("div", id="job-description-container")
    job_description = jd_div.get_text(separator="\n", strip=True) if jd_div else ""
    return job_info, job_description


def extract_jora_links(html: bytes | str) -> tuple[list[str], list[str]]:
    """Returns (job_detail_urls, next_page_urls) in document order."""
    soup = parse_html(html)
    detail, nxt = [], []
    results_div = soup.find("div", class_="jobresults")
    if results_div:
        for a_tag in results_div.find_all("a"):
            href = a_tag.get("href")
            if href:
                detail.append(f"{BASE}/job{href}")
    pagination = soup.find("div", class_="multi-pages-pagination pagination-container")
    if pagination:
        for btn in pagination.find_all("a", class_="next-page-button"):
            href = btn.get("href")
            if href:
                nxt.append(f"{BASE}{href}")
    return detail, nxt
