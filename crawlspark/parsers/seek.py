"""Seek page parsers — byte-identical to the reference.

Detail parser reproduces dags/crawler/seek_crawler.py:213-235:
  * role     = h1[data-automation=job-detail-title].get_text()      (:214-215)
  * company  = span[data-automation=advertiser-name].get_text()     (:216-217)
  * "other job info" = texts of all span.y735df0 _1akoxc50 _1akoxc56 (:218-225)
  * "listed date" = within div.y735df0 _1iz8dgs6y children, find
    span.y735df0 _1iz8dgs4y _94v4w0 _94v4w1 _94v4w22 _1wzghjf4 _94v4wa
    (last child wins)                                               (:226-230)
  * job_description = div[data-automation=jobAdDetails]
      .get_text(separator='\\n', strip=True)                        (:231-233)

job_info dict insertion order is load-bearing for the byte-identical
combination text (json.dumps preserves it): role, company,
"other job info", then "listed date" only if found (:219-230).

Link extractor reproduces :160-184: job links are all <a href> under
every div.y735df0 _1iz8dgs4y _1iz8dgs4w, absolutized as
https://www.seek.com.au{href} (:169); next-page links are <a href>
under li.y735df0 _1iz8dgsa6 _1iz8dgs9v _1iz8dgsw (:172-179).
"""

from __future__ import annotations

from crawlspark.parsers.htmltext import parse_html

_RESULTS_DIV = "y735df0 _1iz8dgs4y _1iz8dgs4w"
_NEXT_LI = "y735df0 _1iz8dgsa6 _1iz8dgs9v _1iz8dgsw"
_OTHER_INFO_SPAN = "y735df0 _1akoxc50 _1akoxc56"
_LISTED_DATE_DIV = "y735df0 _1iz8dgs6y"
_LISTED_DATE_SPAN = "y735df0 _1iz8dgs4y _94v4w0 _94v4w1 _94v4w22 _1wzghjf4 _94v4wa"

BASE = "https://www.seek.com.au"


def parse_seek_detail(html: bytes | str) -> tuple[dict, str]:
    """Returns (job_info, job_description)."""
    soup = parse_html(html)
    role_ele = soup.find("h1", attrs={"data-automation": "job-detail-title"})
    role = role_ele.get_text() if role_ele else ""
    company_ele = soup.find("span", attrs={"data-automation": "advertiser-name"})
    company = company_ele.get_text() if company_ele else ""
    job_info = {"role": role, "company": company, "other job info": []}
    for info_ele in soup.find_all("span", class_=_OTHER_INFO_SPAN):
        job_info["other job info"].append(info_ele.get_text())
    listed_date_div = soup.find("div", class_=_LISTED_DATE_DIV)
    if listed_date_div is not None:
        # the reference iterates the found div's children and finds the
        # listed-date span in each (last hit wins), seek_crawler.py:227-230
        for child in listed_date_div.element_children():
            listed_date_ele = child.find("span", class_=_LISTED_DATE_SPAN)
            if listed_date_ele:
                job_info["listed date"] = listed_date_ele.get_text()
    jd_ele = soup.find("div", attrs={"data-automation": "jobAdDetails"})
    job_description = jd_ele.get_text(separator="\n", strip=True) if jd_ele else ""
    return job_info, job_description


def extract_seek_links(html: bytes | str) -> tuple[list[str], list[str]]:
    """Returns (job_detail_urls, next_page_urls), absolutized, in
    document order (= the reference's discovery order)."""
    soup = parse_html(html)
    detail, nxt = [], []
    for results_div in soup.find_all("div", class_=_RESULTS_DIV):
        for a_tag in results_div.find_all("a"):
            href = a_tag.get("href")
            if href:
                detail.append(f"{BASE}{href}")
    next_ele = soup.find("li", class_=_NEXT_LI)
    if next_ele:
        for a_tag in next_ele.find_all("a"):
            href = a_tag.get("href")
            if href:
                nxt.append(f"{BASE}{href}")
    return detail, nxt
