"""Generate the pinned golden extraction artifacts (FIXTURES.md §7).

Run once at authoring time (``python tests/gen_golden.py``); output is
committed. Golden = the exact ``combination_text`` bytes the reference
pipeline would land in S3 per URL (``url: {url}\\n\\n{json.dumps(
job_info)}\\n\\n{job_description}``, dags/utils.py:137), produced by
the pure-Python parser cores whose semantics are documented against
the reference parsers (SURVEY §2.3). The pytest suite then asserts
both the pure parsers AND the Spark pandas-UDF path keep reproducing
these bytes — any drift in either layer fails the suite.
"""

from __future__ import annotations

import hashlib
import json
import os

from crawlspark.fixtures import gen_pages_rows
from crawlspark.parsers.careerone import parse_careerone_page
from crawlspark.parsers.jora import parse_jora_detail
from crawlspark.parsers.seek import parse_seek_detail

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
N_PER_SITE = 30


def combination_text(url: str, job_info: dict, job_description: str) -> str:
    return f"url: {url}\n\n{json.dumps(job_info)}\n\n{job_description}"


def main() -> None:
    os.makedirs(os.path.join(GOLDEN_DIR, "extracted"), exist_ok=True)
    index = []
    counts = {"seek": 0, "jora": 0}
    c1_pages = []
    for row in gen_pages_rows(42, "tiny"):
        url, html = row["url"], row["html"]
        if "seek.com.au/job/" in url and counts["seek"] < N_PER_SITE:
            site, parse = "seek", parse_seek_detail
            counts["seek"] += 1
        elif "au.jora.com/job/" in url and counts["jora"] < N_PER_SITE:
            site, parse = "jora", parse_jora_detail
            counts["jora"] += 1
        elif "careerone.com.au" in url and len(c1_pages) < 5:
            c1_pages.append(
                {"url": url, "jobs": parse_careerone_page(html)}
            )
            continue
        else:
            continue
        job_info, job_description = parse(html)
        text = combination_text(url, job_info, job_description)
        name = hashlib.sha256(url.encode()).hexdigest() + ".txt"
        with open(os.path.join(GOLDEN_DIR, "extracted", name), "wb") as f:
            f.write(text.encode("utf-8"))
        index.append({"url": url, "site": site, "file": name})
    with open(os.path.join(GOLDEN_DIR, "index.json"), "w") as f:
        json.dump(index, f, indent=1)
    with open(os.path.join(GOLDEN_DIR, "careerone_pages.json"), "w") as f:
        json.dump(c1_pages, f, indent=1)
    print(f"wrote {len(index)} golden texts + {len(c1_pages)} careerone pages")


if __name__ == "__main__":
    main()
