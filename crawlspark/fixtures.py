"""Deterministic synthetic fixtures (FIXTURES.md): the Common-Crawl-
style ``pages`` table plus seeds / seen0 / politeness / robots.

Everything is a pure function of (seed, scale) — no wall clock, no
network, no global RNG. Page HTML is rendered from templates that
reproduce the exact selector structure the reference parses
(seek_crawler.py:160-235, jora_cralwer.py:217-291,
career_one_crawler.py:1093-1188), with every element-present/absent
branch exercised.

Scales: tiny ≈1k rows (unit/golden tests), small ≈50k (round replay),
bench (generated Spark-side by ``pages_df_bench``) for the scaling run.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
from typing import Iterator

EPOCH = dt.datetime(2024, 3, 2, 0, 0, 0)  # reference crawl window start

SEEK_ROLES = [
    ("data-engineer-jobs", "data engineer"),
    ("AI-Engineer-jobs", "ai engineer"),
    ("Full-Stack-Developer-jobs", "full stack engineer"),
    ("Backend-Developer-jobs", "backend engineer"),
    ("Front-End-Developer-jobs", "frontend engineer"),
    ("DevOps-Engineer-jobs", "devops engineer"),
    ("cyber-security-jobs", "cyber security engineer"),
]
SEEK_LOCS = [("in-All-Sydney-NSW", "sydney"), ("in-Melbourne-VIC-3000", "melbourne")]
JORA_ROLES = [
    ("Data+Engineer", "data engineer"),
    ("AI+Engineer", "ai engineer"),
    ("Full+Stack+Developer", "full stack engineer"),
    ("Backend+Engineer", "backend engineer"),
    ("frontend+developer", "frontend engineer"),
    ("DevOps+Engineer", "devops engineer"),
    ("cyber+security", "cyber security engineer"),
]
JORA_LOCS = [("Sydney+NSW", "sydney"), ("Melbourne+VIC", "melbourne")]

LISTED_DATE_POOL = [
    "30 minutes ago",
    "14 hours ago",
    "3 days ago",
    "1 week ago",
    "2 weeks ago",
    "2 months ago",
    "1 year ago",
    "5d",
    "2w",
    "12m",
    "3h",
    "2024-01-15",
    "just now",          # no digit → NULL (utils.py:94-95)
    "3 fortnights ago",  # digit but unknown unit... 'fortnights' has no
                         # unit keyword; NOTE r"\d+m" etc. don't match
                         # ("3 f...") so C4 yields NULL
]

COMPANIES = [
    "Acme Analytics", "Blue Gum Data", "Cockatoo Cloud", "Dingo Digital",
    "Euca Systems", "Frogmouth Labs", "Galah Computing", "Harbour AI",
    "Ibis Infra", "Jacaranda Tech", "Koala Kode", "Lyrebird Logic",
]
WORDS = (
    "platform pipeline warehouse lakehouse streaming batch governance "
    "terraform python spark airflow kafka snowflake dbt sql nosql api "
    "microservices kubernetes docker observability security compliance "
    "stakeholder agile delivery mentoring architecture scalability"
).split()

SCALES = {
    # (site chains)                      (generic web)
    # n_roles n_locs max_pages max_links  n_hosts n_pages
    "tiny": dict(n_roles=2, n_locs=2, max_pages=3, max_links=8, n_hosts=20, n_generic=600),
    "small": dict(n_roles=7, n_locs=2, max_pages=5, max_links=22, n_hosts=200, n_generic=44000),
}


def h_int(*parts) -> int:
    """Deterministic 64-bit hash of the parts (seed-scoped RNG)."""
    m = hashlib.sha256(("\x1f".join(str(p) for p in parts)).encode()).digest()
    return int.from_bytes(m[:8], "big")


def _warc_ts(seed: int, url: str) -> dt.datetime:
    return EPOCH + dt.timedelta(minutes=h_int(seed, "ts", url) % 100_000)


def _sentence(seed: int, key: str, i: int, n: int = 8) -> str:
    return " ".join(
        WORDS[h_int(seed, key, i, j) % len(WORDS)] for j in range(n)
    ).capitalize()


def _description_html(seed: int, url: str) -> tuple[str, str]:
    """(html_fragment, expected get_text('\\n', strip=True)) for the
    job-description container body. Exercises nested tags, <br>, HTML
    entities and whitespace-only nodes."""
    h = h_int(seed, "desc", url)
    paras = 2 + h % 3
    frags, texts = [], []
    for i in range(paras):
        s1 = _sentence(seed, url + ":p", i)
        s2 = _sentence(seed, url + ":q", i)
        frags.append(f"<p>\n  <strong>{s1}</strong> &amp; more.<br/>\n  {s2}.\n</p>")
        texts += [s1, "& more.", f"{s2}."]
    n_items = 2 + h % 4
    items = [_sentence(seed, url + ":li", i, 4) for i in range(n_items)]
    frags.append(
        "<ul>\n" + "\n".join(f"  <li>{it}</li>" for it in items) + "\n</ul>"
    )
    texts += items
    # requirements sentence — the S13 experience / working-rights
    # extraction targets (deterministic per url; ~1/3 of docs get each
    # shape, 1/3 none so the site defaults stay exercised)
    req = h // 7 % 3
    if req == 0:
        extra = f"Requires {2 + h % 8}+ years experience."
    elif req == 1:
        extra = f"Minimum {1 + h % 5} years experience. Visa sponsorship available."
    else:
        extra = None
    if extra is not None:
        frags.append(f"<p>{extra}</p>")
        texts.append(extra)
    return "\n".join(frags), "\n".join(texts)


# ---------------------------------------------------------------------------
# Seek
# ---------------------------------------------------------------------------


def seek_search_url(role_slug: str, loc_slug: str, page: int) -> str:
    base = f"https://www.seek.com.au/{role_slug}/{loc_slug}"
    return base if page == 1 else f"{base}?page={page}"


def _seek_chain(seed: int, role_slug: str, loc_slug: str, cfg) -> list[tuple[str, bytes, str]]:
    """Search-page chain for one (role, loc): [(url, html, text)]."""
    n_pages = 1 + h_int(seed, "seekchain", role_slug, loc_slug) % cfg["max_pages"]
    out = []
    for p in range(1, n_pages + 1):
        url = seek_search_url(role_slug, loc_slug, p)
        n_links = 1 + h_int(seed, "seeklinks", url) % cfg["max_links"]
        anchors = "".join(
            f'<a href="/job/{h_int(seed, "seekjob", role_slug, loc_slug, p, i) % 10**8}">Job {i}</a>'
            for i in range(n_links)
        )
        hp = h_int(seed, "seekextra", url)
        if hp % 3 == 0:
            # dead link: no page exists → failed fetch + retry (F-K)
            anchors += f'<a href="/job/dead{hp % 10**6}">Job gone</a>'
        if hp % 5 == 0:
            # robots-disallowed link (/apply/ is Disallow'd for seek)
            anchors += f'<a href="/apply/{hp % 10**6}">Apply</a>'
        nxt = (
            f'<li class="y735df0 _1iz8dgsa6 _1iz8dgs9v _1iz8dgsw">'
            f'<a href="/{role_slug}/{loc_slug}?page={p + 1}">Next</a></li>'
            if p < n_pages
            else ""
        )
        html = (
            "<html><body>"
            f'<div class="y735df0 _1iz8dgs4y _1iz8dgs4w">{anchors}</div>'
            f"<ul>{nxt}</ul>"
            "</body></html>"
        )
        out.append((url, html.encode(), f"seek search {role_slug} {loc_slug} p{p}"))
    return out


def _seek_detail(seed: int, url: str) -> tuple[bytes, str]:
    h = h_int(seed, "seekdetail", url)
    role_title = f"{['Junior ', 'Senior ', '', 'Lead ', 'Principal '][h % 5]}{['Data Engineer', 'ML Engineer', 'Platform Engineer', 'Analytics Engineer'][h // 5 % 4]}"
    company = COMPANIES[h % len(COMPANIES)]
    has_company = h % 7 != 0
    n_info = h % 5  # 0..4 "other job info" spans (4 ⇒ salary span too)
    has_listed = h % 5 != 0
    listed = LISTED_DATE_POOL[h % len(LISTED_DATE_POOL)]
    desc_html, desc_text = _description_html(seed, url)
    info_spans = "".join(
        f'<span class="y735df0 _1akoxc50 _1akoxc56">{["Sydney NSW", "Full time", "Engineering - Software", "$120k - $150k"][i]}</span>'
        for i in range(n_info)
    )
    listed_span = (
        f'<span class="y735df0 _1iz8dgs4y _94v4w0 _94v4w1 _94v4w22 _1wzghjf4 _94v4wa">Posted {listed}</span>'
        if has_listed
        else "<span>recently</span>"
    )
    html = (
        "<html><body>"
        f'<h1 data-automation="job-detail-title">{role_title}</h1>'
        + (f'<span data-automation="advertiser-name">{company}</span>' if has_company else "")
        + f"<div>{info_spans}</div>"
        # container div iterated child-by-child by the reference
        # (seek_crawler.py:227) — keep it free of stray text nodes
        + f'<div class="y735df0 _1iz8dgs6y"><div>{listed_span}</div><div><span>views: {h % 997}</span></div></div>'
        + f'<div data-automation="jobAdDetails">\n{desc_html}\n</div>'
        "</body></html>"
    )
    return html.encode(), desc_text


# ---------------------------------------------------------------------------
# Jora
# ---------------------------------------------------------------------------


def jora_search_url(role_q: str, loc_q: str, page: int) -> str:
    base = f"https://au.jora.com/j?sp=homepage&trigger_source=homepage&q={role_q}&l={loc_q}"
    return base if page == 1 else f"{base}&p={page}"


def _jora_chain(seed: int, role_q: str, loc_q: str, cfg) -> list[tuple[str, bytes, str]]:
    n_pages = 1 + h_int(seed, "jorachain", role_q, loc_q) % cfg["max_pages"]
    out = []
    for p in range(1, n_pages + 1):
        url = jora_search_url(role_q, loc_q, p)
        n_links = 1 + h_int(seed, "joralinks", url) % cfg["max_links"]
        anchors = "".join(
            f'<a href="/{h_int(seed, "jorajob", role_q, loc_q, p, i) % 10**8}?token=tk{i}">{_sentence(seed, url, i, 3)}</a>'
            for i in range(n_links)
        )
        nxt_href = f"/j?sp=homepage&trigger_source=homepage&q={role_q}&l={loc_q}&p={p + 1}"
        nxt = (
            f'<div class="multi-pages-pagination pagination-container">'
            f'<a class="next-page-button" href="{nxt_href}">Next</a></div>'
            if p < n_pages
            else ""
        )
        html = (
            "<html><body>"
            f'<div class="jobresults">{anchors}</div>'
            f"{nxt}"
            "</body></html>"
        )
        out.append((url, html.encode(), f"jora search {role_q} {loc_q} p{p}"))
    return out


def _jora_detail(seed: int, url: str) -> tuple[bytes, str]:
    h = h_int(seed, "joradetail", url)
    role_title = f"{['', 'Senior ', 'Graduate ', 'Staff '][h % 4]}{['Data Engineer', 'Backend Developer', 'DevOps Engineer', 'Security Analyst'][h // 4 % 4]}"
    company = COMPANIES[h % len(COMPANIES)]
    loc = ["Sydney NSW", "Melbourne VIC", "Remote AU"][h % 3]
    listed = LISTED_DATE_POOL[h % len(LISTED_DATE_POOL)]
    has_company = h % 6 != 0
    has_loc = h % 8 != 0
    has_badge = h % 5 != 0
    has_listed = h % 9 != 0
    desc_html, desc_text = _description_html(seed, url)
    container = (
        '<div id="job-info-container">'
        f'<h1 class="job-title heading-xxlarge">{role_title}</h1>'
        + (f'<span class="company">{company}</span>' if has_company else "")
        + (f'<span class="location">{loc}</span>' if has_loc else "")
        + (f'<div class="badge -default-badge">{["Full time", "Part time", "Contract"][h % 3]}</div>' if has_badge else "")
        + (f'<span class="listed-date">{listed}</span>' if has_listed else "")
        + "</div>"
    )
    html = (
        "<html><body>"
        + container
        + f'<div id="job-description-container">\n{desc_html}\n</div>'
        "</body></html>"
    )
    return html.encode(), desc_text


# ---------------------------------------------------------------------------
# CareerOne (JSON API pages)
# ---------------------------------------------------------------------------

CAREERONE_HOST = "seeker-api.careerone.com.au"
CAREERONE_ROLES = ["data-engineer", "software-engineer", "devops-engineer"]


def careerone_page_url(role: str, page: int) -> str:
    return f"https://{CAREERONE_HOST}/api/v1/search-job?role={role}&page={page}"


def _careerone_payload(seed: int, role: str, page: int, job_count: int) -> bytes:
    per_page = 20
    start = (page - 1) * per_page
    jobs = []
    for i in range(start, min(start + per_page, job_count)):
        h = h_int(seed, "c1job", role, i)
        job = {
            "job_title": f"{['', 'Senior ', 'Junior '][h % 3]}{['Data Engineer', 'Cloud Engineer', 'Full Stack Developer'][h // 3 % 3]}",
            "company_name": COMPANIES[h % len(COMPANIES)],
            "pay_min_normalised": [85000.0, 110000.0, 1_200_000.0, None][h % 4],
            "pay_max_normalised": [120000.0, 1_500_000.0, None, 95000.0][h // 4 % 4],
            "career_level_label": ["Mid Level", "Senior Level", "Entry Level"][h % 3],
            "date_label": LISTED_DATE_POOL[h % len(LISTED_DATE_POOL)],
            "skills_details": [
                {"value": v}
                for v in ["Python", " python ", "SQL", "AWS", "", "Spark"][: 1 + h % 6]
            ],
        }
        if h % 5 != 0:  # key absent 1-in-5 → default "permanent" (:1165)
            job["contract_type_label"] = ["Permanent", "Contract", "Casual"][h % 3]
        jobs.append(job)
    payload = {
        "search_results": {"job_count": job_count, "jobs": jobs},
        "search_filters": {
            "resultsPerPage": per_page,
            "location": {"region_name": "Sydney", "state_name": "NSW"},
        },
    }
    return json.dumps(payload).encode()


def _careerone_pages(seed: int, cfg) -> list[tuple[str, bytes, str]]:
    out = []
    for role in CAREERONE_ROLES[: max(1, cfg["n_roles"] // 2)]:
        job_count = 20 + h_int(seed, "c1count", role) % (20 * cfg["max_pages"])
        n_pages = job_count // 20 + 1
        for p in range(1, n_pages + 1):
            url = careerone_page_url(role, p)
            out.append((url, _careerone_payload(seed, role, p, job_count), f"careerone {role} p{p}"))
    return out


# ---------------------------------------------------------------------------
# Generic web hosts (Zipf-skewed; canonicalization/politeness fodder)
# ---------------------------------------------------------------------------


def _generic_pages(seed: int, cfg) -> Iterator[tuple[str, bytes, str]]:
    n_hosts, total = cfg["n_hosts"], cfg["n_generic"]
    weights = [1.0 / (i + 1) ** 1.2 for i in range(n_hosts)]
    wsum = sum(weights)
    counts = [max(1, int(total * w / wsum)) for w in weights]
    for i, cnt in enumerate(counts):
        host = f"host{i}.generic.example"
        for j in range(cnt):
            h = h_int(seed, "generic", host, j)
            # a slice of URLs carries canonicalization noise
            noise = h % 10
            if noise == 0:
                url = f"https://{host}:443/a/../page/{j}?utm_source=feed&id={j}"
            elif noise == 1:
                url = f"https://{host.upper()}/page/{j}?id={j}&fbclid=XYZ{j}"
            elif noise == 2:
                url = f"https://{host}/page/%7E{j}?id={j}"
            else:
                url = f"https://{host}/page/{j}?id={j}"
            text = _sentence(seed, url, 0, 12)
            html = f"<html><body><p>{text}</p></body></html>".encode()
            lang = "en" if h % 20 else ("vi" if h % 40 else "zh")
            yield url, html, text, lang


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------


def gen_pages_rows(seed: int = 42, scale: str = "tiny") -> Iterator[dict]:
    """Yields dicts: url, warc_ts, html(bytes), text, lang.

    Includes search chains, every detail page those chains link to,
    CareerOne API pages, and generic-host pages.
    """
    cfg = SCALES[scale]
    emitted: set[str] = set()

    def emit(url, html, text, lang="en"):
        if url in emitted:
            return None
        emitted.add(url)
        return {
            "url": url,
            "warc_ts": _warc_ts(seed, url),
            "html": html,
            "text": text,
            "lang": lang,
        }

    from crawlspark.parsers.seek import extract_seek_links
    from crawlspark.parsers.jora import extract_jora_links

    for role_slug, _ in SEEK_ROLES[: cfg["n_roles"]]:
        for loc_slug, _ in SEEK_LOCS[: cfg["n_locs"]]:
            for url, html, text in _seek_chain(seed, role_slug, loc_slug, cfg):
                row = emit(url, html, text)
                if row:
                    yield row
                detail_urls, _ = extract_seek_links(html)
                for durl in detail_urls:
                    if "/job/dead" in durl or "/apply/" in durl:
                        continue  # dead link / robots-blocked: no page
                    dhtml, dtext = _seek_detail(seed, durl)
                    row = emit(durl, dhtml, dtext)
                    if row:
                        yield row

    for role_q, _ in JORA_ROLES[: cfg["n_roles"]]:
        for loc_q, _ in JORA_LOCS[: cfg["n_locs"]]:
            for url, html, text in _jora_chain(seed, role_q, loc_q, cfg):
                row = emit(url, html, text)
                if row:
                    yield row
                detail_urls, _ = extract_jora_links(html)
                for durl in detail_urls:
                    dhtml, dtext = _jora_detail(seed, durl)
                    row = emit(durl, dhtml, dtext)
                    if row:
                        yield row

    for url, payload, text in _careerone_pages(seed, cfg):
        row = emit(url, payload, text)
        if row:
            yield row

    for url, html, text, lang in _generic_pages(seed, cfg):
        row = emit(url, html, text, lang)
        if row:
            yield row

    # robots.txt bodies rendered from the same rule set robots_rows()
    # declares — so crawlspark.robots.robots_cache_df derived from the
    # pages table is decision-equivalent to the fixture cache
    # (round-trip tested in tests/test_robots.py). These URLs are never
    # linked by any chain, so the frontier/replay contract is untouched.
    for r in robots_rows(seed, scale):
        lines = [
            "# synthetic robots fixture",
            "User-agent: archiver-bot",
            "Disallow: /",
            "",
            "User-agent: *",
        ]
        for rule in r["rules"]:
            verb = "Allow" if rule["allow"] else "Disallow"
            lines.append(f"{verb}: {rule['path_prefix']}")
        if r.get("crawl_delay"):
            lines.append(f"Crawl-delay: {r['crawl_delay']}")
        body = "\n".join(lines) + "\n"
        row = emit(
            f"https://{r['host']}/robots.txt", body.encode(), body, "en"
        )
        if row:
            yield row


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, seed: int = 42, scale: str = "tiny"):
    rows = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
        for r in gen_pages_rows(seed, scale)
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def gen_seeds(scale: str = "tiny") -> list[dict]:
    """Reference seed list: search-entry URLs exactly as the reference
    builds them (seek_crawler.py:190, jora_cralwer.py:250), plus
    CareerOne page-1 probe targets. priority_slot reproduces the
    day%4 × hour rotation (seek_crawler.py:68-135) flattened to a slot
    index; seed_idx is the replay ordering key."""
    cfg = SCALES[scale]
    seeds = []
    idx = 0
    for li, (loc_slug, loc_norm) in enumerate(SEEK_LOCS[: cfg["n_locs"]]):
        for ri, (role_slug, role_norm) in enumerate(SEEK_ROLES[: cfg["n_roles"]]):
            seeds.append(
                dict(
                    url=seek_search_url(role_slug, loc_slug, 1),
                    site="seek",
                    searched_role=role_norm,
                    searched_location=loc_norm,
                    priority_slot=(li * 4 + ri) % 4,
                    seed_idx=idx,
                )
            )
            idx += 1
    for li, (loc_q, loc_norm) in enumerate(JORA_LOCS[: cfg["n_locs"]]):
        for ri, (role_q, role_norm) in enumerate(JORA_ROLES[: cfg["n_roles"]]):
            seeds.append(
                dict(
                    url=jora_search_url(role_q, loc_q, 1),
                    site="jora",
                    searched_role=role_norm,
                    searched_location=loc_norm,
                    priority_slot=(li * 4 + ri) % 4,
                    seed_idx=idx,
                )
            )
            idx += 1
    for ri, role in enumerate(CAREERONE_ROLES[: max(1, cfg["n_roles"] // 2)]):
        seeds.append(
            dict(
                url=careerone_page_url(role, 1),
                site="careerone",
                searched_role=role.replace("-", " "),
                searched_location="sydney",
                priority_slot=ri % 4,
                seed_idx=idx,
            )
        )
        idx += 1
    return seeds


def gen_seen0(seed: int = 42, scale: str = "tiny") -> list[dict]:
    """Warm-start seen set: a deterministic ~30% sample of detail-page
    URLs plus near-miss variants (± tracking params) that must dedup
    only after canonicalization (FIXTURES.md §4)."""
    from crawlspark.urlnorm import canonicalize
    import hashlib as _h

    out = []
    for r in gen_pages_rows(seed, scale):
        u = r["url"]
        if "/job/" not in u and "au.jora.com/job" not in u:
            continue
        hv = h_int(seed, "seen0", u)
        if hv % 10 < 3:
            canon = canonicalize(u)
            out.append(
                dict(
                    url_canon=canon,
                    url_sha2=_h.sha256(canon.encode()).hexdigest(),
                    first_round=-1,
                )
            )
    return out


def politeness_rows() -> list[dict]:
    """Per-host delay/concurrency from the reference sleeps
    (FIXTURES.md §5; seek_crawler.py:178, jora_cralwer.py:235,273,
    career_one_crawler.py:1110; max_active_tis_per_dagrun=4)."""
    return [
        dict(host="www.seek.com.au", delay_s=5.0, max_concurrency=4),
        dict(host="au.jora.com", delay_s=10.0, max_concurrency=4),
        dict(host=CAREERONE_HOST, delay_s=5.0, max_concurrency=4),
    ]


def robots_rows(seed: int = 42, scale: str = "tiny") -> list[dict]:
    """Robots rule cache with overlapping prefixes (longest match must
    win) and a crawl_delay override (FIXTURES.md §6)."""
    cfg = SCALES[scale]
    rows = [
        dict(
            host="www.seek.com.au",
            rules=[
                dict(allow=True, path_prefix="/"),
                dict(allow=False, path_prefix="/apply/"),
            ],
            crawl_delay=None,
            fetched_ts=EPOCH,
        ),
        # jora: everything allowed, crawl_delay overrides politeness
        dict(
            host="au.jora.com",
            rules=[dict(allow=True, path_prefix="/")],
            crawl_delay=8.0,
            fetched_ts=EPOCH,
        ),
    ]
    # a couple of generic hosts with a disallowed subtree
    for i in range(min(3, cfg["n_hosts"])):
        rows.append(
            dict(
                host=f"host{i}.generic.example",
                rules=[
                    dict(allow=True, path_prefix="/"),
                    dict(allow=False, path_prefix="/private/"),
                ],
                crawl_delay=None,
                fetched_ts=EPOCH,
            )
        )
    return rows
