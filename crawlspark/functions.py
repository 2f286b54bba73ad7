"""Scalar function library (SURVEY §2.4 C1-C16) as native Column
expressions — no UDFs, so everything stays inside whole-stage codegen.

Each function documents the reference behavior it reproduces
(file:line), including the reference's *bugs*, which are reproduced
faithfully where they are observable in output:

* the pydantic pre-validators for min/max salary, contract_type and
  job_type read ``values.get("<field being validated>")``, which is
  never present in pydantic-v1 ``values`` (only previously-validated
  fields are), so their "is it already valid?" checks always see None
  — see ``salary_exprs`` / constants below
  (dags/jora_job_description_extraction.py:47-77).

For every expression there is a twin ``*_sql`` generator emitting the
equivalent ANSI SQL (used by the DuckDB oracle in tests and
``__spark_entry__.oracle_sql``), built from the same keyword tables so
the two cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# C1 hash_string: sha-256 hexdigest (dags/utils.py:43-54)
# ---------------------------------------------------------------------------


def sha256_hex(col: Column) -> Column:
    return F.sha2(col, 256)


# ---------------------------------------------------------------------------
# C2 normalize_text: lower().strip(), None/"" passthrough (dags/utils.py:37-40)
# ---------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    return F.lower(F.trim(col))


def normalize_text_sql(c: str) -> str:
    return f"lower(trim({c}))"


# ---------------------------------------------------------------------------
# C3 is_valid_date_format (dags/utils.py:64-67)
# ---------------------------------------------------------------------------

DATE_RE = r"^\d{4}-\d{2}-\d{2}$"


def is_valid_date_format(col: Column) -> Column:
    return col.rlike(DATE_RE)


# ---------------------------------------------------------------------------
# C4 convert_listed_date_to_dateformat (dags/utils.py:70-95)
#
# Relative "listed date" strings ("3 days ago", "2w", "14 hours ago")
# → ISO date. The reference anchors at wall-clock now(); we anchor at a
# caller-provided timestamp column (warc_ts) for determinism (SURVEY §7
# hard part 3). Unit-branch order is load-bearing and copied exactly:
# minute (or \d+m) → hour (\d+h) → day (\d+d) → week (\d+w) → month →
# year (\d+y); unknown unit → NULL; no digits → NULL; already
# YYYY-MM-DD → passthrough.
# ---------------------------------------------------------------------------


def convert_listed_date(col: Column, anchor: Column) -> Column:
    num = F.regexp_extract(col, r"(\d+)", 1)
    n = num.cast("int")
    has = num != ""

    def fmt(ts: Column) -> Column:
        return F.date_format(ts, "yyyy-MM-dd")

    minute = col.contains("minute") | col.rlike(r"\d+m")
    hour = col.contains("hour") | col.rlike(r"\d+h")
    day = col.contains("day") | col.rlike(r"\d+d")
    week = col.contains("week") | col.rlike(r"\d+w")
    month = col.contains("month")
    year = col.contains("year") | col.rlike(r"\d+y")

    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(col.rlike(DATE_RE), col)
        .when(~has, F.lit(None).cast("string"))
        .when(minute, fmt(anchor - F.make_interval(mins=n)))
        .when(hour, fmt(anchor - F.make_interval(hours=n)))
        .when(day, fmt(anchor - F.make_interval(days=n)))
        .when(week, fmt(anchor - F.make_interval(weeks=n)))
        .when(month, fmt(F.add_months(anchor, -n)))
        .when(year, fmt(F.add_months(anchor, -n * 12)))
        .otherwise(F.lit(None).cast("string"))
    )


def convert_listed_date_sql(c: str, anchor: str) -> str:
    """DuckDB-flavored twin of convert_listed_date."""
    num = f"CAST(regexp_extract({c}, '(\\d+)', 1) AS INT)"
    has = f"regexp_extract({c}, '(\\d+)', 1) <> ''"
    return f"""CASE
      WHEN {c} IS NULL THEN NULL
      WHEN regexp_matches({c}, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$') THEN {c}
      WHEN NOT ({has}) THEN NULL
      WHEN {c} LIKE '%minute%' OR regexp_matches({c}, '\\d+m')
        THEN strftime({anchor} - to_minutes({num}), '%Y-%m-%d')
      WHEN {c} LIKE '%hour%' OR regexp_matches({c}, '\\d+h')
        THEN strftime({anchor} - to_hours({num}), '%Y-%m-%d')
      WHEN {c} LIKE '%day%' OR regexp_matches({c}, '\\d+d')
        THEN strftime({anchor} - to_days({num}), '%Y-%m-%d')
      WHEN {c} LIKE '%week%' OR regexp_matches({c}, '\\d+w')
        THEN strftime({anchor} - to_days({num} * 7), '%Y-%m-%d')
      WHEN {c} LIKE '%month%'
        THEN strftime({anchor} - to_months({num}), '%Y-%m-%d')
      WHEN {c} LIKE '%year%' OR regexp_matches({c}, '\\d+y')
        THEN strftime({anchor} - to_months({num} * 12), '%Y-%m-%d')
      ELSE NULL END"""


# ---------------------------------------------------------------------------
# C5 get_level_from_role (dags/utils.py:17-35): first-match keyword
# ladder over the normalized role; "" → ""; default "mid-level".
# ---------------------------------------------------------------------------

LEVEL_LADDER: list[tuple[tuple[str, ...], str]] = [
    (("junior",), "junior"),
    (("midlevel", "mid-level"), "mid-level"),  # either substring
    (("senior",), "senior"),
    (("staff",), "staff"),
    (("principal",), "principal"),
    (("lead",), "lead"),
    (("head",), "head"),
]


def level_from_role(col: Column) -> Column:
    norm = normalize_text(col)
    expr = F.when(col.isNull() | (norm == ""), F.lit(""))
    for keywords, level in LEVEL_LADDER:
        cond = None
        for kw in keywords:
            c = norm.contains(kw)
            cond = c if cond is None else (cond | c)
        expr = expr.when(cond, F.lit(level))
    return expr.otherwise(F.lit("mid-level"))


def level_from_role_sql(c: str) -> str:
    norm = normalize_text_sql(c)
    whens = [f"WHEN {c} IS NULL OR {norm} = '' THEN ''"]
    for keywords, level in LEVEL_LADDER:
        cond = " OR ".join(f"{norm} LIKE '%{kw}%'" for kw in keywords)
        whens.append(f"WHEN {cond} THEN '{level}'")
    return "CASE " + " ".join(whens) + " ELSE 'mid-level' END"


# ---------------------------------------------------------------------------
# C6 categorize_it_role (dags/utils.py:277-439): two-pass keyword table,
# dict-insertion-order-sensitive; every list is an AND of substring
# matches against role.lower(); first hit wins; fallback table; else
# "uncategorized". Tables copied verbatim (they are the public
# semantics of the operator).
# ---------------------------------------------------------------------------

ROLE_CATEGORIES_PASS1: list[tuple[str, list[list[str]]]] = [
    ("data engineer", [["data", "engineer"], ["data", "governance"], ["snowflake"], ["hadoop"]]),
    ("ai engineer", [["ai"], ["ml"], ["machine", "learning"], ["computer vision"], ["computer-vision"], ["nlp"]]),
    ("data analyst", [["data", "analyst"], ["finance", "data"], ["digital"], ["bi"], ["visualization"], ["business"], ["analytics"]]),
    ("data scientist", [["scientist"]]),
    ("backend engineer", [["backend"], ["back end"], ["software", "engineer"], ["c#"], ["python"], ["java"], [".net"], ["go lang"], ["golang"], ["api"], ["compiler"], ["c++"], ["back-end"], ["back - end"], ["php"]]),
    ("frontend engineer", [["frontend"], ["angular"], ["front end"], ["react"], ["front", "end"]]),
    ("fullstack engineer", [["fullstack"], ["full stack"], ["javascript"], ["web"], ["node"], ["full-stack"]]),
    ("devops engineer", [["aws"], ["azure"], ["gcp"], ["devops"], ["cloud"], ["infrastructure"], ["platform"], ["network"], ["system"], ["integration"], ["dev", "ops"], ["sysops"], ["sys", "ops"], ["devsecops"], ["integrity"], ["kubernetes"], ["splunk"], ["site reliability engineer"]]),
    ("cyber security engineer", [["security"], ["fraud"], ["cyber"], ["risk"]]),
    ("qa/qc engineer", [["test"], ["qa"], ["qc"]]),
    ("data architect", [["architect"], ["architecture"]]),
    ("recruiter", [["recruitment"]]),
    ("database engineer", [["oracle"], ["postgres"], ["mysql"]]),
    ("designer", [["design"], ["graphic"], ["ux/ui"]]),
    ("ios engineer", [["ios"]]),
    ("android engineer", [["android"]]),
    ("project manager", [["project", "manager"]]),
]

ROLE_CATEGORIES_PASS2: list[tuple[str, list[list[str]]]] = [
    ("data engineer", [["data"], ["etl"], ["elt"]]),
    ("backend engineer", [["developer"], ["engineering"], ["senior engineer"], ["lead engineer"], ["principal engineer"], ["technology"], ["technical"], ["software", "development"], ["tech lead"], ["programmer"], ["endpoint"], ["staff engineer"], ["software"], ["programmer"]]),
    ("data analyst", [["analyst"]]),
    ("ai engineer", [["research engineer"]]),
    ("designer", [["ui"], ["ux"]]),
]


def categorize_it_role(col: Column) -> Column:
    low = F.lower(col)
    expr = None
    for table in (ROLE_CATEGORIES_PASS1, ROLE_CATEGORIES_PASS2):
        for category, substr_lists in table:
            for words in substr_lists:
                cond = None
                for w in words:
                    c = low.contains(w.lower())
                    cond = c if cond is None else (cond & c)
                expr = (
                    F.when(cond, F.lit(category))
                    if expr is None
                    else expr.when(cond, F.lit(category))
                )
    return expr.otherwise(F.lit("uncategorized"))


def _sql_like_escape(w: str) -> str:
    return w.replace("'", "''").replace("%", "\\%").replace("_", "\\_")


def categorize_it_role_sql(c: str) -> str:
    low = f"lower({c})"
    whens = []
    for table in (ROLE_CATEGORIES_PASS1, ROLE_CATEGORIES_PASS2):
        for category, substr_lists in table:
            for words in substr_lists:
                cond = " AND ".join(
                    f"contains({low}, '{_sql_like_escape(w.lower())}')" for w in words
                )
                whens.append(f"WHEN {cond} THEN '{category}'")
    return "CASE " + " ".join(whens) + " ELSE 'uncategorized' END"


# ---------------------------------------------------------------------------
# C10 salary validation — faithful to the pydantic-v1 pre-validators at
# dags/jora_job_description_extraction.py:47-65 (dup at
# seek_job_description_extraction.py). Because ``values`` never contains
# the field being validated, the actual semantics are:
#
#   min_out = CASE WHEN salary IS NOT NULL AND salary < 1e6 THEN salary
#                  WHEN salary IS NOT NULL THEN NULL       -- salary ≥ 1e6
#                  ELSE min_raw END                        -- no clamp!
#   max_out = CASE WHEN salary IS NOT NULL AND salary < 1e6 THEN salary
#                  WHEN min_out IS NOT NULL AND min_out < 1e6 THEN min_out
#                  ELSE max_raw END
#
# post_salary_validator (:79-81, called only on the jora/seek path at
# :208): min := max when min is NULL and max is not.
# ---------------------------------------------------------------------------

SALARY_CAP = 1_000_000


def salary_exprs(
    min_raw: Column, max_raw: Column, salary: Column, post_validate: bool
) -> tuple[Column, Column]:
    cap = F.lit(SALARY_CAP)
    min_out = (
        F.when(salary.isNotNull() & (salary < cap), salary)
        .when(salary.isNotNull(), F.lit(None))
        .otherwise(min_raw)
    )
    max_out = (
        F.when(salary.isNotNull() & (salary < cap), salary)
        .when(min_out.isNotNull() & (min_out < cap), min_out)
        .otherwise(max_raw)
    )
    if post_validate:
        min_out = F.coalesce(min_out, max_out)
    return min_out, max_out


def salary_sql(min_raw: str, max_raw: str, salary: str, post_validate: bool) -> tuple[str, str]:
    min_out = (
        f"CASE WHEN {salary} IS NOT NULL AND {salary} < {SALARY_CAP} THEN {salary} "
        f"WHEN {salary} IS NOT NULL THEN NULL ELSE {min_raw} END"
    )
    max_out = (
        f"CASE WHEN {salary} IS NOT NULL AND {salary} < {SALARY_CAP} THEN {salary} "
        f"WHEN ({min_out}) IS NOT NULL AND ({min_out}) < {SALARY_CAP} THEN ({min_out}) "
        f"ELSE {max_raw} END"
    )
    if post_validate:
        min_out = f"COALESCE({min_out}, {max_out})"
    return min_out, max_out


# ---------------------------------------------------------------------------
# C11 contract/job-type defaulting — both validators self-reference the
# field being validated through ``values`` and therefore ALWAYS default
# (jora_job_description_extraction.py:67-77; job_type additionally reads
# the wrong key "job type"). Observable output is constant:
# ---------------------------------------------------------------------------

CONTRACT_TYPE_DEFAULT = "full time"
JOB_TYPE_DEFAULT = "on site"


def contract_type_final() -> Column:
    return F.lit(CONTRACT_TYPE_DEFAULT)


def job_type_final() -> Column:
    return F.lit(JOB_TYPE_DEFAULT)


# ---------------------------------------------------------------------------
# C13 deterministic row id — replaces uuid4 (dags/utils.py:239) which
# would violate replayability: id = sha2(site || '\0' || url_canon).
# ---------------------------------------------------------------------------


def row_id(site: Column, url_canon: Column) -> Column:
    return F.sha2(F.concat_ws("|", site, url_canon), 256)


# ---------------------------------------------------------------------------
# C15 page-count math (career_one_crawler.py:1098-1102)
# ---------------------------------------------------------------------------


def page_count(job_count: Column, per_page: Column) -> Column:
    return (job_count / per_page).cast("bigint") + F.lit(1)


# ---------------------------------------------------------------------------
# C16 skill set-normalization (dags/utils.py:256-258). The reference
# builds a Python set (unordered); we sort for a deterministic
# canonical representation.
# ---------------------------------------------------------------------------


def normalize_skills(col: Column) -> Column:
    return F.array_sort(
        F.array_distinct(F.transform(col, lambda s: F.lower(F.trim(s))))
    )


# ---------------------------------------------------------------------------
# S13 replacement: deterministic skill + salary extraction over
# combination_text — the SAME artifact the reference feeds its LLM
# agent (seek_job_description_extraction.py:72-227,
# jora_job_description_extraction.py:96-217). The LLM call is
# non-deterministic and out of scope (SURVEY §2.1); these extractors
# populate the same output fields (skills, min/max_salary) with a
# replayable keyword-lexicon scan and a salary-pattern regex, so the
# analytics views (Q1-Q4) carry skills/salary content for ALL sites,
# not just CareerOne. Pure Column expressions with SQL twins.
# ---------------------------------------------------------------------------

SKILL_LEXICON = [
    "python", "spark", "sql", "nosql", "airflow", "kafka", "snowflake",
    "dbt", "terraform", "kubernetes", "docker", "api", "microservices",
    "streaming", "observability", "security", "java", "scala", "react",
    "aws", "azure", "gcp",
]

_SAL_RANGE = r"\$\s*(\d[\d,]*)\s*(k?)\s*(?:-|to)\s*\$\s*(\d[\d,]*)\s*(k?)"
_SAL_SINGLE = r"\$\s*(\d[\d,]*)\s*(k?)"


def extract_skills(text: Column) -> Column:
    """Skills mentioned in the text (word-boundary match against the
    fixed lexicon); lexicon order — pass through normalize_skills (C16)
    for the canonical sorted-set form."""
    lt = F.lower(text)
    hits = [
        F.when(lt.rlike(rf"\b{s}\b"), F.lit(s)) for s in SKILL_LEXICON
    ]
    return F.array_compact(F.array(*hits))


def extract_skills_sql(c: str) -> str:
    items = ", ".join(
        f"CASE WHEN regexp_matches(lower({c}), '\\b{s}\\b') THEN '{s}' END"
        for s in SKILL_LEXICON
    )
    return f"list_filter([{items}], x -> x IS NOT NULL)"


def _sal_num(v: Column, k: Column) -> Column:
    return F.when(
        v != "",
        F.regexp_replace(v, ",", "").cast("double")
        * F.when(k == "k", F.lit(1000.0)).otherwise(F.lit(1.0)),
    )


def extract_salary_fields(text: Column) -> tuple[Column, Column, Column]:
    """(min_raw, max_raw, salary) for salary_exprs (C10): a '$X - $Y'
    range fills min/max; a lone '$X' fills the single-salary field
    (mirroring the LLM output schema's three fields)."""
    lt = F.lower(text)
    mn = _sal_num(
        F.regexp_extract(lt, _SAL_RANGE, 1), F.regexp_extract(lt, _SAL_RANGE, 2)
    )
    mx = _sal_num(
        F.regexp_extract(lt, _SAL_RANGE, 3), F.regexp_extract(lt, _SAL_RANGE, 4)
    )
    single = _sal_num(
        F.regexp_extract(lt, _SAL_SINGLE, 1), F.regexp_extract(lt, _SAL_SINGLE, 2)
    )
    salary = F.when(mn.isNull(), single)
    return mn, mx, salary


def _sal_num_sql(v: str, k: str) -> str:
    return (
        f"CASE WHEN {v} <> '' THEN CAST(replace({v}, ',', '') AS DOUBLE) "
        f"* (CASE WHEN {k} = 'k' THEN 1000.0 ELSE 1.0 END) END"
    )


def extract_salary_sql(c: str) -> tuple[str, str, str]:
    lt = f"lower({c})"
    rex = lambda pat, i: f"COALESCE(regexp_extract({lt}, '{pat}', {i}), '')"  # noqa: E731
    mn = _sal_num_sql(rex(_SAL_RANGE, 1), rex(_SAL_RANGE, 2))
    mx = _sal_num_sql(rex(_SAL_RANGE, 3), rex(_SAL_RANGE, 4))
    single = _sal_num_sql(rex(_SAL_SINGLE, 1), rex(_SAL_SINGLE, 2))
    salary = f"CASE WHEN ({mn}) IS NULL THEN ({single}) END"
    return mn, mx, salary


# ---------------------------------------------------------------------------
# S13 replacement, remaining two LLM output fields (VERDICT r2 #3):
# ``number_of_experience`` ("number of experience this job requires",
# jora_job_description_extraction.py:37-38 — pydantic default 1; the
# seek path's job_des.get(..., -1) defaults -1,
# seek_job_description_extraction.py:212) and ``is_working_right``
# ("is working rights required for this role", default True,
# jora_job_description_extraction.py:44-45). Deterministic stand-ins
# over the same combination_text: an "N(+) years" regex and a
# sponsorship-phrase match (sponsorship offered ⇒ working rights NOT
# required). Pure Column expressions with DuckDB twins; NULL text →
# NULL / default at the caller (warehouse coalesces site defaults).
# ---------------------------------------------------------------------------

_EXP_RE = r"(\d{1,2})\s*\+?\s*(?:years?|yrs)"
_NO_WR_RE = r"visa sponsorship|sponsorship (?:is )?available|no working rights required"


def extract_experience(text: Column) -> Column:
    """First "N(+) years" mention as the years-of-experience int; NULL
    when the text has none (caller applies the site default)."""
    v = F.regexp_extract(F.lower(text), _EXP_RE, 1)
    return F.when(v != "", v.cast("int"))


def extract_experience_sql(c: str) -> str:
    v = f"COALESCE(regexp_extract(lower({c}), '{_EXP_RE}', 1), '')"
    return f"CASE WHEN {v} <> '' THEN CAST({v} AS INT) END"


def extract_working_right(text: Column) -> Column:
    """False iff the text offers sponsorship / waives working rights;
    True otherwise (the pydantic default when the LLM saw no signal)."""
    return ~F.lower(text).rlike(_NO_WR_RE)


def extract_working_right_sql(c: str) -> str:
    return f"NOT regexp_matches(lower({c}), '{_NO_WR_RE}')"
