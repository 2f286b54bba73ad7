"""Scalar-function tests (SURVEY §2.4, §5.6).

Each Column expression in crawlspark.functions is checked against a
pure-Python twin that literally follows the reference control flow
(dags/utils.py / dags/jora_job_description_extraction.py), and the
``*_sql`` DuckDB generators are cross-checked against the Spark output
on the same rows — the drift guard the driver's correctness gate
relies on.
"""

from __future__ import annotations

import datetime as dt
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from crawlspark import functions as cf

ANCHOR = dt.datetime(2024, 3, 15, 10, 30, 0)


# ---------------------------------------------------------------------------
# Pure-Python twins, written from the reference control flow
# ---------------------------------------------------------------------------


def ref_convert_listed_date(listed_date, now=ANCHOR):
    """dags/utils.py:70-95 with now() replaced by the anchor."""
    if listed_date is None:
        return None
    if re.match(r"^\d{4}-\d{2}-\d{2}$", listed_date):
        return listed_date
    m = re.search(r"(\d+)", listed_date)
    if not m:
        return None
    n = int(m.group(1))
    if "minute" in listed_date or re.search(r"\d+m", listed_date):
        out = now - dt.timedelta(minutes=n)
    elif "hour" in listed_date or re.search(r"\d+h", listed_date):
        out = now - dt.timedelta(hours=n)
    elif "day" in listed_date or re.search(r"\d+d", listed_date):
        out = now - dt.timedelta(days=n)
    elif "week" in listed_date or re.search(r"\d+w", listed_date):
        out = now - dt.timedelta(weeks=n)
    elif "month" in listed_date:
        out = _add_months(now, -n)
    elif "year" in listed_date or re.search(r"\d+y", listed_date):
        out = _add_months(now, -12 * n)
    else:
        return None
    return out.strftime("%Y-%m-%d")


def _add_months(ts, months):
    month = ts.month - 1 + months
    year = ts.year + month // 12
    month = month % 12 + 1
    day = min(
        ts.day,
        [31, 29 if year % 4 == 0 and (year % 100 != 0 or year % 400 == 0) else 28,
         31, 30, 31, 30, 31, 31, 30, 31, 30, 31][month - 1],
    )
    return ts.replace(year=year, month=month, day=day)


def ref_level_from_role(role):
    """dags/utils.py:17-35."""
    if role is None:
        return ""
    inp = role.lower().strip()
    if not inp:
        return ""
    if "junior" in inp:
        return "junior"
    if "midlevel" in inp or "mid-level" in inp:
        return "mid-level"
    if "senior" in inp:
        return "senior"
    if "staff" in inp:
        return "staff"
    if "principal" in inp:
        return "principal"
    if "lead" in inp:
        return "lead"
    if "head" in inp:
        return "head"
    return "mid-level"


def ref_categorize_it_role(role):
    """dags/utils.py:277-439 two-pass keyword table, insertion order."""
    low = role.lower()
    for table in (cf.ROLE_CATEGORIES_PASS1, cf.ROLE_CATEGORIES_PASS2):
        for category, substr_lists in table:
            for words in substr_lists:
                if all(w.lower() in low for w in words):
                    return category
    return "uncategorized"


def ref_salary(min_raw, max_raw, salary, post_validate):
    """Faithful pydantic-v1 semantics (SURVEY C10, functions.py doc)."""
    cap = 1_000_000
    if salary is not None and salary < cap:
        min_out = salary
    elif salary is not None:
        min_out = None
    else:
        min_out = min_raw
    if salary is not None and salary < cap:
        max_out = salary
    elif min_out is not None and min_out < cap:
        max_out = min_out
    else:
        max_out = max_raw
    if post_validate and min_out is None:
        min_out = max_out
    return min_out, max_out


# ---------------------------------------------------------------------------
# Cases
# ---------------------------------------------------------------------------

LISTED_DATES = [
    None, "", "just now", "30 minutes ago", "14 hours ago", "3 days ago",
    "1 week ago", "2 weeks ago", "2 months ago", "1 year ago", "5d", "2w",
    "12m", "3h", "9y", "2024-01-15", "3 fortnights ago", "yesterday",
    "Posted 28d ago", "over 30 days ago",
]

ROLES = [
    None, "", "  ", "Junior Data Engineer", "Senior ML Engineer",
    "Staff Platform Engineer", "Principal Analytics Engineer",
    "Lead DevOps Engineer", "Head of Data", "Data Engineer",
    "mid-level developer", "midlevel dev", "Security Analyst",
    "Full Stack Developer", "react developer", "Oracle DBA",
    "UX designer", "iOS Developer", "Project Manager (IT)",
    "Business Intelligence", "Research Engineer", "Snowflake admin",
    "golang dev", "Site Reliability Engineer", "random title",
]

SALARY_CASES = [
    (None, None, None), (80000, 120000, None), (None, 120000, None),
    (80000, None, None), (None, None, 95000), (None, None, 1_500_000),
    (1_200_000, 90000, None), (80000, 1_500_000, None),
    (1_200_000, 1_500_000, None), (None, None, 999_999),
]


def test_convert_listed_date(spark, duck):
    rows = [(s, ANCHOR) for s in LISTED_DATES]
    df = spark.createDataFrame(rows, "s string, anchor timestamp").select(
        "s", cf.convert_listed_date(F.col("s"), F.col("anchor")).alias("out")
    )
    got = {r["s"]: r["out"] for r in df.collect()}
    for s in LISTED_DATES:
        assert got[s] == ref_convert_listed_date(s), repr(s)
    # DuckDB twin
    sql = cf.convert_listed_date_sql("s", "anchor")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR, anchor TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for s, out in con.execute(f"SELECT s, {sql} FROM t").fetchall():
        assert out == ref_convert_listed_date(s), repr(s)


def test_level_from_role(spark):
    df = spark.createDataFrame([(r,) for r in ROLES], "role string").select(
        "role", cf.level_from_role(F.col("role")).alias("out")
    )
    for r in df.collect():
        assert r["out"] == ref_level_from_role(r["role"]), repr(r["role"])
    # SQL twin
    con = duckdb.connect()
    con.execute("CREATE TABLE t (role VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(r,) for r in ROLES])
    sql = cf.level_from_role_sql("role")
    for role, out in con.execute(f"SELECT role, {sql} FROM t").fetchall():
        assert out == ref_level_from_role(role), repr(role)


def test_categorize_it_role(spark):
    roles = [r for r in ROLES if r is not None]
    df = spark.createDataFrame([(r,) for r in roles], "role string").select(
        "role", cf.categorize_it_role(F.col("role")).alias("out")
    )
    for r in df.collect():
        assert r["out"] == ref_categorize_it_role(r["role"]), repr(r["role"])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (role VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(r,) for r in roles])
    sql = cf.categorize_it_role_sql("role")
    for role, out in con.execute(f"SELECT role, {sql} FROM t").fetchall():
        assert out == ref_categorize_it_role(role), repr(role)


@pytest.mark.parametrize("post_validate", [True, False])
def test_salary_exprs(spark, post_validate):
    df = spark.createDataFrame(
        SALARY_CASES, "min_raw int, max_raw int, salary int"
    )
    mn, mx = cf.salary_exprs(
        F.col("min_raw"), F.col("max_raw"), F.col("salary"), post_validate
    )
    out = df.select("min_raw", "max_raw", "salary",
                    mn.alias("mn"), mx.alias("mx")).collect()
    for r in out:
        want = ref_salary(r["min_raw"], r["max_raw"], r["salary"], post_validate)
        assert (r["mn"], r["mx"]) == want, (r["min_raw"], r["max_raw"], r["salary"])


def test_constant_defaults():
    """C11: the reference's contract/job-type validators always default
    (self-referencing pydantic values) — observable output is constant."""
    assert cf.CONTRACT_TYPE_DEFAULT == "full time"
    assert cf.JOB_TYPE_DEFAULT == "on site"


def test_normalize_skills(spark):
    df = spark.createDataFrame(
        [(["Python", " python ", "SQL", "sql", "AWS"],)], "skills array<string>"
    ).select(cf.normalize_skills(F.col("skills")).alias("out"))
    assert df.collect()[0]["out"] == ["aws", "python", "sql"]


EXP_CASES = [
    ("Requires 3+ years experience in Spark", 3, True),
    ("minimum 12 years experience", 12, True),
    ("5 yrs hands-on; visa sponsorship available", 5, False),
    ("Sponsorship is available for the right candidate", None, False),
    ("no working rights required", None, False),
    ("full working rights required", None, True),
    ("great team and culture", None, True),
    ("pay $120k - $150k", None, True),
    (None, None, None),
]


def test_extract_experience_and_working_right(spark):
    df = spark.createDataFrame(
        [(t,) for t, _, _ in EXP_CASES], "t string"
    ).select(
        "t",
        cf.extract_experience(F.col("t")).alias("exp"),
        cf.extract_working_right(F.col("t")).alias("wr"),
    )
    got = {r["t"]: (r["exp"], r["wr"]) for r in df.collect()}
    for t, exp, wr in EXP_CASES:
        assert got[t] == (exp, wr), repr(t)
    # DuckDB twins must agree case by case
    con = duckdb.connect()
    con.execute("CREATE TABLE t (t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t, _, _ in EXP_CASES])
    sql = (
        f"SELECT t, {cf.extract_experience_sql('t')} AS exp, "
        f"{cf.extract_working_right_sql('t')} AS wr FROM t"
    )
    for t, exp, wr in con.execute(sql).fetchall():
        want_exp, want_wr = got[t]
        assert (exp, wr) == (want_exp, want_wr), repr(t)


def test_page_count(spark):
    df = spark.createDataFrame(
        [(0, 20), (19, 20), (20, 20), (21, 20), (400, 20)], "jc long, pp long"
    ).select("jc", cf.page_count(F.col("jc"), F.col("pp")).alias("n"))
    got = {r["jc"]: r["n"] for r in df.collect()}
    assert got == {0: 1, 19: 1, 20: 2, 21: 2, 400: 21}
