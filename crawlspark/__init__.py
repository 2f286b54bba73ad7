"""crawlspark — a PySpark-native crawl frontier + fetch scheduler.

A from-scratch re-expression of the semantics of the reference crawl
pipeline (lehoanglong95/job_crawler, an Airflow/Celery job-board
crawler) as an idiomatic Spark batch engine:

* DataFrame-resident priority **frontier** over snapshot tables of
  Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``.
* RFC-3986 URL canonicalization + tracking-param strip (Arrow UDF).
* Partitioned **bloom** URL-seen filter (vectorized, Arrow) backstopped
  by an exact ``left_anti`` join — the exact join is the ground truth,
  matching the reference's Python ``set.difference`` semantics
  (reference: dags/crawler/seek_crawler.py:196).
* Per-host **token-bucket politeness** + robots.txt longest-prefix rule
  cache, enforced relationally via window rank over a salted host-hash
  partitioning (no sleeping; reference sleeps at
  dags/crawler/seek_crawler.py:178, jora_cralwer.py:235,273).
* Extraction pandas UDFs whose output text is byte-identical per URL to
  the reference BeautifulSoup parsers (seek_crawler.py:213-235,
  jora_cralwer.py:276-291, career_one_crawler.py:1129-1188).
* Checkpoint/resume via atomic snapshot commits with per-partition
  lineage + counters (Iceberg-style; parquet-snapshot fallback offline).

No per-row Python anywhere in the hot path: parsing/canonicalization is
Arrow-batched pandas UDFs, everything else is native Column expressions.
"""

__version__ = "0.1.0"
