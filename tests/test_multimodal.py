"""Multimodal plumbing: schema contract, mapInPandas batch shape, and
the deterministic fake-decode vs numpy + DuckDB oracles."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pytest

from crawlspark import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return M.docs_as_media(docs).cache()


def test_schema_contract(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "media_type", "meta",
    ]
    out = M.extract_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,n_bytes:bigint,sha256:string,"
        "width:int,height:int,feature:array<double>>"
    )


def test_fake_decode_deterministic(media):
    rows = M.extract_features(media).collect()
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(rows) == len(payloads)
    for r in rows:
        p = payloads[r["media_id"]]
        assert r["n_bytes"] == len(p)
        assert r["sha256"] == hashlib.sha256(p).hexdigest()
        w, h, feat = M.fake_decode(p)
        assert (r["width"], r["height"]) == (w, h)
        assert np.allclose(r["feature"], feat)
        assert len(r["feature"]) == M.FEATURE_DIM
        if len(p):
            assert abs(sum(r["feature"]) - 1.0) < 1e-4  # histogram sums to 1


def test_sql_slice_vs_duckdb(spark, media):
    con = duckdb.connect()
    pdf = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    con.register("documents_raw", pdf)
    con.execute("CREATE TABLE documents AS SELECT * FROM documents_raw")
    got = sorted(
        (r["media_id"], r["n_bytes"], r["sha256"])
        for r in M.extract_features(media).collect()
    )
    want = sorted(tuple(r) for r in con.execute(M.media_features_sql()).fetchall())
    assert got == want


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...")
