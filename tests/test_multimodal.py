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


def test_resize_media_matches_pure_python(spark):
    """Resize plan must equal the pure recompute: sha-derived dims,
    aspect-preserving floor(w*scale) capped at max_dim=128 (inside the
    fake dim range, so the scale branch genuinely fires)."""
    import hashlib
    import math

    from crawlspark.multimodal import docs_as_media, resize_media

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["media_id"]: (r["width"], r["height"], r["new_width"], r["new_height"])
        for r in resize_media(docs_as_media(docs), max_dim=128).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        d = hashlib.sha256(row["text"].encode()).digest()
        w, h = 64 + d[0] % 192, 64 + d[1] % 192
        sc = min(1.0, 128 / max(w, h))
        assert got[row["doc_id"]] == (w, h, math.floor(w * sc), math.floor(h * sc))
    # the cap branch must actually fire for some rows (non-vacuous)
    assert any(nw < w for w, h, nw, nh in got.values())


def test_sample_frames_fanout(spark):
    """Frame sampling: ≤ max_frames rows per media, uniform stride,
    deterministic per-frame content ids."""
    import hashlib
    import math

    from crawlspark.multimodal import docs_as_media, sample_frames

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = sample_frames(docs_as_media(docs), max_frames=8).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert set(by_media) == set(texts)
    for mid, frs in by_media.items():
        payload = texts[mid].encode()
        n = 1 + hashlib.sha256(payload).digest()[2] % 60
        stride = math.ceil(n / 8)
        want_idx = list(range(0, n, stride))
        frs.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in frs] == want_idx
        assert len(frs) <= 8
        assert all(r["n_frames"] == n for r in frs)
        assert frs[0]["frame_sha"] == hashlib.sha256(payload + b":0").hexdigest()


def test_media_profile_equals_composition(spark, media):
    """The folded one-pass profile must agree column-for-column with
    the three row-level operators it bundles (features ∪ resize ∪
    frame-sample summary)."""
    import math

    prof = {r["media_id"]: r for r in M.media_profile(media, max_dim=128, max_frames=8).collect()}
    feats = {r["media_id"]: r for r in M.extract_features(media).collect()}
    res = {r["media_id"]: r for r in M.resize_media(media, max_dim=128).collect()}
    frames = {}
    for r in M.sample_frames(media, max_frames=8).collect():
        frames.setdefault(r["media_id"], []).append(r)
    assert set(prof) == set(feats) == set(res) == set(frames)
    for mid, p in prof.items():
        assert (p["n_bytes"], p["sha256"]) == (feats[mid]["n_bytes"], feats[mid]["sha256"])
        assert (p["width"], p["height"], p["new_width"], p["new_height"]) == (
            res[mid]["width"], res[mid]["height"],
            res[mid]["new_width"], res[mid]["new_height"])
        frs = sorted(frames[mid], key=lambda r: r["frame_idx"])
        assert p["n_frames"] == frs[0]["n_frames"]
        assert p["n_sampled"] == len(frs)
        sig = hashlib.sha256(",".join(r["frame_sha"] for r in frs).encode()).hexdigest()
        assert p["frames_sig"] == sig


def _duck_docs(spark):
    con = duckdb.connect()
    pdf = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    con.register("documents_raw", pdf)
    con.execute("CREATE TABLE documents AS SELECT * FROM documents_raw")
    return con


def test_media_profile_sql_twin(spark, media):
    con = _duck_docs(spark)
    got = sorted(map(tuple, M.media_profile(media, max_dim=128, max_frames=8).collect()))
    want = sorted(map(tuple, con.execute(M.media_profile_sql(max_dim=128, max_frames=8)).fetchall()))
    assert got == want


def test_media_resize_sql_twin(spark, media):
    """resize/frames left the driver's 50-query correctness window in
    round 4 (folded into media_features) — keep their DuckDB twins
    gated here with the driver-identical comparison."""
    con = _duck_docs(spark)
    got = sorted(map(tuple, M.resize_media(media, max_dim=128).collect()))
    want = sorted(map(tuple, con.execute(M.media_resize_sql(max_dim=128)).fetchall()))
    assert got == want


def test_media_frames_sql_twin(spark, media):
    con = _duck_docs(spark)
    got = sorted(map(tuple, M.sample_frames(media, max_frames=8).collect()))
    want = sorted(map(tuple, con.execute(M.media_frames_sql(max_frames=8)).fetchall()))
    assert got == want
