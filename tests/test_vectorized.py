"""Fast-path ≡ oracle-path equivalence for the vectorized vector
operators (VERDICT r2 item 1): the numpy-matmul mapInPandas paths of
IVF bucket assignment, IVF candidate scoring and sign-LSH banding must
produce EXACTLY the rows of the pure-Column expression paths (which
are the bit-exact mirrors of the DuckDB twins) on the real test
embeddings — at sf0.001 and on the planted near-dup corpus."""

from __future__ import annotations

import pytest

from crawlspark import similarity as S
from crawlspark import textops as T

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_pandas_equals_expr(emb):
    fast = _rows(S.ivf_topk(emb, n_queries=10, k=5, impl="pandas"))
    slow = _rows(S.ivf_topk(emb, n_queries=10, k=5, impl="expr"))
    assert fast == slow
    assert len(fast) == 50


def test_ivf_bucket_assignment_identical(emb):
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(S.IVF_CENTROIDS).collect()
    ]
    corpus = emb.selectExpr("vec_id AS nid", "embedding AS nv")
    from pyspark.sql import functions as F

    fast = {
        r["nid"]: r["bucket"]
        for r in S._assign_bucket_pandas(corpus, centroids).collect()
    }
    slow = {
        r["nid"]: r["bucket"]
        for r in S._assign_bucket(
            corpus.select("nid", F.transform("nv", lambda x: x.cast("double")).alias("nv")),
            centroids,
        ).collect()
    }
    assert fast == slow and len(fast) == emb.count()


def test_simhash_pandas_equals_expr(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fast = _rows(T.simhash_df(docs, impl="pandas"))
    slow = _rows(T.simhash_df(docs, impl="expr"))
    assert fast == slow  # pure integer ops — bit-identical, not just close
    assert len(fast) == docs.count()


def test_doc_fingerprint_pandas_equals_expr(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fast = _rows(T.doc_fingerprint_df(docs, impl="pandas"))
    slow = _rows(T.doc_fingerprint_df(docs, impl="expr"))
    assert fast == slow  # md5 hex + lexicographic sort: engine-exact
    assert len(fast) == docs.count()


def test_emb_lsh_pandas_equals_expr(spark, emb):
    planted = T.planted_embeddings(emb)
    fast = _rows(T.embedding_lsh_pairs(planted, threshold=0.95, impl="pandas"))
    slow = _rows(T.embedding_lsh_pairs(planted, threshold=0.95, impl="expr"))
    assert fast == slow
    assert fast, "planted corpus must yield near-dup pairs"
