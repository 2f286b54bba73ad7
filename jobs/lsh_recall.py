"""LSH parameter evidence at BENCH scale (VERDICT r4 next #7): the
banding recall/precision tests run at sf0.01; this job runs the same
check at sf0.1 (5,000 docs) so the MinHash banding choice (16 hashes,
4 bands x 4 rows) is evidenced where the bench numbers are measured.

Oracle: the O(n^2) exact n-gram-Jaccard pair set at ``--threshold``
(feasible as a one-shot job at 5k docs — 12.5M candidate pairs on
local[32]; NEVER part of the per-round bench or the pytest suite).
Candidate: minhash_lsh_pairs at the same threshold. Because the LSH
operator verifies every band collision with exact Jaccard, its output
is a SUBSET of the oracle by construction — precision is 1.0 and the
only question is recall: did every true pair collide on >=1 band?

Expected recall from the banding formula: a pair with true Jaccard j
collides with prob 1-(1-j^4)^4 (>=0.986 at j=0.9, ~1.0 at the planted
j~0.99); the job reports the per-pair expectation alongside the
measured recall and exits nonzero below the 0.95 floor documented in
docs/SCALE.md.

Usage: python jobs/lsh_recall.py [--sf-dir /root/testdata/sf0.1]
       [--threshold 0.9] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RECALL_FLOOR = 0.95


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from crawlspark.session import get_spark
    from crawlspark.textops import minhash_lsh_pairs, ngram_jaccard_pairs

    spark = get_spark(
        "lsh-recall", cores=args.cpus, shuffle_partitions=2 * args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    if docs.rdd.getNumPartitions() < args.cpus:
        docs = docs.repartition(args.cpus)

    t0 = time.perf_counter()
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=args.threshold).collect()
    }
    t_exact = time.perf_counter() - t0
    t0 = time.perf_counter()
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=args.threshold).collect()
    }
    t_lsh = time.perf_counter() - t0

    if not exact:
        print(json.dumps({"error": "no exact pairs at threshold — oracle vacuous"}))
        sys.exit(2)
    extra = lsh - set(exact)
    recall = len(lsh & set(exact)) / len(exact)
    expected = sum(
        1 - (1 - j**4) ** 4 for j in exact.values()
    ) / len(exact)
    out = {
        "sf_dir": args.sf_dir,
        "threshold": args.threshold,
        "n_docs": docs.count(),
        "n_exact_pairs": len(exact),
        "n_lsh_pairs": len(lsh),
        "recall": round(recall, 4),
        "expected_recall_banding": round(expected, 4),
        "precision": round(1.0 - len(extra) / max(len(lsh), 1), 4),
        "missed": sorted(set(exact) - lsh)[:10],
        "exact_oracle_sec": round(t_exact, 1),
        "lsh_sec": round(t_lsh, 1),
    }
    print(json.dumps(out))
    if extra:
        sys.exit(3)  # verify-join contract broken: LSH must be a subset
    sys.exit(0 if recall >= RECALL_FLOOR else 1)


if __name__ == "__main__":
    main()
