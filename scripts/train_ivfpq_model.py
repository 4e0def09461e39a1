"""Offline IVF+PQ model training — the train-once half of the
train-once/serve-many split ann_ivfpq_topk_pretrained attests.

Trains the IVF centroids (train_ivf_centroids) and PQ codebooks
(pq_train) on the FIXED reference corpus (/root/testdata/sf0.001
embeddings, 500 × 64-dim) with the engine's deterministic pins, and
writes them as JSON literals to infinidb_spark/plans/ivfpq_model.json.
The serving query loads the JSON; its DuckDB oracle bakes the same
literals, so correctness never depends on replaying Lloyd in SQL.

At 100 TB this is the real posture: the model is k×dim + m×k×(dim/m)
floats trained offline on a sample; serving ships it to executors as
literals and reads m bytes per vector.  Re-run this script only when
the model parameters (stride/m/k/iters) change — the JSON is
deliberately checked in so every engine and oracle sees the same model.

Usage: python scripts/train_ivfpq_model.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from infinidb_spark.operators.embeddings import pq_train  # noqa: E402
from infinidb_spark.operators.similarity import train_ivf_centroids  # noqa: E402
from infinidb_spark.session import get_spark, load_tables  # noqa: E402

STRIDE, M, K_CODES, PQ_ITERS = 50, 8, 8, 2
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "infinidb_spark", "plans", "ivfpq_model.json",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("train-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    centroids = train_ivf_centroids(emb, stride=STRIDE)
    codebooks = pq_train(emb, m=M, k=K_CODES, iters=PQ_ITERS, stride=STRIDE)
    model = {
        "trained_on": sf_dir,
        "stride": STRIDE,
        "m": M,
        "k_codes": K_CODES,
        "pq_iters": PQ_ITERS,
        "centroids": [[cid, cv] for cid, cv in centroids],
        "codebooks": [[[code, cv] for code, cv in book] for book in codebooks],
    }
    with open(OUT, "w") as fh:
        json.dump(model, fh)
    print(f"wrote {OUT}: {len(centroids)} centroids, "
          f"{len(codebooks)}x{len(codebooks[0])} codebooks")


if __name__ == "__main__":
    main()
