"""SemDeDup centroid-quality probe: within-cell duplicate-pair recall.

SemDeDup only compares vectors that land in the SAME cell, so the
fraction of TRUE near-duplicate pairs whose two members share a cell is
the dedup recall ceiling of a centroid configuration.  This probe
computes that recall against the exact all-pairs ground truth
(``similarity.embedding_neardup_exact``, the ``dedup5`` contract config)
for the three centroid sources:

* ``lowest-id`` — the oracle-replayable contract config (the
  ``n_clusters`` lowest-id vectors);
* ``sampled_kmeans`` — the production tier (``semantic_dedup(fit=
  "sampled_kmeans")``: IVFIndex hash-spread init + capped Lloyd's);
* ``micro_kmeans`` — the oracle-replayable fitted tier (``dedup15``:
  integer-micro Lloyd's over a seeded md5 half-sample).

Also reports how many pairs each configuration's within-cell search
actually DROPS (kept=False decisions) as a sanity cross-check: within a
cell the comparison is exact, so drops == recalled pairs' chain heads.

Usage: python tools/semdedup_recall.py [sf_dir] [n_clusters] [threshold]
Prints one JSON line; paste the numbers into PERFORMANCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nlp_to_nosql_spark.session import get_spark  # noqa: E402
from nlp_to_nosql_spark.sources.catalog import register_tables  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.4

    from nlp_to_nosql_spark.operators.semdedup import semantic_dedup
    from nlp_to_nosql_spark.operators.similarity import (
        embedding_neardup_exact,
    )

    spark = get_spark("semdedup_recall", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = register_tables(spark, sf_dir)["embeddings"]

    truth = (
        embedding_neardup_exact(emb, threshold=threshold)
        .select("id_a", "id_b")
        .collect()
    )
    pairs = {(r["id_a"], r["id_b"]) for r in truth}

    out: dict = {
        "sf_dir": sf_dir,
        "n_clusters": n_clusters,
        "threshold": threshold,
        "true_pairs": len(pairs),
        "configs": {},
    }
    for label, kwargs in (
        ("lowest_id", {}),
        ("sampled_kmeans", {"fit": "sampled_kmeans"}),
        ("micro_kmeans", {"fit": "micro_kmeans"}),
    ):
        t0 = time.time()
        res = semantic_dedup(
            emb, n_clusters=n_clusters, threshold=threshold, **kwargs
        )
        rows = res.select("vec_id", "cluster_id", "kept").collect()
        wall = time.time() - t0
        cell = {r["vec_id"]: r["cluster_id"] for r in rows}
        dropped = sum(1 for r in rows if not r["kept"])
        recalled = sum(1 for a, b in pairs if cell[a] == cell[b])
        sizes: dict = {}
        for c in cell.values():
            sizes[c] = sizes.get(c, 0) + 1
        out["configs"][label] = {
            "pair_recall": round(recalled / len(pairs), 4) if pairs else 1.0,
            "recalled_pairs": recalled,
            "dropped_vectors": dropped,
            "largest_cell_frac": round(max(sizes.values()) / len(cell), 4),
            "wall_sec": round(wall, 2),
        }
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
