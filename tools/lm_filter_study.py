"""lm2 filter-validity study: does the target-trained stupid-backoff
score actually SEPARATE target-like text from the rest?

The oracle proves the score is computed exactly; this probe measures
whether it is USEFUL as a filter — the same discipline as
``semdedup_recall.py`` (exactness and effectiveness are different
claims).  Protocol: train the LM on HALF the English documents
(``doc_id % 2 == 0``), score a pool of (a) the HELD-OUT English half —
never seen by the fit — and (b) every non-English document, then
report per-group score distributions and the head-band composition a
CCNet-style tertile cut (``ppl_buckets`` over the whole pool as one
group) would select.  A working filter ranks held-out English above
non-English: high AUC, English-dominated head band.

Usage: python tools/lm_filter_study.py [sf_dir ...]
(defaults to all three testdata SFs; ~1 min each on local[32]).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from nlp_to_nosql_spark.operators.curation import (
    kneser_ney_score,
    target_lm_score,
)
from nlp_to_nosql_spark.session import get_spark
from nlp_to_nosql_spark.sources.catalog import register_tables


def study(spark, sf_dir: str) -> dict:
    docs = register_tables(spark, sf_dir)["documents"]
    is_en = F.col("lang").eqNullSafe(F.lit("en"))
    target = docs.filter(is_en & (F.col("doc_id") % 2 == 0))
    pool = docs.filter(~is_en | (F.col("doc_id") % 2 != 0))
    scored = (
        target_lm_score(pool, target)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            F.col("lang").eqNullSafe(F.lit("en")).alias("is_en"),
            "mean_lp_micro",
        )
        .filter(F.col("mean_lp_micro").isNotNull())
    )
    stats = {
        r["is_en"]: r
        for r in scored.groupBy("is_en")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("mean_lp_micro").alias("mean"),
            F.expr("percentile(mean_lp_micro, 0.5)").alias("median"),
        )
        .collect()
    }
    # rank-sum AUC: P(random held-out-en score > random non-en score),
    # ties at 0.5 — computed from the Mann-Whitney U via global ranks
    w = Window.orderBy("mean_lp_micro")
    ranked = scored.withColumn("rk", F.rank().over(w)).withColumn(
        "n_tied",
        F.count(F.lit(1)).over(Window.partitionBy("mean_lp_micro")),
    )
    # midrank = rank + (ties-1)/2
    agg = (
        ranked.filter(F.col("is_en"))
        .agg(
            F.sum(
                F.col("rk") + (F.col("n_tied") - F.lit(1)) / F.lit(2.0)
            ).alias("rsum"),
            F.count(F.lit(1)).alias("n1"),
        )
        .collect()[0]
    )
    n1, n0 = int(agg["n1"]), int(stats[False]["n"])
    auc = (float(agg["rsum"]) - n1 * (n1 + 1) / 2.0) / (n1 * n0)
    # head-band composition: top third of the pool by score
    n_total = n1 + n0
    head = (
        scored.orderBy(F.desc("mean_lp_micro"), F.asc("doc_id"))
        .limit(n_total // 3)
        .agg(F.sum(F.col("is_en").cast("int")).alias("en_in_head"))
        .collect()[0]["en_in_head"]
    )
    return {
        "sf_dir": sf_dir,
        "n_heldout_en": n1,
        "n_non_en": n0,
        "mean_en": round(float(stats[True]["mean"])),
        "mean_non": round(float(stats[False]["mean"])),
        "median_en": round(float(stats[True]["median"])),
        "median_non": round(float(stats[False]["median"])),
        "auc": round(auc, 3),
        "head_size": n_total // 3,
        "en_in_head": int(head),
    }


def planted_study(spark, sf_dir: str, scorer=target_lm_score) -> dict:
    """The PLANTED-shift protocol: the lang-label protocol above is an
    honest null on this synthetic testdata (every lang shares one
    31-word vocabulary, so labels carry no textual signal — AUC ~0.5
    measures the DATA, not the operator).  Here the shift is real:
    train on half the corpus, score a pool of (a) the held-out original
    half and (b) the same held-out docs with a Caesar-rotated
    vocabulary (``scale_probe``'s disjoint-vocabulary transform — a
    maximal distribution shift with identical length/structure).  A
    working filter must rank (a) far above (b).

    ``scorer`` is any lm2-contract two-frame scorer — run for both
    ``target_lm_score`` (stupid backoff, lm2) and ``kneser_ney_score``
    (interpolated KN, lm5) so the two smoothing tiers report
    side-by-side AUC rows."""
    import string

    docs = register_tables(spark, sf_dir)["documents"]
    target = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    held = docs.filter(F.col("doc_id") % 2 != 0).select("doc_id", "text")
    alpha = string.ascii_lowercase
    rot = alpha[13:] + alpha[:13]
    shifted = held.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.translate(F.col("text"), alpha, rot).alias("text"),
    )
    pool = held.unionByName(shifted)
    scored = scorer(pool, target).filter(
        F.col("mean_lp_micro").isNotNull()
    ).select(
        "doc_id",
        (F.col("doc_id") < 10_000_000).alias("is_en"),
        "mean_lp_micro",
    )
    w = Window.orderBy("mean_lp_micro")
    ranked = scored.withColumn("rk", F.rank().over(w)).withColumn(
        "n_tied",
        F.count(F.lit(1)).over(Window.partitionBy("mean_lp_micro")),
    )
    agg = (
        ranked.filter(F.col("is_en"))
        .agg(
            F.sum(
                F.col("rk") + (F.col("n_tied") - F.lit(1)) / F.lit(2.0)
            ).alias("rsum"),
            F.count(F.lit(1)).alias("n1"),
        )
        .collect()[0]
    )
    n1 = int(agg["n1"])
    n0 = scored.filter(~F.col("is_en")).count()
    auc = (float(agg["rsum"]) - n1 * (n1 + 1) / 2.0) / (n1 * n0)
    means = {
        r["is_en"]: round(float(r["m"]))
        for r in scored.groupBy("is_en")
        .agg(F.avg("mean_lp_micro").alias("m"))
        .collect()
    }
    return {
        "sf": sf_dir.rsplit("/", 1)[-1],
        "n_each": n1,
        "mean_indist": means[True],
        "mean_shifted": means[False],
        "auc": round(auc, 3),
    }


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("lm_filter_study", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        "| sf | held-out en | non-en | mean lp (en/non) | "
        "median lp (en/non) | AUC | en share of head third |"
    )
    print("|---|---|---|---|---|---|---|")
    for d in dirs:
        r = study(spark, d)
        print(
            f"| {r['sf_dir'].rsplit('/', 1)[-1]} | {r['n_heldout_en']} | "
            f"{r['n_non_en']} | {r['mean_en']} / {r['mean_non']} | "
            f"{r['median_en']} / {r['median_non']} | {r['auc']} | "
            f"{r['en_in_head']}/{r['head_size']} |"
        )
        spark.catalog.clearCache()
    print()
    print(
        "| sf (planted shift) | scorer | n each | "
        "mean lp (in-dist/shifted) | AUC |"
    )
    print("|---|---|---|---|---|")
    for d in dirs:
        for label, fn in (
            ("lm2 stupid-backoff", target_lm_score),
            ("lm5 kneser-ney", kneser_ney_score),
        ):
            r = planted_study(spark, d, scorer=fn)
            print(
                f"| {r['sf']} | {label} | {r['n_each']} | "
                f"{r['mean_indist']} / {r['mean_shifted']} | {r['auc']} |"
            )
            spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
