"""q167 recall curve (VERDICT r14 #4): per-vector agreement between the
IVF-routed label-noise vote and the exact brute-force vote, measured at
sf0.01 across nprobe ∈ {2,4,8} with hash-picked vs k-means-trained
centroids (C=16).

Agreement here is the PER-VECTOR majority-vote match (sharper than the
per-label flip-mass bound the sf0.001 test uses): for each audited
vector, does the IVF-probed neighborhood elect the same majority label
as the exact k-NN neighborhood? Prints one JSON line per config; the
measured band goes into SCALE.md and pins the floor in
tests/test_operators.py::test_label_noise_audit_ivf_recall_sf001.

Usage: python tools/recall_curve.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from syntenybrowserv2_etl_spark.functions import hashing
from syntenybrowserv2_etl_spark.operators import similarity as S
from syntenybrowserv2_etl_spark.session import get_spark


def majority_votes(emb, nn, k: int):
    """(query_id, maj) — the same deterministic vote label_noise_audit
    takes: most common neighbor label, ties to the smaller label."""
    lab = emb.select(F.col("vec_id"), F.col("label").alias("__nb"))
    votes = (
        nn.filter(F.col("rank") <= k)
        .select("query_id", "vec_id")
        .join(lab, "vec_id")
        .groupBy("query_id", "__nb")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("v").desc(), F.col("__nb").asc()
    )
    return (
        votes.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("query_id", F.col("__nb").alias("maj"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k, C = 5, 16
    spark = get_spark("recall_curve")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint()
    audit = emb.filter(hashing.md5_long(F.col("vec_id")) % 4 == 0)
    q = audit.select(F.col("vec_id").alias("query_id"), "embedding")

    exact_nn = S.knn_bruteforce(emb, q, k=k)
    exact_maj = majority_votes(emb, exact_nn, k).withColumnRenamed(
        "maj", "maj_exact"
    ).localCheckpoint()
    n_audit = exact_maj.count()

    cents_by_kind = {
        "hash_picked": S.pick_centroids(emb, C),
        "kmeans_trained": S.kmeans_centroids(emb, k=C, iters=3),
    }
    for kind, cents in cents_by_kind.items():
        cents = cents.localCheckpoint()
        assigned = S.assign_centroids(emb, cents)
        for nprobe in (2, 4, 8):
            nn = S.knn_ivf(
                assigned,
                cents,
                q,
                k=k,
                nprobe=nprobe,
                broadcast_probe=False,
                narrow_probe=True,
            )
            maj = majority_votes(emb, nn, k)
            own = audit.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("own"),
            )
            joined = (
                exact_maj.join(maj, "query_id").join(own, "query_id")
                .select(
                    (F.col("maj_exact") == F.col("maj")).alias("vote_eq"),
                    (F.col("maj_exact") != F.col("own")).alias("sus_exact"),
                    (F.col("maj") != F.col("own")).alias("sus_ivf"),
                    "own",
                )
                .localCheckpoint()
            )
            agree = joined.filter("vote_eq").count()
            flag_agree = joined.filter(
                F.col("sus_exact") == F.col("sus_ivf")
            ).count()
            # report-level flip mass: the per-label |n_suspect| delta the
            # sf0.001 test bounds — q167's DELIVERABLE is per-label rates
            per_label = (
                joined.groupBy("own")
                .agg(
                    F.sum(F.col("sus_exact").cast("long")).alias("se"),
                    F.sum(F.col("sus_ivf").cast("long")).alias("si"),
                )
                .select(F.abs(F.col("se") - F.col("si")).alias("d"))
                .agg(F.sum("d"))
                .collect()[0][0]
            )
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "centroids": kind,
                        "C": C,
                        "nprobe": nprobe,
                        "k": k,
                        "n_audit": n_audit,
                        "vote_agreement": round(agree / n_audit, 4),
                        "suspect_flag_agreement": round(
                            flag_agree / n_audit, 4
                        ),
                        "report_flip_mass": round(per_label / n_audit, 4),
                    }
                )
            )


if __name__ == "__main__":
    main()
