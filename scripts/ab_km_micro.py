"""Single-session alternating A/B of the two _km_assign formulations
(optimization round 15, guide §1): window-argmin (old) vs broadcast
sorted-array array_min argmin (new). Run both chains alternately in ONE
process (A B A B ...) so JVM/GC/window drift hits both arms equally;
report per-arm minima. Times the full 2-pass Lloyd chain over the
semantic-dedup vectors (the heavier consumer) and the 3-pass kmeans
chain over embeddings, with a noop sink.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_old(pts: DataFrame, cent: DataFrame) -> DataFrame:
    scored = pts.join(F.broadcast(cent)).select(
        "vec_id",
        "x",
        "cluster",
        _km_dist2(F.col("x"), F.col("c")).alias("d2"),
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "x", "cluster", "d2")
    )


def chain(assign, pts, cent, iters):
    a = None
    c = cent
    for _ in range(iters):
        a = assign(pts, c)
        c = _km_recompute(a)
    return a.groupBy("cluster").agg(
        F.count("*").alias("n"), F.sum("d2").alias("s")
    )


def main() -> None:
    from hive3_replication_spark.catalog import load_embeddings, load_table
    from hive3_replication_spark.llm.dedup import SEM_K, SEM_STEP, _sem_vectors
    from hive3_replication_spark.session import get_spark

    global _km_dist2, _km_recompute
    from hive3_replication_spark.llm.similarity import (  # noqa: E402
        _KM_K,
        _KM_STEP,
        _km_assign,
        _km_dist2,
        _km_recompute,
    )

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="h3r-ab-km")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf, "documents")
    sem_pts = (
        _sem_vectors(docs).select(F.col("doc_id").alias("vec_id"), "x")
        .localCheckpoint()
    )
    sem_cent = sem_pts.filter(
        (F.col("vec_id") % SEM_STEP == 0)
        & (F.col("vec_id") <= SEM_STEP * (SEM_K - 1))
    ).select(
        (F.col("vec_id") / SEM_STEP).cast("bigint").alias("cluster"),
        F.col("x").alias("c"),
    )
    emb_pts = load_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    emb_cent = emb_pts.filter(
        (F.col("vec_id") % _KM_STEP == 0)
        & (F.col("vec_id") <= _KM_STEP * (_KM_K - 1))
    ).select(
        (F.col("vec_id") / _KM_STEP).cast("bigint").alias("cluster"),
        F.col("x").alias("c"),
    )

    cases = {
        "sem2": (sem_pts, sem_cent, 2),
        "km3": (emb_pts, emb_cent, 3),
    }
    arms = {"old": assign_old, "new": _km_assign}
    best: dict[str, float] = {}
    # warm both arms once (codegen/JIT)
    for cname, (p, c, it) in cases.items():
        for aname, fn in arms.items():
            chain(fn, p, c, it).write.format("noop").mode("overwrite").save()
    for r in range(rounds):
        for cname, (p, c, it) in cases.items():
            for aname, fn in arms.items():
                spark.sparkContext.setJobDescription(f"{cname}:{aname}:r{r}")
                t0 = time.perf_counter()
                chain(fn, p, c, it).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = time.perf_counter() - t0
                key = f"{cname}:{aname}"
                best[key] = min(el, best.get(key, float("inf")))
                print(f"r{r} {key} {el:.3f}", flush=True)
    print({k: round(v, 3) for k, v in sorted(best.items())})
    spark.stop()


if __name__ == "__main__":
    main()
