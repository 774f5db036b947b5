"""Similarity search over embedding columns (SURVEY.md §2.11 L3 + ANN
extension).

Scale rules (SURVEY.md §7 risk 5): broadcast the query vector(s), never the
corpus; top-k via orderBy+limit (TakeOrderedAndProject — per-partition heaps,
O(k) driver memory); the IVF variant prunes the corpus to the nearest coarse
cells before scoring so the exact scorer touches ~n/cells vectors.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import embedding_dim, load_embeddings, load_table
from ..util import expr_memo, fan_out, scratch_dir


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Index-ordered fold — bit-deterministic, JVM codegen, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def llm_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 — brute-force cosine top-k: the exact baseline every ANN variant
    is measured against. The query vector is a 1-row broadcast; scoring is a
    narrow map over the corpus; top-k collapses to TakeOrderedAndProject."""
    emb = load_embeddings(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    # corpus side fanned out (guide §2.5): the interpreted dot/norm folds
    # are the per-row cost and the fixture scan is one split — the whole
    # scoring pass otherwise runs single-task; the query side stays on
    # the raw scan so its vec_id filter still pushes down.
    scored = fan_out(emb).join(F.broadcast(query)).select(
        "vec_id",
        (
            _dot(F.col("embedding"), F.col("q_emb"))
            / (_norm(F.col("embedding")) * _norm(F.col("q_emb")))
        ).alias("cosine"),
    )
    return (
        scored.filter(F.col("vec_id") != 0)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.round("cosine", 6).alias("cosine_r"))
    )


def llm_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched k-NN join: top-5 corpus neighbors for EACH of a set of query
    vectors (vec_id < 10) — the "compare the corpus against a seed set"
    shape (contamination checks, seed-set dedup).

    The query set broadcasts (Q × dim is small by construction); scoring is
    a broadcast nested-loop over the corpus — a narrow O(N·Q) map with no
    corpus shuffle; per-query top-k via a window over the query partition.
    At 100 TB with large Q the corpus side would pre-prune via IVF cells
    (llm_ann_ivf) before this exact scorer.
    """
    emb = load_embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        fan_out(emb).join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                _dot(F.col("embedding"), F.col("q_emb"))
                / (_norm(F.col("embedding")) * _norm(F.col("q_emb")))
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("q_id", "vec_id", F.col("rk"), F.round("cosine", 6).alias("cosine_r"))
    )


def _ivf_centroids(emb: DataFrame) -> DataFrame:
    """(label, centroid: array<double>) element-wise cell means via
    quantized int64 component sums (floor(x·1e6 + 0.5)) — associative,
    partition/merge-order independent, SQL-reproducible; computed
    distributed (posexplode + two hash aggs), never collected. Shared by
    llm_ann_ivf and the persisted-index probe so the cell geometry cannot
    drift between the ad-hoc and the indexed path."""
    comps = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("i", "x")
    )
    return (
        comps.groupBy("label", "i")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * 1e6 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("s"),
            F.count("*").alias("cnt"),
        )
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("i"),
                        (
                            F.col("s").cast("double")
                            / 1e6
                            / F.col("cnt").cast("double")
                        ).alias("c"),
                    )
                )
            ).alias("pairs")
        )
        .select(
            "label",
            F.transform(F.col("pairs"), lambda p: p.getField("c")).alias(
                "centroid"
            ),
        )
    )


def llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF-style coarse quantization — FULL SQL oracle: centroid
    components accumulate as quantized int64 sums (floor(x·1e6 + 0.5),
    the same partitioning-independent trick as llm_cluster_kmeans), so
    centroids — and every ranking derived from them — are bit-identical
    regardless of partition/merge order and exactly reproducible in
    DuckDB. Cell ranking and the final top-k order on ROUND(sim, 9/6)
    with label/vec_id tiebreaks so the selected SET is engine-invariant.

    Coarse cells = the label clusters; centroids = element-wise means
    (computed distributed via posexplode + groupBy, never collected); the
    query probes its 4 nearest centroids and exact-scores only those cells —
    at 100 TB with c cells and p probes the scorer reads p/c of the corpus,
    and the centroid table (c × dim) is a broadcast dim. The int64
    component sums hold to ~9·10^12 vectors per cell before overflow.
    """
    emb = load_embeddings(spark, sf_dir)
    # element-wise centroid per label, rebuilt as an ordered array
    cent = _ivf_centroids(emb)
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    probe = (
        cent.join(F.broadcast(query))
        .select(
            "label",
            F.round(
                _dot_d(F.col("centroid"), F.col("q_emb"))
                / (_norm_d(F.col("centroid")) * _norm(F.col("q_emb"))),
                9,
            ).alias("c_sim_r"),
        )
        .orderBy(F.desc("c_sim_r"), F.asc("label"))
        .limit(4)
        .select("label")
    )
    pruned = emb.join(F.broadcast(probe), "label")
    scored = pruned.join(F.broadcast(query)).select(
        "vec_id",
        "label",
        F.round(
            _dot(F.col("embedding"), F.col("q_emb"))
            / (_norm(F.col("embedding")) * _norm(F.col("q_emb"))),
            6,
        ).alias("cosine_r"),
    )
    return (
        scored.filter(F.col("vec_id") != 0)
        .orderBy(F.desc("cosine_r"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", "cosine_r")
    )


#: Materialized IVF index layouts, cached per (process, sf_dir); the lock
#: guards against the prewarm thread building the same layout concurrently.
_INDEX_CACHE: dict[str, str] = {}
_INDEX_LOCK = threading.Lock()


def ann_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the IVF index as a CELL-PARTITIONED parquet layout —
    the stored form of a vector index in a lakehouse: one directory per
    coarse cell, so a probe's cell predicate prunes at the partition
    level and never opens the other cells' files. Cached per (process,
    sf_dir) like the partitioned/bucketed layouts in sources.readers."""
    with _INDEX_LOCK:
        if sf_dir not in _INDEX_CACHE:
            out = scratch_dir(prefix="h3r_ivf_") + "/embeddings_by_cell"
            emb = load_embeddings(spark, sf_dir)
            (
                emb.withColumn("cell", F.col("label"))
                .repartition("cell")  # one writer task per cell
                .write.mode("overwrite")
                .partitionBy("cell")
                .parquet(out)
            )
            _INDEX_CACHE[sf_dir] = out
    return _INDEX_CACHE[sf_dir]


def llm_ann_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3h — IVF serving against the PERSISTED index: identical results to
    llm_ann_ivf (same centroids via the shared ``_ivf_centroids``, same
    probe ranking, same scoring — the oracle is literally the IVF oracle),
    but the physical access path is the production one: the corpus lives
    as a cell-partitioned parquet index (``ann_index_path``), the probe
    resolves its top-4 cells to LITERALS driver-side (a ≤4-row
    control-plane collect, the same bounded pattern as llm_ann_lsh's
    query-band resolution), and the scan reads ONLY those cells'
    directories — ``PartitionFilters: [cell IN (...)]`` in the plan,
    asserted by a gate. At 100 TB with c cells and p probes this is the
    difference between reading p/c of the index files and reading all of
    them; the ad-hoc llm_ann_ivf form still scans the full corpus once to
    apply its cell semi-join."""
    emb = load_embeddings(spark, sf_dir)
    cent = _ivf_centroids(emb)
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    probe_labels = [
        r["label"]
        for r in (
            cent.join(F.broadcast(query))
            .select(
                "label",
                F.round(
                    _dot_d(F.col("centroid"), F.col("q_emb"))
                    / (_norm_d(F.col("centroid")) * _norm(F.col("q_emb"))),
                    9,
                ).alias("c_sim_r"),
            )
            .orderBy(F.desc("c_sim_r"), F.asc("label"))
            .limit(4)
            .collect()
        )
    ]
    index = spark.read.parquet(ann_index_path(spark, sf_dir))
    pruned = index.filter(F.col("cell").isin(probe_labels))
    scored = pruned.join(F.broadcast(query)).select(
        "vec_id",
        F.col("cell").cast("int").alias("label"),
        F.round(
            _dot(F.col("embedding"), F.col("q_emb"))
            / (_norm(F.col("embedding")) * _norm(F.col("q_emb"))),
            6,
        ).alias("cosine_r"),
    )
    return (
        scored.filter(F.col("vec_id") != 0)
        .orderBy(F.desc("cosine_r"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", "cosine_r")
    )


_N_PLANES = 48
_BAND_WIDTH = 4  # bits per band → 12 bands
_PLANE_SEED = 7
_PLANES_CACHE: dict[int, list[list[float]]] = {}


def _planes(dim: int) -> list[list[float]]:
    """Seeded Gaussian hyperplanes as plain constants.

    Gaussian directions are the correct random-hyperplane family — an
    earlier integer-lattice formula was measurably biased (recall 1/10 vs
    6/10 at identical banding). The seed is fixed, so planes are identical
    across runs, partitions, and cluster sizes with zero coordination: they
    ship inside the plan as a folded literal, nothing is broadcast.
    """
    if dim not in _PLANES_CACHE:
        import numpy as np

        rng = np.random.default_rng(_PLANE_SEED)
        _PLANES_CACHE[dim] = [
            [float(v) for v in row] for row in rng.standard_normal((_N_PLANES, dim))
        ]
    return _PLANES_CACHE[dim]


def _band_sig(col_name: str, dim: int) -> F.Column:
    """12 position-keyed band values: band b packs 4 sign bits
    sign(embedding · plane_j) as ``b·16 + bits`` (LSH banding: any shared
    (position, bits) value makes a candidate — same AND-OR construction as
    MinHash LSH; keying by position lets candidate matching be a plain
    ``arrays_overlap`` instead of an exploded positional join).

    Two formulation rules that dominate cost here:

    - The plane matrix ships as ONE ``from_json`` node over a JSON string
      literal, which ConstantFolding collapses to a single materialized
      array<array<double>> Literal at optimization time (verified in the
      optimized plan) — not 48×dim element-wise ``F.lit`` calls, which
      build a ~3000-node tree that py4j marshals node-by-node and Catalyst
      re-walks every pass (measured ~4 s of Column construction alone at
      dim=64; a 2-D ndarray literal is unsupported in classic mode).
    - Banding and the dot products are FUSED in one expression, indexing
      planes per (band, bit) position, so each plane's fold is evaluated
      exactly once per row. The split bits-column-then-pack form is a trap:
      CollapseProject inlines the 48-fold bits array into every consumer,
      and whole-stage codegen then compiles the ×12-unrolled fold into one
      giant janino method (~16 s of driver compile time at sf0.01).

    The tree is constant per (column name, dim) — planes are seeded
    literals — and costs ~70 ms of py4j construction per call, rebuilt by
    every batched-LSH consumer, so it is ``expr_memo``-cached
    (optimization round 16, guide §7.3); the signature takes the column
    NAME so the memo key stays hashable.
    """
    import json

    def build() -> F.Column:
        emb = F.col(col_name)
        planes_lit = F.from_json(
            F.lit(json.dumps(_planes(dim))), "array<array<double>>"
        )
        return F.transform(
            F.sequence(F.lit(0), F.lit(_N_PLANES // _BAND_WIDTH - 1)),
            lambda b: F.aggregate(
                F.sequence(F.lit(0), F.lit(_BAND_WIDTH - 1)),
                # fold starts at b: after 4 shift-ins the value is b·16 + bits
                b,
                lambda acc, k: acc * 2
                + (
                    F.aggregate(
                        F.zip_with(
                            emb,
                            F.element_at(
                                planes_lit,
                                (b * _BAND_WIDTH + k + 1).cast("int"),
                            ),
                            lambda x, h: x.cast("double") * h,
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    > 0
                ).cast("int"),
            ),
        )

    return expr_memo(("band_sig", col_name, dim), build)


def _band_sig_local(vec: list[float]) -> list[int]:
    """Driver-side twin of ``_band_sig`` for a single query vector: same
    planes, same LEFT-FOLD accumulation order (a plain Python loop, not
    numpy's pairwise/SIMD reduction), so the sign bits — and therefore the
    buckets — are bit-identical to what the distributed expression computes
    for the same vector."""
    planes = _planes(len(vec))
    bits = []
    for p in planes:
        acc = 0.0
        for x, h in zip(vec, p):
            acc += x * h
        bits.append(1 if acc > 0 else 0)
    out = []
    for b in range(_N_PLANES // _BAND_WIDTH):
        v = b
        for k in range(_BAND_WIDTH):
            v = v * 2 + bits[b * _BAND_WIDTH + k]
        out.append(v)
    return out


def llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane (SimHash) LSH bucketing — the second scale
    path next to IVF. FULL SQL oracle: the seeded-Gaussian planes are plain
    double constants shipped verbatim into the oracle SQL, and both engines
    compute the sign bits with the identical left-fold dot product, so
    bucket membership — and the rounded-cosine top-k — replays exactly in
    DuckDB (plus the recall-vs-exact property test in
    tests/test_llm_props.py).

    Corpus side: ONE narrow pass computes the 12×4 band signature per
    vector, filters to vectors sharing ANY (position, bits) band with the
    query via ``arrays_overlap`` against a 12-int literal, and exact-scores
    the survivors — no explode, no join, no distinct; the only wide node is
    the final TakeOrderedAndProject. The query's bands and embedding are
    resolved driver-side (one 1-row lookup job) and ship inside the plan as
    literals: a single query never justifies shuffling the corpus. For
    query BATCHES, persist the (vec_id, bands) relation once and semi-join
    it instead — the signature pass amortizes across queries.

    Banding is tuned for the fixture corpus, whose nearest neighbors sit
    at cosine ≈0.3-0.48 — close to the random-pair level, the hardest
    regime for LSH (measured here: ~0.6 candidate fraction for 8/10
    recall). On a near-dup-bearing corpus (cosine ≥0.9 targets — the
    actual dedup/retrieval regime) the SAME banding recalls near-certainly
    at a few-percent candidate fraction; at 100 TB tune bits-per-band up
    for finer buckets.
    """
    emb = load_embeddings(spark, sf_dir)
    qe = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    dim = len(qe)
    q_bands = _band_sig_local(qe)
    # query norm driver-side, same left-fold order as _norm
    acc = 0.0
    for x in qe:
        acc += x * x
    q_norm = acc**0.5
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("bands", _band_sig("embedding", dim))
        .filter(F.arrays_overlap(F.col("bands"), F.lit(q_bands)))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.lit(qe))
                / (_norm(F.col("embedding")) * F.lit(q_norm)),
                6,
            ).alias("cosine_r"),
        )
    )
    # rank on the ROUNDED cosine with vec_id tiebreak: the top-10 SET is
    # then invariant to sub-1e-6 float differences across engines, which
    # is what lets this key carry a full SQL oracle
    return (
        scored.orderBy(F.desc("cosine_r"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "cosine_r")
    )


def _batch_candidates(
    emb: DataFrame, dim: int, max_bucket: int
) -> DataFrame:
    """(q_id, vec_id) LSH candidate pairs for the batched-query path,
    shared by llm_ann_batch and llm_serving_e2e: both sides compute the
    12 position-keyed band values in ONE narrow pass (``_band_sig``),
    candidates come from an equi-join on the exploded single-int band
    value, corpus-side buckets above ``max_bucket`` are dropped first
    (broadcast anti-join on the counted oversized list), and survivor
    pairs dedupe on the ID PAIR alone — the band join and the dedupe
    exchange carry 2 longs/row, never the float arrays.

    The banded relation is CHECKPOINTED: it feeds three consumers (query
    side, corpus side, bucket counts), and the 48-plane fold is the
    dominant per-row cost — without the barrier Spark re-evaluates it
    per consumer (measured 77 s vs ~15 s for one pass at 200k vectors).
    This IS the "persist the (vec_id, bands) relation once" production
    shape the single-query LSH docstring promises; the materialized form
    is n×12 rows of two longs."""
    # fan_out (guide §2.5): the 48-plane fold is the dominant per-row cost
    # and the fixture embeddings are one parquet split — without the
    # spread the checkpoint materialization was a ~0.6 s single-task
    # stage at sf0.1 (32 idle cores); a no-op at warehouse scale.
    banded = fan_out(emb).select(
        "vec_id",
        F.explode(_band_sig("embedding", dim)).alias("band"),
    ).localCheckpoint()
    q_bands = banded.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "band"
    )
    c_bands = banded.filter(F.col("vec_id") >= 10).select("vec_id", "band")
    big = (
        c_bands.groupBy("band")
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") > max_bucket)
        .select("band")
    )
    kept = c_bands.join(F.broadcast(big), "band", "left_anti")
    return (
        kept.join(q_bands, "band")
        .select("q_id", "vec_id")
        .dropDuplicates(["q_id", "vec_id"])
    )


def llm_ann_batch(
    spark: SparkSession, sf_dir: str, max_bucket: int = 1000
) -> DataFrame:
    """L3e — BATCHED hyperplane-LSH ANN: the "query batches switch to a
    persisted-signature semi-join" path that llm_ann_lsh's docstring
    promises, as a first-class operator. Queries = vec_id < 10 (the
    seed-set convention of llm_knn_join); corpus = the rest.

    Both sides compute the 12 position-keyed band values in ONE narrow
    pass (shared ``_band_sig``); candidates come from an equi-join on
    the exploded band value (the band id is baked into the value, so a
    single int column is the join key — no struct keys, no
    arrays_overlap scan per query). Corpus-side band buckets above
    ``max_bucket`` are dropped first (broadcast anti-join on the counted
    oversized list — the same skew guard as every blocking scheme here),
    so a boilerplate bucket can never fan out O(bucket × Q) rows in one
    task. Survivor pairs dedupe on (query, candidate), exact-score once,
    and take top-3 per query through a WindowGroupLimit-prunable
    row_number. Scale: ONE corpus-band shuffle + a |pairs| dedupe — the
    corpus never joins the query set at large, unlike the O(N·Q) exact
    llm_knn_join this prunes for.

    Full SQL oracle: same plane literals, same band packing, same
    rounded tie-broken ranking as llm_ann_lsh's."""
    emb = load_embeddings(spark, sf_dir)
    dim = embedding_dim(spark, sf_dir)
    cand = _batch_candidates(emb, dim, max_bucket)
    q_emb = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        cand.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(q_emb), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("q_emb"))
                / (_norm(F.col("embedding")) * _norm(F.col("q_emb"))),
                6,
            ).alias("cosine_r"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine_r"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("q_id", "rk", "vec_id", "cosine_r")
    )


_PQ_M = 4        # subspaces
_PQ_K = 8        # centroids per subspace
_PQ_SEED_STEP = 7  # codebook init: centroid c seeds from vec_id 1 + 7c


def _pq_subvectors(emb: DataFrame, sub_dim: int) -> DataFrame:
    """(vec_id, s, subvec): each embedding split into _PQ_M contiguous
    subspace slices — one narrow explode, no shuffle."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice("embedding", s * sub_dim + 1, sub_dim).alias(
                    "subvec"
                ),
            )
            for s in range(_PQ_M)
        ]
    )
    return emb.select(
        "vec_id", F.explode(slices).alias("sl")
    ).select("vec_id", F.col("sl.s").alias("s"), F.col("sl.subvec").alias("subvec"))


def _pq_assign(sub: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment per (vec, subspace): distances on the
    broadcast M×K codebook, ranked by (ROUND(d², 9), centroid) so the
    chosen code is engine- and partition-invariant."""
    d2 = F.aggregate(
        F.zip_with(
            "subvec",
            "centroid",
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = sub.join(F.broadcast(cents), "s").select(
        "vec_id",
        "s",
        "subvec",
        "c",
        "centroid",
        F.round(d2, 9).alias("d2_r"),
    )
    best = F.min(F.struct(F.col("d2_r"), F.col("c"))).alias("bk")
    chosen = scored.groupBy("vec_id", "s").agg(best).select(
        "vec_id", "s", F.col("bk.c").alias("c")
    )
    return scored.join(chosen, ["vec_id", "s", "c"]).select(
        "vec_id", "s", "c", "subvec", "centroid"
    )


def llm_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3g — product quantization (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the embedding splits into
    ``_PQ_M`` contiguous subspaces, each quantized against its own
    ``_PQ_K``-centroid codebook — the compression format ANN serving
    tiers store (M small codes per vector instead of the float array;
    here 4 codes ≈ 64× smaller than float32·64).

    One Lloyd refinement round per subspace, all in the engine's
    deterministic idiom: codebooks seed from fixed vec_ids (1 + 7c, the
    llm_cluster_kmeans pattern), refined centroids accumulate as
    quantized int64 component sums (floor(x·1e6 + 0.5) — associative,
    partition-order-free), assignment ranks on ROUND(d², 9) with
    centroid tiebreak, and the reported per-cell distortion is the sum
    of PER-ELEMENT quantized squared errors floor((x−c)²·1e6 + 0.5) —
    an integer, so no float-summation order can leak into the output.
    Scale: the codebook is M×K rows (broadcast dim); both assignment
    passes are narrow corpus maps plus one (vec, subspace) argmin agg;
    the component aggregation exchanges carry M·K·sub_dim rows. Full SQL
    oracle replaying init → refine → assign → distortion."""
    emb = load_embeddings(spark, sf_dir)
    dim = embedding_dim(spark, sf_dir)
    sub_dim = dim // _PQ_M
    sub = _pq_subvectors(emb, sub_dim)
    seed_ids = [1 + _PQ_SEED_STEP * c for c in range(_PQ_K)]
    id_to_c = F.create_map(
        *[F.lit(x) for pair in ((vid, c) for c, vid in enumerate(seed_ids)) for x in pair]
    )
    cents0 = (
        sub.filter(F.col("vec_id").isin(seed_ids))
        .select(
            "s",
            id_to_c[F.col("vec_id")].alias("c"),
            F.transform("subvec", lambda x: x.cast("double")).alias(
                "centroid"
            ),
        )
    )
    assigned = _pq_assign(sub, cents0)
    comps = assigned.select(
        "s", "c", F.posexplode("subvec").alias("i", "x")
    )
    cents1 = (
        comps.groupBy("s", "c", "i")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * 1e6 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("ssum"),
            F.count("*").alias("cnt"),
        )
        .groupBy("s", "c")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("i"),
                        (
                            F.col("ssum").cast("double")
                            / 1e6
                            / F.col("cnt").cast("double")
                        ).alias("v"),
                    )
                )
            ).alias("pairs")
        )
        .select(
            "s",
            "c",
            F.transform(F.col("pairs"), lambda p: p.getField("v")).alias(
                "centroid"
            ),
        )
    )
    final = _pq_assign(sub, cents1)
    err = F.aggregate(
        F.zip_with(
            "subvec",
            "centroid",
            lambda x, y: F.floor(
                (x.cast("double") - y) * (x.cast("double") - y) * 1e6
                + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        final.select("s", "c", err.alias("err_micro"))
        .groupBy("s", "c")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("err_micro").alias("distortion_micro"),
        )
        .select(
            F.col("s").alias("subspace"),
            F.col("c").alias("code"),
            "n_vecs",
            "distortion_micro",
        )
    )


def llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the storage
    step of a vector pipeline (4× smaller than float32, the format ANN
    serving tiers read). Per-vector max-abs scaling: q_i = floor(127·x_i /
    max|x| + 0.5), scale = max|x| / 127 reconstructs.

    Entirely narrow (per-row array transforms, no shuffle, no UDF — the
    quantizer is codegen'd JVM arithmetic), so it runs at scan speed over
    any corpus. Rounding is written as floor(v + 0.5) — an explicitly
    defined half-up — rather than engine ROUND, whose half-way tie rule
    differs between engines; outputs are exact integers (checksums,
    extrema) plus the 6-decimal scale, so the op carries a full SQL
    oracle without shipping the array through the comparator."""
    emb = load_embeddings(spark, sf_dir)
    absmax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * 127.0 / F.col("absmax") + 0.5
        ).cast("int"),
    )
    staged = emb.select("vec_id", "embedding", absmax.alias("absmax"))
    quantized = staged.filter(F.col("absmax") > 0).select(
        "vec_id", F.col("absmax"), q.alias("q")
    )
    return quantized.select(
        "vec_id",
        F.size("q").alias("n_dims"),
        F.round(F.col("absmax") / 127.0 + F.lit(5e-13), 6).alias("scale_r"),
        F.aggregate(
            F.col("q"), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


def _dot_d(a: F.Column, b: F.Column) -> F.Column:
    """Dot where ``a`` is already double[] (centroids)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_d(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


_RS_CAND = 50   # approximate-phase candidates
_RS_TOPK = 10   # final exact top-k


def llm_ann_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3f — quantize-then-rescore search (the SQ serving pattern): phase
    1 scans INT8 codes (llm_embed_quantize's format, 4x less IO) and
    ranks by the integer code dot product — exact int64 arithmetic, so
    unlike a float approximate score it is bit-deterministic and fully
    SQL-replayable; phase 2 re-scores only the top-50 candidates with
    exact float cosine and returns the top-10.

    This completes the ANN family: brute force (L3) / IVF cells (L3b) /
    LSH buckets (L3d) prune WHICH vectors to score; rescoring prunes
    PRECISION — scan cheap codes everywhere, pay float math on 50 rows.
    At 100 TB phase 1 reads the int8 column only (columnar pruning);
    phase 2's candidate relation is broadcast-sized. Full SQL oracle
    (integer phase-1 ranks + the 6-dp-rounded cosine convention of
    L3)."""
    emb = load_embeddings(spark, sf_dir)
    absmax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    qcode = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * 127.0 / F.col("absmax") + 0.5
        ).cast("long"),
    )
    def coded_over(src: DataFrame) -> DataFrame:
        return (
            src.select("vec_id", "embedding", absmax.alias("absmax"))
            .filter(F.col("absmax") > 0)
            .select("vec_id", "embedding", qcode.alias("qc"))
        )

    # corpus side fanned out BELOW the int8-code projection (guide §2.5)
    # so the quantization + integer-dot folds parallelize; the query side
    # derives from the raw scan, keeping its vec_id pushdown.
    coded = coded_over(fan_out(emb))
    qry = coded_over(emb).filter(F.col("vec_id") == 0).select(
        F.col("qc").alias("q_qc"), F.col("embedding").alias("q_emb")
    )
    int_dot = F.aggregate(
        F.zip_with(F.col("qc"), F.col("q_qc"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    cand = (
        coded.join(F.broadcast(qry))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding", "q_emb", int_dot.alias("approx_score"))
        .orderBy(F.desc("approx_score"), F.asc("vec_id"))
        .limit(_RS_CAND)
    )
    cos = _dot(F.col("embedding"), F.col("q_emb")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_emb"))
    )
    return (
        cand.select("vec_id", "approx_score", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(_RS_TOPK)
        .select("vec_id", "approx_score", F.round("cosine", 6).alias("cosine_r"))
    )


_KM_K = 8               # clusters
_KM_ITERS = 3           # Lloyd iterations (assignments; K-1 recomputes)
_KM_STEP = 61           # init: centroid c seeds from vec_id = 61*c
_KM_CQ = 1_000_000_000.0   # centroid-sum quantizer (1e-9 resolution)
_KM_DQ = 1_000_000.0       # inertia quantizer (1e-6 resolution)


def _km_dist2(x: F.Column, c: F.Column) -> F.Column:
    """Squared L2 as an index-ordered fold (bit-deterministic; 0.0+v == v
    exactly in IEEE, so the zero-init fold equals DuckDB's list_reduce)."""
    return F.aggregate(
        F.zip_with(x, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _km_assign(pts: DataFrame, cent: DataFrame) -> DataFrame:
    """Each point to its nearest centroid — argmin computed NARROWLY
    (optimization round 15, guide §2.4): the K×dim centroid relation is
    collapsed to a ONE-ROW sorted array and attached by broadcast, and the
    argmin is ``array_min`` over per-centroid (d2, cluster) structs — the
    struct ordering (d2 first, cluster tiebreak) is exactly the
    ``orderBy("d2", "cluster")`` of the row_number formulation this
    replaces, so the selected (cluster, d2) per point is bit-identical.

    What this removes per Lloyd iteration: the K× row fan-out, one
    corpus-sized ``hashpartitioning(vec_id)`` exchange, and the per-point
    sort the window argmin paid. The corpus now never shuffles for the
    assignment at ANY scale; the only remaining per-iteration exchange is
    the recompute's (cluster, position) hash agg. The empty-``cent`` edge
    keeps the old join semantics via the isNotNull filter (empty array →
    NULL argmin → row dropped, exactly as the inner join dropped it).

    The argmin is bound behind a Generate barrier (explode of a 1-element
    array — the _shingles idiom): it feeds THREE references (the null
    filter and both getFields), and without the barrier CollapseProject
    inlines the K×dim distance transform into every reference — measured
    3× the per-row distance work, which more than repaid the saved
    exchange at fixture scale.

    Both expression trees are constant (fixed column names, no runtime
    data) and rebuilt per Lloyd iteration — the argmin tree alone costs
    ~45 ms of py4j construction — so they are ``expr_memo``-cached
    (optimization round 16, guide §7.3 driver fixed costs)."""
    cents = cent.agg(
        expr_memo(
            ("km_cents_agg",),
            lambda: F.array_sort(
                F.collect_list(F.struct("cluster", "c"))
            ).alias("_cents"),
        )
    )
    best = expr_memo(
        ("km_best",),
        lambda: F.array_min(
            F.transform(
                F.col("_cents"),
                lambda cc: F.struct(
                    _km_dist2(F.col("x"), cc.getField("c")).alias("d2"),
                    cc.getField("cluster").alias("cluster"),
                ),
            )
        ),
    )
    return (
        pts.join(F.broadcast(cents))
        .select("vec_id", "x", F.explode(F.array(best)).alias("_best"))
        .filter(F.col("_best").isNotNull())
        .select(
            "vec_id",
            "x",
            F.col("_best").getField("cluster").alias("cluster"),
            F.col("_best").getField("d2").alias("d2"),
        )
    )


def _km_recompute(assigned: DataFrame) -> DataFrame:
    """Element-wise centroid means from QUANTIZED component sums: each
    component maps to floor(v*1e9 + 0.5) (exact double arithmetic), sums
    accumulate as int64 (associative — partitioning-independent, unlike a
    double fold), and the mean divides once per (cluster, position).

    (Round-15 A/B note: computing the dim component sums as dim aggregate
    columns in one groupBy — the MinHash-signature idiom — removes the
    posexplode and one Exchange per iteration, but the 64-wide array
    constructor then nests multiplicatively through the iterated
    assign→recompute chain and Catalyst analysis/optimization of the
    final plan ballooned from ~0.6 s to ~3.4 s of driver time; the
    posexplode form keeps the per-iteration expression tree opaque to
    the next layer and measured strictly faster end-to-end.)

    Dataset-chain fusion (optimization round 16, guide §7.3): the mean
    projection is computed INSIDE the second aggregate's collect_list
    struct and the array regroup INSIDE the same agg expression, so the
    chain is 3 eagerly-analyzed Datasets instead of 5 — each creation
    costs ~7-15 ms of JVM analysis and the recompute runs per Lloyd
    iteration. Values are unchanged: the struct sorts by (i, m) with i
    unique per cluster, identical order to the old (i, m) collect."""
    comps = assigned.select(
        "cluster", F.posexplode(F.col("x")).alias("i", "v")
    )
    sums = comps.groupBy("cluster", "i").agg(
        expr_memo(
            ("km_sq",),
            lambda: F.sum(
                F.floor(F.col("v") * _KM_CQ + F.lit(0.5)).cast("bigint")
            ).alias("sq"),
        ),
        expr_memo(("km_n",), lambda: F.count("*").alias("n")),
    )
    return sums.groupBy("cluster").agg(
        expr_memo(
            ("km_regroup",),
            lambda: F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("i"),
                            (
                                (
                                    F.col("sq").cast("double")
                                    / F.col("n").cast("double")
                                )
                                / F.lit(_KM_CQ)
                            ).alias("m"),
                        )
                    )
                ),
                lambda p: p.getField("m"),
            ).alias("c"),
        )
    )


def llm_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L19 — distributed k-means (Lloyd's), the embedding-space
    clustering step (semantic dedup blocking, topic bucketing, IVF
    codebook training — the learned version of llm_ann_ivf's label
    cells). K=8, 3 assignment passes, centroids seeded from fixed
    vec_ids (61·c) — fully deterministic, no RNG.

    Scale + determinism design: every iteration is one broadcast join of
    the corpus against the K x dim centroid relation (centroids never
    collect to the driver) plus one (cluster, position)-keyed hash agg.
    Centroid means accumulate QUANTIZED int64 component sums
    (floor(v·1e9+0.5)) — associative, so results are bit-identical on
    any partitioning AND expressible in SQL: the DuckDB oracle replays
    all three unrolled iterations and must land on the identical
    per-cluster membership and quantized inertia. At 100 TB each
    iteration localCheckpoints to stop plan growth; here 3 iterations
    stay one lazy plan. Empty clusters drop out of the recompute
    identically in both engines."""
    emb = load_embeddings(spark, sf_dir)
    # (Round-15 A/B note: fanning pts out to 32 partitions — with or
    # without a localCheckpoint — measured +0.1/+0.4 s here: at 2000
    # fixture vectors the three ~230 ms single-task assignment stages
    # are cheaper than the added exchanges; the corpus-sized
    # parallelization win belongs to _sem_vectors/llm_dedup_semantic,
    # whose corpus is 2.5× larger with far heavier per-row work.)
    pts = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    cent = pts.filter(
        (F.col("vec_id") % _KM_STEP == 0)
        & (F.col("vec_id") <= _KM_STEP * (_KM_K - 1))
    ).select(
        (F.col("vec_id") / _KM_STEP).cast("bigint").alias("cluster"),
        F.col("x").alias("c"),
    )
    assigned = None
    for _ in range(_KM_ITERS):
        assigned = _km_assign(pts, cent)
        cent = _km_recompute(assigned)
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.sum(
            F.floor(F.col("d2") * _KM_DQ + F.lit(0.5)).cast("bigint")
        ).alias("inertia_q"),
    )


def llm_eval_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L23 — retrieval-quality evaluation as a distributed op: recall@10
    and the rank of the exact-best hit, comparing the quantize-rescore
    path (L3f) against the exact brute-force baseline (L3) — the metric
    job a serving tier runs continuously to catch quantization/recall
    drift. Both sub-pipelines are the registered operators themselves;
    the comparison is a broadcast-sized join of two 10-row relations."""
    from pyspark.sql import Window

    exact = (
        llm_similarity_topk(spark, sf_dir)
        .withColumn(
            "exact_rank",
            F.row_number().over(
                Window.orderBy(F.desc("cosine_r"), F.asc("vec_id"))
            ),
        )
        .select("vec_id", "exact_rank")
    )
    resc = (
        llm_ann_rescore(spark, sf_dir)
        .withColumn(
            "resc_rank",
            F.row_number().over(
                Window.orderBy(F.desc("cosine_r"), F.asc("vec_id"))
            ),
        )
        .select("vec_id", "resc_rank")
    )
    joined = exact.join(resc, "vec_id")
    return joined.agg(
        F.count("*").alias("n_overlap"),
        (F.count("*").cast("double") / F.lit(10.0)).alias("recall_at_10"),
        F.min(
            F.when(F.col("exact_rank") == 1, F.col("resc_rank"))
        ).alias("rank_of_best"),
    )


_SRV_CAND = 10   # int8-tier survivors per query
_SRV_TOPK = 3    # served results per query


def llm_serving_e2e(
    spark: SparkSession, sf_dir: str, max_bucket: int = 1000
) -> DataFrame:
    """L24 — the composed SERVING stack, end to end, as one operator: the
    three tiers a production retrieval service chains (prune WHICH vectors
    via batched hyperplane-LSH banding → prune PRECISION via int8-code
    integer dot ranking → exact float rescore of the survivors), evaluated
    per query against the exact brute-force top-k. This is the proof that
    the individually-verified tiers (llm_ann_batch's candidate stage,
    llm_embed_quantize's code format, llm_ann_rescore's two-phase ranking)
    COMPOSE: candidates come from `_batch_candidates` (the same capped
    band join llm_ann_batch uses), the approximate tier keeps the top
    ``_SRV_CAND`` per query by bit-deterministic integer score, the exact
    tier serves the top ``_SRV_TOPK``, and the output reports per query
    how the served set compares to ground truth.

    Output: (q_id, n_cand, recall_at_3, rank_of_best) — candidate-set
    size, |served ∩ exact-top-3| / 3, and where the true best landed in
    the served ranking (NULL if it was pruned away).

    Scale: ONE corpus-band shuffle for candidates; the int8 tier reads
    codes only (columnar pruning at 100 TB); the exact tier touches
    ≤ _SRV_CAND rows per query; only the ground-truth baseline is a full
    corpus × query scan — the eval side, run on a sample in production
    (here the fixture IS the sample). Full SQL oracle replaying all three
    tiers plus the baseline."""
    emb = load_embeddings(spark, sf_dir)
    dim = embedding_dim(spark, sf_dir)
    # cand feeds TWO consumers (the int8 tier join and the per-query
    # candidate count) and Catalyst does not CSE the band-join + dedup
    # subtree — persist the (q_id, vec_id) relation (2 longs/row,
    # |candidates|-sized at any scale) so it computes once per invocation
    # (optimization round 15, guide §2.4; registry-managed like the other
    # keyed persists, so repeated invocations never leak cached relations)
    from .dedup import _PAIR_LOCK, _swap_cache

    with _PAIR_LOCK:
        cand = _swap_cache(
            "serving_cand", _batch_candidates(emb, dim, max_bucket)
        )
    absmax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    qcode = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") * 127.0 / F.col("absmax") + 0.5
        ).cast("long"),
    )
    def coded_over(src: DataFrame) -> DataFrame:
        return (
            src.select("vec_id", "embedding", absmax.alias("absmax"))
            .filter(F.col("absmax") > 0)
            .select("vec_id", "embedding", qcode.alias("qc"))
        )

    # corpus-side int8 coding fanned out (guide §2.5 — the rescore split);
    # the query side derives from the raw scan for vec_id pushdown.
    coded = coded_over(fan_out(emb))
    qside = coded_over(emb).filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("qc").alias("q_qc"),
    )
    int_dot = F.aggregate(
        F.zip_with(F.col("qc"), F.col("q_qc"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    t1 = (
        cand.join(coded, "vec_id")
        .join(F.broadcast(qside), "q_id")
        .select(
            "q_id",
            "vec_id",
            "embedding",
            "q_emb",
            int_dot.alias("approx_score"),
        )
    )
    w_approx = Window.partitionBy("q_id").orderBy(
        F.desc("approx_score"), F.asc("vec_id")
    )
    surv = t1.withColumn("ark", F.row_number().over(w_approx)).filter(
        F.col("ark") <= _SRV_CAND
    )
    cos_r = F.round(
        _dot(F.col("embedding"), F.col("q_emb"))
        / (_norm(F.col("embedding")) * _norm(F.col("q_emb"))),
        6,
    )
    w_exact = Window.partitionBy("q_id").orderBy(
        F.desc("cosine_r"), F.asc("vec_id")
    )
    served = (
        surv.select("q_id", "vec_id", cos_r.alias("cosine_r"))
        .withColumn("rk", F.row_number().over(w_exact))
        .filter(F.col("rk") <= _SRV_TOPK)
    )
    # ground truth ranks over the UNfiltered corpus/query relations (the
    # absmax guard above applies only to the int8 code tier)
    base = (
        fan_out(emb.filter(F.col("vec_id") >= 10), probe=emb)
        .join(
            F.broadcast(
                emb.filter(F.col("vec_id") < 10).select(
                    F.col("vec_id").alias("q_id"),
                    F.col("embedding").alias("q_emb"),
                )
            )
        )
        .select("q_id", "vec_id", cos_r.alias("cosine_r"))
        .withColumn("brk", F.row_number().over(w_exact))
        .filter(F.col("brk") <= _SRV_TOPK)
    )
    per_q = (
        served.join(base.select("q_id", "vec_id", "brk"), ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.min(F.when(F.col("brk") == 1, F.col("rk"))).alias(
                "rank_of_best"
            ),
        )
    )
    n_cand = cand.groupBy("q_id").agg(F.count("*").alias("n_cand"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id")
    )
    return (
        queries.join(n_cand, "q_id", "left")
        .join(per_q, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n_cand"), F.lit(0)).alias("n_cand"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(float(_SRV_TOPK))
            ).alias("recall_at_3"),
            "rank_of_best",
        )
    )


#: Shared SQL fragments for cosine terms (same left-fold order as _dot/_norm)
_SQL_DOT_EQ = """list_aggregate(
                       list_transform(range(1, len({a}) + 1),
                           i -> CAST({a}[i] AS DOUBLE)
                              * CAST({b}[i] AS DOUBLE)), 'sum')"""
_SQL_NORM = """sqrt(list_aggregate(list_transform({a},
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"""


def _ivf_oracle_sql() -> str:
    """DuckDB SQL replaying IVF exactly: quantized-int64 centroid sums
    (order-independent by construction), ROUND(sim, 9/6)-ranked probe and
    top-k with label/vec_id tiebreaks — the same contract the operator
    commits to."""
    dot_cq = _SQL_DOT_EQ.format(a="c.centroid", b="q.q_emb")
    norm_c = _SQL_NORM.format(a="c.centroid")
    norm_q = _SQL_NORM.format(a="q.q_emb")
    dot_eq = _SQL_DOT_EQ.format(a="e.embedding", b="q.q_emb")
    norm_e = _SQL_NORM.format(a="e.embedding")
    return f"""
        WITH q AS (
            SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0
        ),
        comp AS (
            SELECT label, i.i AS i,
                   SUM(CAST(FLOOR(CAST(embedding[i.i] AS DOUBLE) * 1000000
                       + 0.5) AS BIGINT)) AS s,
                   COUNT(*) AS cnt
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) i
            GROUP BY label, i.i
        ),
        cent AS (
            SELECT label,
                   list(CAST(s AS DOUBLE) / 1000000.0 / CAST(cnt AS DOUBLE)
                        ORDER BY i) AS centroid
            FROM comp GROUP BY label
        ),
        probe AS (
            SELECT label FROM (
                SELECT c.label,
                       ROUND({dot_cq} / ({norm_c} * {norm_q}), 9) AS c_sim_r
                FROM cent c, q
            ) ORDER BY c_sim_r DESC, label ASC LIMIT 4
        )
        SELECT e.vec_id, e.label,
               ROUND({dot_eq} / ({norm_e} * {norm_q}), 6) AS cosine_r
        FROM embeddings e JOIN probe USING (label), q
        WHERE e.vec_id <> 0
        ORDER BY cosine_r DESC, e.vec_id ASC LIMIT 10
    """


def _lsh_oracle_sql() -> str:
    """DuckDB SQL replaying hyperplane LSH exactly: the seeded-Gaussian
    plane matrix is inlined as a double-literal 2-D list (repr round-trips
    doubles losslessly), sign bits use the identical left-fold dot
    product, band packing is b*16 + 8b1+4b2+2b3+b4 (the unrolled form of
    the operator's shift-in fold), candidates are band-overlap matches,
    and the top-10 orders on ROUND(cosine, 6) with vec_id tiebreak.

    The plane literal is generated for the fixture's dim=64 (the operator
    itself handles any dim)."""
    planes = _planes(64)
    planes_lit = (
        "["
        + ",".join("[" + ",".join(repr(v) for v in row) + "]" for row in planes)
        + "]"
    )
    dot_pj = """list_aggregate(list_transform(range(1, len(s.embedding) + 1),
                    i -> CAST(s.embedding[i] AS DOUBLE) * p.pl[j][i]), 'sum')"""
    dot_eq = _SQL_DOT_EQ.format(a="c.embedding", b="qq.q_emb")
    norm_e = _SQL_NORM.format(a="c.embedding")
    norm_q = _SQL_NORM.format(a="qq.q_emb")
    return f"""
        WITH planes AS (SELECT {planes_lit} AS pl),
        sig AS (
            SELECT vec_id, embedding,
                   list_transform(range(1, {_N_PLANES + 1}),
                       j -> CASE WHEN {dot_pj} > 0 THEN 1 ELSE 0 END) AS bits
            FROM embeddings s, planes p
        ),
        banded AS (
            SELECT vec_id, embedding,
                   list_transform(range(0, {_N_PLANES // _BAND_WIDTH}),
                       b -> b * 16 + bits[b * 4 + 1] * 8 + bits[b * 4 + 2] * 4
                            + bits[b * 4 + 3] * 2 + bits[b * 4 + 4]) AS bands
            FROM sig
        ),
        qq AS (
            SELECT embedding AS q_emb, bands AS q_bands
            FROM banded WHERE vec_id = 0
        ),
        cand AS (
            SELECT b.vec_id, b.embedding
            FROM banded b, qq
            WHERE b.vec_id <> 0
              AND len(list_intersect(b.bands, qq.q_bands)) > 0
        )
        SELECT c.vec_id,
               ROUND({dot_eq} / ({norm_e} * {norm_q}), 6) AS cosine_r
        FROM cand c, qq
        ORDER BY cosine_r DESC, c.vec_id ASC LIMIT 10
    """


def _lsh_cand_ctes() -> str:
    """Shared oracle CTE prefix for the batched-LSH candidate stage
    (llm_ann_batch + llm_serving_e2e): plane literals, band packing,
    corpus-side bucket cap, deduped (q_id, vec_id) pairs."""
    planes = _planes(64)
    planes_lit = (
        "["
        + ",".join("[" + ",".join(repr(v) for v in row) + "]" for row in planes)
        + "]"
    )
    dot_pj = """list_aggregate(list_transform(range(1, len(s.embedding) + 1),
                    i -> CAST(s.embedding[i] AS DOUBLE) * p.pl[j][i]), 'sum')"""
    return f"""planes AS (SELECT {planes_lit} AS pl),
        sig AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(range(1, {_N_PLANES + 1}),
                       j -> CASE WHEN {dot_pj} > 0 THEN 1 ELSE 0 END) AS bits
            FROM embeddings s, planes p
        ),
        expl AS MATERIALIZED (
            SELECT vec_id,
                   unnest(list_transform(
                       range(0, {_N_PLANES // _BAND_WIDTH}),
                       b -> b * 16 + bits[b * 4 + 1] * 8
                            + bits[b * 4 + 2] * 4 + bits[b * 4 + 3] * 2
                            + bits[b * 4 + 4])) AS band
            FROM sig
        ),
        big AS (
            SELECT band FROM expl WHERE vec_id >= 10
            GROUP BY band HAVING COUNT(*) > 1000
        ),
        cand AS (
            SELECT DISTINCT q.vec_id AS q_id, c.vec_id
            FROM expl c
            JOIN expl q ON c.band = q.band
            WHERE c.vec_id >= 10 AND q.vec_id < 10
              AND c.band NOT IN (SELECT band FROM big)
        )"""


def _ann_batch_oracle_sql() -> str:
    """DuckDB SQL replaying ``llm_ann_batch`` exactly: the same plane
    literals and band packing as the single-query LSH oracle, then the
    exploded band equi-join with the corpus-side bucket cap, pair
    dedupe, exact rounded scoring, and top-3 per query."""
    dot_eq = _SQL_DOT_EQ.format(a="ce.embedding", b="qe.embedding")
    norm_c = _SQL_NORM.format(a="ce.embedding")
    norm_q = _SQL_NORM.format(a="qe.embedding")
    return f"""
        WITH {_lsh_cand_ctes()},
        scored AS (
            SELECT cand.q_id, cand.vec_id,
                   ROUND({dot_eq} / ({norm_c} * {norm_q}), 6) AS cosine_r
            FROM cand
            JOIN embeddings ce ON ce.vec_id = cand.vec_id
            JOIN embeddings qe ON qe.vec_id = cand.q_id
        )
        SELECT q_id, rk, vec_id, cosine_r FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY cosine_r DESC, vec_id ASC
            ) AS rk
            FROM scored
        ) WHERE rk <= 3
    """


def _serving_oracle_sql() -> str:
    """DuckDB SQL replaying llm_serving_e2e's full tier chain: the shared
    batched-LSH candidate CTEs, int8 codes + integer-dot approximate
    ranking (top ``_SRV_CAND``/query), exact rounded rescoring (top
    ``_SRV_TOPK``), the brute-force per-query baseline, and the per-query
    recall/rank comparison."""
    dot_sq = _SQL_DOT_EQ.format(a="s.embedding", b="s.q_emb")
    norm_s = _SQL_NORM.format(a="s.embedding")
    norm_sq = _SQL_NORM.format(a="s.q_emb")
    return f"""
        WITH {_lsh_cand_ctes()},
        coded AS MATERIALIZED (
            SELECT vec_id, embedding,
                   list_transform(range(1, len(embedding) + 1),
                       i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 127.0
                            / list_max(list_transform(embedding,
                                  x -> abs(CAST(x AS DOUBLE)))) + 0.5)
                            AS BIGINT)) AS qc
            FROM embeddings
            WHERE list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) > 0
        ),
        t1 AS (
            SELECT cand.q_id, cand.vec_id, c.embedding, q.embedding AS q_emb,
                   CAST(list_aggregate(
                       list_transform(range(1, len(c.qc) + 1),
                           i -> c.qc[i] * q.qc[i]), 'sum') AS BIGINT)
                       AS approx_score
            FROM cand
            JOIN coded c ON c.vec_id = cand.vec_id
            JOIN coded q ON q.vec_id = cand.q_id
        ),
        surv AS (
            SELECT q_id, vec_id, embedding, q_emb FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY q_id
                    ORDER BY approx_score DESC, vec_id ASC) AS ark
                FROM t1
            ) WHERE ark <= {_SRV_CAND}
        ),
        served AS (
            SELECT q_id, vec_id, rk FROM (
                SELECT q_id, vec_id, row_number() OVER (
                    PARTITION BY q_id
                    ORDER BY cosine_r DESC, vec_id ASC) AS rk
                FROM (
                    SELECT s.q_id, s.vec_id,
                           ROUND({dot_sq} / ({norm_s} * {norm_sq}), 6)
                               AS cosine_r
                    FROM surv s
                )
            ) WHERE rk <= {_SRV_TOPK}
        ),
        base AS (
            SELECT q_id, vec_id, brk FROM (
                SELECT q_id, vec_id, row_number() OVER (
                    PARTITION BY q_id
                    ORDER BY cosine_r DESC, vec_id ASC) AS brk
                FROM (
                    SELECT s.q_id, s.vec_id,
                           ROUND({dot_sq} / ({norm_s} * {norm_sq}), 6)
                               AS cosine_r
                    FROM (
                        SELECT qe.vec_id AS q_id, ce.vec_id,
                               ce.embedding, qe.embedding AS q_emb
                        FROM embeddings ce, embeddings qe
                        WHERE ce.vec_id >= 10 AND qe.vec_id < 10
                    ) s
                )
            ) WHERE brk <= {_SRV_TOPK}
        ),
        per_q AS (
            SELECT served.q_id, COUNT(*) AS n_hits,
                   MIN(CASE WHEN base.brk = 1 THEN served.rk END)
                       AS rank_of_best
            FROM served JOIN base USING (q_id, vec_id)
            GROUP BY served.q_id
        ),
        nc AS (SELECT q_id, COUNT(*) AS n_cand FROM cand GROUP BY q_id)
        SELECT e.vec_id AS q_id,
               CAST(COALESCE(nc.n_cand, 0) AS BIGINT) AS n_cand,
               CAST(COALESCE(per_q.n_hits, 0) AS DOUBLE)
                   / {float(_SRV_TOPK)} AS recall_at_3,
               CAST(per_q.rank_of_best AS BIGINT) AS rank_of_best
        FROM embeddings e
        LEFT JOIN nc ON nc.q_id = e.vec_id
        LEFT JOIN per_q ON per_q.q_id = e.vec_id
        WHERE e.vec_id < 10
    """


def _pq_oracle_sql() -> str:
    """DuckDB SQL replaying llm_embed_pq exactly: seed codebooks, one
    quantized-sum Lloyd round, rounded tie-broken assignment, integer
    per-element distortion. Generated for the fixture's dim=64
    (sub_dim=16); the operator itself handles any dim divisible by M."""
    sd = 16
    seeds = ",".join(str(1 + _PQ_SEED_STEP * c) for c in range(_PQ_K))
    d2 = f"""ROUND(list_aggregate(list_transform(range(1, {sd + 1}),
                 i -> (CAST(sv.subvec[i] AS DOUBLE) - ct.centroid[i])
                    * (CAST(sv.subvec[i] AS DOUBLE) - ct.centroid[i])),
                 'sum'), 9)"""
    err = f"""CAST(list_aggregate(list_transform(range(1, {sd + 1}),
                 i -> CAST(FLOOR((CAST(sv.subvec[i] AS DOUBLE)
                        - ct.centroid[i])
                      * (CAST(sv.subvec[i] AS DOUBLE) - ct.centroid[i])
                      * 1000000 + 0.5) AS BIGINT)), 'sum') AS BIGINT)"""
    return f"""
        WITH sub AS MATERIALIZED (
            SELECT vec_id, sp.s AS s,
                   embedding[sp.s * {sd} + 1 : sp.s * {sd} + {sd}] AS subvec
            FROM embeddings,
                 LATERAL (SELECT unnest(range(0, {_PQ_M})) AS s) sp
        ),
        cents0 AS (
            SELECT s, CAST((vec_id - 1) / {_PQ_SEED_STEP} AS INT) AS c,
                   list_transform(subvec, x -> CAST(x AS DOUBLE)) AS centroid
            FROM sub WHERE vec_id IN ({seeds})
        ),
        a0 AS (
            SELECT sv.vec_id, sv.s, ct.c, {d2} AS d2_r
            FROM sub sv JOIN cents0 ct USING (s)
        ),
        ch0 AS (
            SELECT vec_id, s, c FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, s ORDER BY d2_r, c) AS rk
                FROM a0
            ) WHERE rk = 1
        ),
        comp AS (
            SELECT sv.s, ch0.c, i.i AS i,
                   SUM(CAST(FLOOR(CAST(sv.subvec[i.i] AS DOUBLE) * 1000000
                       + 0.5) AS BIGINT)) AS ssum,
                   COUNT(*) AS cnt
            FROM sub sv
            JOIN ch0 ON sv.vec_id = ch0.vec_id AND sv.s = ch0.s,
                 LATERAL (SELECT unnest(range(1, {sd + 1})) AS i) i
            GROUP BY sv.s, ch0.c, i.i
        ),
        cents1 AS MATERIALIZED (
            SELECT s, c,
                   list(CAST(ssum AS DOUBLE) / 1000000.0
                        / CAST(cnt AS DOUBLE) ORDER BY i) AS centroid
            FROM comp GROUP BY s, c
        ),
        a1 AS (
            SELECT sv.vec_id, sv.s, ct.c, {d2} AS d2_r, {err} AS err_micro
            FROM sub sv JOIN cents1 ct USING (s)
        ),
        ch1 AS (
            SELECT vec_id, s, c, err_micro FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, s ORDER BY d2_r, c) AS rk
                FROM a1
            ) WHERE rk = 1
        )
        SELECT s AS subspace, c AS code, COUNT(*) AS n_vecs,
               CAST(SUM(err_micro) AS BIGINT) AS distortion_micro
        FROM ch1 GROUP BY s, c
    """


ORACLES: dict[str, str] = {
    "llm_embed_pq": _pq_oracle_sql(),
    "llm_ann_ivf": _ivf_oracle_sql(),
    # identical results by construction (shared centroids/probe/scoring);
    # only the physical access path differs — so the IVF oracle IS the
    # index-probe oracle
    "llm_ann_index_probe": _ivf_oracle_sql(),
    "llm_ann_lsh": _lsh_oracle_sql(),
    "llm_ann_batch": _ann_batch_oracle_sql(),
    "llm_serving_e2e": _serving_oracle_sql(),
    "llm_eval_ranking": f"""
        WITH coded AS (
            SELECT vec_id, embedding,
                   list_transform(range(1, len(embedding) + 1),
                       i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 127.0
                            / list_max(list_transform(embedding,
                                  x -> abs(CAST(x AS DOUBLE)))) + 0.5)
                            AS BIGINT)) AS qc
            FROM embeddings
            WHERE list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) > 0
        ),
        q AS (SELECT qc AS q_qc, embedding AS q_emb FROM coded
              WHERE vec_id = 0),
        cos_all AS (
            SELECT c.vec_id, c.qc, q.q_qc,
                   list_aggregate(
                       list_transform(range(1, len(c.embedding) + 1),
                           i -> CAST(c.embedding[i] AS DOUBLE)
                              * CAST(q_emb[i] AS DOUBLE)), 'sum')
                   / (sqrt(list_aggregate(list_transform(c.embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           'sum'))
                      * sqrt(list_aggregate(list_transform(q_emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           'sum'))) AS cosine
            FROM coded c, q WHERE c.vec_id <> 0
        ),
        exact AS (
            SELECT vec_id, row_number() OVER (
                       ORDER BY ROUND(cosine, 6) DESC, vec_id ASC)
                       AS exact_rank
            FROM (SELECT * FROM cos_all
                  ORDER BY cosine DESC, vec_id ASC LIMIT {_RS_TOPK})
        ),
        cand AS (
            SELECT vec_id, cosine,
                   list_aggregate(
                       list_transform(range(1, len(qc) + 1),
                           i -> qc[i] * q_qc[i]), 'sum') AS approx_score
            FROM cos_all
            ORDER BY approx_score DESC, vec_id ASC LIMIT {_RS_CAND}
        ),
        resc AS (
            SELECT vec_id, row_number() OVER (
                       ORDER BY ROUND(cosine, 6) DESC, vec_id ASC)
                       AS resc_rank
            FROM (SELECT * FROM cand
                  ORDER BY cosine DESC, vec_id ASC LIMIT {_RS_TOPK})
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap,
               CAST(COUNT(*) AS DOUBLE) / 10.0 AS recall_at_10,
               CAST(MIN(CASE WHEN exact_rank = 1 THEN resc_rank END)
                    AS BIGINT) AS rank_of_best
        FROM exact JOIN resc USING (vec_id)
    """,
    "llm_ann_rescore": f"""
        WITH coded AS (
            SELECT vec_id, embedding,
                   list_transform(range(1, len(embedding) + 1),
                       i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 127.0
                            / list_max(list_transform(embedding,
                                  x -> abs(CAST(x AS DOUBLE)))) + 0.5)
                            AS BIGINT)) AS qc
            FROM embeddings
            WHERE list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) > 0
        ),
        q AS (SELECT qc AS q_qc, embedding AS q_emb FROM coded
              WHERE vec_id = 0),
        cand AS (
            SELECT vec_id, embedding, q_emb,
                   list_aggregate(
                       list_transform(range(1, len(qc) + 1),
                           i -> qc[i] * q_qc[i]), 'sum') AS approx_score
            FROM coded, q WHERE vec_id <> 0
            ORDER BY approx_score DESC, vec_id ASC LIMIT {_RS_CAND}
        ),
        scored AS (
            SELECT vec_id, approx_score,
                   list_aggregate(
                       list_transform(range(1, len(embedding) + 1),
                           i -> CAST(embedding[i] AS DOUBLE)
                              * CAST(q_emb[i] AS DOUBLE)), 'sum')
                   / (sqrt(list_aggregate(list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           'sum'))
                      * sqrt(list_aggregate(list_transform(q_emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           'sum'))) AS cosine
            FROM cand
        )
        SELECT vec_id, CAST(approx_score AS BIGINT) AS approx_score,
               ROUND(cosine, 6) AS cosine_r
        FROM scored
        ORDER BY cosine DESC, vec_id ASC LIMIT {_RS_TOPK}
    """,
    "llm_cluster_kmeans": f"""
        WITH pts AS (
            SELECT vec_id, list_transform(embedding, a -> a::DOUBLE) AS x
            FROM embeddings
        ),
        c0 AS (
            SELECT CAST(vec_id / {_KM_STEP} AS BIGINT) AS cluster, x AS c
            FROM pts
            WHERE vec_id % {_KM_STEP} = 0
              AND vec_id <= {_KM_STEP * (_KM_K - 1)}
        ),
        s1 AS (
            SELECT p.vec_id, p.x, c.cluster,
                   list_reduce(list_transform(range(1, len(p.x) + 1),
                       i -> (p.x[i] - c.c[i]) * (p.x[i] - c.c[i])),
                       (acc, v) -> acc + v) AS d2
            FROM pts p, c0 c
        ),
        a1 AS (
            SELECT vec_id, x, cluster, d2 FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                FROM s1
            ) WHERE rn = 1
        ),
        m1 AS (
            SELECT cluster, i.i AS i,
                   SUM(CAST(FLOOR(x[i.i] * {_KM_CQ} + 0.5) AS BIGINT)) AS sq,
                   COUNT(*) AS n
            FROM a1, (SELECT range AS i FROM range(1, 65)) i
            GROUP BY cluster, i.i
        ),
        c1 AS (
            SELECT cluster,
                   list((CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / {_KM_CQ}
                        ORDER BY i) AS c
            FROM m1 GROUP BY cluster
        ),
        s2 AS (
            SELECT p.vec_id, p.x, c.cluster,
                   list_reduce(list_transform(range(1, len(p.x) + 1),
                       i -> (p.x[i] - c.c[i]) * (p.x[i] - c.c[i])),
                       (acc, v) -> acc + v) AS d2
            FROM pts p, c1 c
        ),
        a2 AS (
            SELECT vec_id, x, cluster, d2 FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                FROM s2
            ) WHERE rn = 1
        ),
        m2 AS (
            SELECT cluster, i.i AS i,
                   SUM(CAST(FLOOR(x[i.i] * {_KM_CQ} + 0.5) AS BIGINT)) AS sq,
                   COUNT(*) AS n
            FROM a2, (SELECT range AS i FROM range(1, 65)) i
            GROUP BY cluster, i.i
        ),
        c2 AS (
            SELECT cluster,
                   list((CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) / {_KM_CQ}
                        ORDER BY i) AS c
            FROM m2 GROUP BY cluster
        ),
        s3 AS (
            SELECT p.vec_id, p.x, c.cluster,
                   list_reduce(list_transform(range(1, len(p.x) + 1),
                       i -> (p.x[i] - c.c[i]) * (p.x[i] - c.c[i])),
                       (acc, v) -> acc + v) AS d2
            FROM pts p, c2 c
        ),
        a3 AS (
            SELECT vec_id, cluster, d2 FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                FROM s3
            ) WHERE rn = 1
        )
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(CAST(FLOOR(d2 * {_KM_DQ} + 0.5) AS BIGINT))
                    AS BIGINT) AS inertia_q
        FROM a3 GROUP BY cluster
    """,
    "llm_similarity_topk": """
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT vec_id,
                   list_aggregate(
                       list_transform(range(1, len(embedding) + 1),
                           i -> CAST(embedding[i] AS DOUBLE)
                              * CAST(q_emb[i] AS DOUBLE)),
                       'sum')
                   / (sqrt(list_aggregate(list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                      * sqrt(list_aggregate(list_transform(q_emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
                       AS cosine
            FROM embeddings, q
        )
        SELECT vec_id, ROUND(cosine, 6) AS cosine_r
        FROM scored WHERE vec_id <> 0
        ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
    "llm_embed_quantize": """
        WITH m AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE)))) AS absmax
            FROM embeddings
        ),
        q AS (
            SELECT vec_id, absmax,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / absmax
                                       + 0.5) AS INTEGER)) AS qv
            FROM m WHERE absmax > 0
        )
        SELECT vec_id,
               CAST(len(qv) AS INTEGER) AS n_dims,
               ROUND(absmax / 127.0 + 5e-13, 6) AS scale_r,
               CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
               CAST(list_min(qv) AS INTEGER) AS q_min,
               CAST(list_max(qv) AS INTEGER) AS q_max
        FROM q
    """,
    # llm_ann_ivf: rows-only (float centroid means are reduction-order
    # dependent; recall vs the exact top-k is asserted in tests instead).
    "llm_knn_join": """
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 10
        ),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   list_aggregate(
                       list_transform(range(1, len(e.embedding) + 1),
                           i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(q.q_emb[i] AS DOUBLE)),
                       'sum')
                   / (sqrt(list_aggregate(list_transform(e.embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                      * sqrt(list_aggregate(list_transform(q.q_emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
                       AS cosine
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.q_id
        )
        SELECT q_id, vec_id, CAST(rk AS INTEGER) AS rk,
               ROUND(cosine, 6) AS cosine_r
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY cosine DESC, vec_id ASC) AS rk
            FROM scored
        ) WHERE rk <= 5
    """,
}

QUERY_FNS = {
    "llm_similarity_topk": llm_similarity_topk,
    "llm_knn_join": llm_knn_join,
    "llm_ann_ivf": llm_ann_ivf,
    "llm_ann_index_probe": llm_ann_index_probe,
    "llm_ann_lsh": llm_ann_lsh,
    "llm_embed_quantize": llm_embed_quantize,
    "llm_cluster_kmeans": llm_cluster_kmeans,
    "llm_ann_rescore": llm_ann_rescore,
    "llm_ann_batch": llm_ann_batch,
    "llm_serving_e2e": llm_serving_e2e,
    "llm_embed_pq": llm_embed_pq,
    "llm_eval_ranking": llm_eval_ranking,
}
