"""Corpus assembly for training-data pipelines (SURVEY.md §2.11): stratified
sampling, fixed-budget sequence packing, context-window chunking, and
token-budget source mixing.

Language/source rebalancing is a standard corpus-construction step: keep a
different fraction of each stratum (downsample the over-represented
language, keep all of the rare one). The engine implements it with a
DETERMINISTIC hash bucket instead of ``df.sampleBy`` RNG:

- reproducible: the same document is kept or dropped on every run, on any
  cluster size, independent of partitioning — which is what makes a 100 TB
  corpus build auditable and resumable;
- SQL-expressible: the keep predicate is plain integer arithmetic, so the
  operator has a full DuckDB oracle (sampleBy's Bernoulli RNG would be
  engine-specific and rows-only);
- a narrow filter: no shuffle, fully pushed into the scan stage.

The bucket is an LCG-style mix of the stable document id. The id is first
reduced mod a large prime so the multiply stays far inside int64 even for
petabyte-scale id spaces (ANSI mode would fault on overflow — by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_PRIME = 1_000_003          # id folding prime (keeps the multiply < 2^63)
_MULT = 1_103_515_245       # LCG multiplier (Numerical Recipes)
_INC = 12_345
_BUCKETS = 2_048

#: Per-language keep thresholds out of _BUCKETS (en is over-represented in
#: the fixture corpus → downsample hardest; zh kept almost whole).
_KEEP: dict[str, int] = {"en": 512, "de": 1024, "es": 1024, "fr": 1024, "zh": 1536}
_DEFAULT_KEEP = 2_048  # unknown stratum: keep everything


def sample_bucket(id_col: F.Column) -> F.Column:
    """Deterministic bucket in [0, _BUCKETS) from a stable integer id."""
    return ((id_col % _PRIME) * _MULT + _INC) % _BUCKETS


def chunk_windows_cte() -> str:
    """DuckDB CTE chain producing the ``llm_chunk_windows`` relation as a
    CTE named ``chunks`` — shared by the llm_chunk_windows oracle and any
    oracle built on top of the chunk relation (llm_chunk_rank's BM25)."""
    return f"""
        t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n
            FROM documents
        ),
        c AS (
            SELECT doc_id, toks,
                   CASE WHEN n <= {_CHUNK_W} THEN 1
                        ELSE 1 + (n - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S}
                   END AS n_chunks
            FROM t
        ),
        idx AS (
            SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_idx FROM c
        ),
        chunks AS (
            SELECT doc_id, chunk_idx,
                   CAST(chunk_idx * {_CHUNK_S} AS BIGINT) AS chunk_start_tok,
                   CAST(len(list_slice(toks, chunk_idx * {_CHUNK_S} + 1,
                                       chunk_idx * {_CHUNK_S} + {_CHUNK_W}))
                        AS BIGINT) AS n_chunk_tokens,
                   array_to_string(
                       list_slice(toks, chunk_idx * {_CHUNK_S} + 1,
                                  chunk_idx * {_CHUNK_S} + {_CHUNK_W}), ' ')
                       AS chunk_text
            FROM idx
        )
    """


def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling of the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(keep))
            for lang, keep in sorted(_KEEP.items())
        ],
        F.lit(_DEFAULT_KEEP),
    )
    return (
        docs.withColumn("bucket", sample_bucket(F.col("doc_id")))
        .filter(F.col("bucket") < threshold)
        .select("doc_id", "lang", "source", F.col("bucket").alias("sample_bucket"))
    )


_PACK_SHARDS = 64      # independent packing streams (parallelism unit)
_CTX_TOKENS = 512      # context-window budget per packed sequence


def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assemble documents into fixed-token-budget
    context windows for training, the step between dedup/filtering and
    tokenized shard writing.

    Scale design: a single global greedy pack would serialize on one
    cumulative sum over the whole corpus. Instead documents are dealt into
    ``_PACK_SHARDS`` independent streams by a deterministic id mod (NOT a
    hash of partitioning — reproducible on any cluster size), and packing
    is greedy *within* a shard: running token total over the unique doc_id
    order, sequence number = previous-total DIV budget. One hash shuffle
    on shard + a partition-local sort; 64 streams keep every core busy and
    the window state is a single counter. Oversized docs (> budget) get a
    window to themselves rather than an infinite split — the downstream
    tokenizer truncates, matching standard pipeline behavior."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.least(
        (F.size(F.split(F.col("text"), " "))).cast("bigint"),
        F.lit(_CTX_TOKENS),
    )
    shard = (F.col("doc_id") % _PACK_SHARDS).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select("doc_id", shard, n_tokens.alias("n_tokens"))
    cum = staged.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        ((F.col("cum_tokens") - F.col("n_tokens")) / _CTX_TOKENS)
        .cast("bigint")
        .alias("seq_no"),
        (F.col("cum_tokens") - F.col("n_tokens")).alias("seq_offset_tokens"),
    )


def llm_pack_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10b — packing quality report: per-shard efficiency and
    fragmentation statistics over the L10 packed sequences (VERDICT r10
    ask #3d — the op that makes the packing policy's cost VISIBLE before
    a training run burns GPU-hours on padding). Per (shard, seq_no) the
    fill is Σ n_tokens; a sequence may legitimately overflow the budget
    (the straddling document stays in the window where it started — L10's
    documented greedy rule), so the report splits slack (padding the
    trainer would waste) from overflow (tokens the tokenizer truncates).
    efficiency_micro = total_tokens·1e6 DIV (n_seqs·budget) — all-BIGINT,
    bit-identical on any engine/partitioning.

    Plan shape: composes on L10's single (shard) exchange — both the
    (shard, seq_no) roll-up and the per-shard agg are satisfied by the
    existing hash partitioning (shard ⊆ both keys), so the whole report
    adds ZERO exchanges to the packing plan."""
    packed = llm_pack_sequences(spark, sf_dir)
    per_seq = packed.groupBy("shard", "seq_no").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("used_tokens"),
    )
    return (
        per_seq.groupBy("shard")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("used_tokens").alias("total_tokens"),
            F.sum(
                F.expr(
                    f"CASE WHEN used_tokens < {_CTX_TOKENS}"
                    f" THEN {_CTX_TOKENS} - used_tokens ELSE 0 END"
                )
            ).alias("slack_tokens"),
            F.sum(
                F.expr(
                    f"CASE WHEN used_tokens > {_CTX_TOKENS}"
                    f" THEN used_tokens - {_CTX_TOKENS} ELSE 0 END"
                )
            ).alias("overflow_tokens"),
            F.max("used_tokens").alias("max_fill"),
            F.min("used_tokens").alias("min_fill"),
        )
        .select(
            "shard",
            "n_seqs",
            "n_docs",
            "total_tokens",
            "slack_tokens",
            "overflow_tokens",
            "max_fill",
            "min_fill",
            F.expr(
                f"(total_tokens * 1000000)"
                f" DIV (n_seqs * {_CTX_TOKENS})"
            ).alias("efficiency_micro"),
        )
    )


#: Chunking parameters: window W tokens with stride S (overlap W-S). Sized
#: to the fixture's ~55-token docs so every doc yields 2-3 chunks; a
#: production pipeline uses the model context (e.g. W=2048, S=1792) — the
#: plan shape is identical at any W.
_CHUNK_W = 32
_CHUNK_S = 24


def llm_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    fixed-token windows — the step that turns variable-length documents
    into model-sized training samples (overlap preserves cross-boundary
    context).

    Fully narrow: tokenize once into a bound array column, compute the
    chunk count with INTEGER arithmetic (engine-identical, hence the full
    SQL oracle), explode the chunk indices, and slice the token array per
    chunk — no shuffle anywhere, so the operator is embarrassingly
    parallel at any corpus size. Chunk count = 1 for docs within one
    window, else 1 + ceil((n−W)/S) via (n−W+S−1) DIV S."""
    docs = load_table(spark, sf_dir, "documents")
    with_toks = docs.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_toks"),
    )
    # integer DIV, not `/`: float division loses exactness past 2^53 and
    # this arithmetic must be bit-identical to the SQL oracle at any scale
    n_chunks = F.when(
        F.col("n_toks") <= _CHUNK_W, F.lit(1).cast("bigint")
    ).otherwise(
        F.expr(
            f"1 + (n_toks - {_CHUNK_W} + {_CHUNK_S} - 1) DIV {_CHUNK_S}"
        )
    )
    chunks = with_toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    start = (F.col("chunk_idx") * _CHUNK_S).cast("int")
    piece = F.slice(F.col("toks"), start + 1, _CHUNK_W)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        start.cast("bigint").alias("chunk_start_tok"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


#: Preference-pair assembly: at most _DPO_TOPK pairs per prompt bucket,
#: and a pair is kept only when chosen beats rejected by ≥ _DPO_MARGIN
#: integer score points (a zero/near-zero-margin pair carries no
#: preference signal and would teach the reward model noise).
_DPO_TOPK = 5
_DPO_MARGIN = 20


def llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L31 — preference-pair (DPO/RLHF reward-modeling) assembly: per
    prompt bucket, pair the best-scored responses with the worst-scored
    ones — (chosen, rejected) with chosen ≻ rejected — the post-training
    twin of ``llm_split_leakage_safe`` (that one keeps eval honest, this
    one builds the preference dataset). Documents stand in for sampled
    responses, ``source`` for the prompt bucket, and the L20 integer
    quality score (the SAME expression the filter gate uses —
    ``quality_score_col``) for the reward signal.

    Pairing is rank-symmetric: rank i from the top is paired with rank i
    from the bottom (i ≤ min(_DPO_TOPK, ⌊n/2⌋), so top and bottom sets
    can never overlap), ties broken on doc_id — a total order, so pair
    membership is bit-stable across engines and partition counts. Pairs
    whose score gap is below ``_DPO_MARGIN`` are dropped.

    Plan shape (single DAG, nothing recomputed): ONE corpus exchange on
    the bucket key for the ranking window (row_number + count share it).
    A chosen/rejected SELF-JOIN would have scanned, shuffled, and
    windowed the corpus twice; instead each surviving row is tagged with
    its role (top-k rows are chosen, bottom-k rejected — disjoint
    because k ≤ ⌊n/2⌋) and the pair assembles in one output-sized
    groupBy on (bucket, pair_rank): the only other exchange carries
    ≤ 2k rows per bucket, bounded by the OUTPUT at any corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    from .text import quality_score_col

    scored = docs.select(
        "doc_id", "source", quality_score_col().alias("score")
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    k = F.least(F.lit(_DPO_TOPK).cast("bigint"), F.expr("n DIV 2"))
    is_chosen = F.col("rn") <= k
    bottom_rank = F.col("n") - F.col("rn") + 1
    roles = ranked.filter(is_chosen | (bottom_rank <= k)).select(
        "source",
        F.when(is_chosen, F.col("rn")).otherwise(bottom_rank).alias(
            "pair_rank"
        ),
        F.when(is_chosen, F.col("doc_id")).alias("c_doc"),
        F.when(is_chosen, F.col("score")).alias("c_score"),
        F.when(~is_chosen, F.col("doc_id")).alias("r_doc"),
        F.when(~is_chosen, F.col("score")).alias("r_score"),
    )
    pairs = roles.groupBy("source", "pair_rank").agg(
        F.max("c_doc").alias("chosen_doc_id"),
        F.max("c_score").alias("chosen_score"),
        F.max("r_doc").alias("rejected_doc_id"),
        F.max("r_score").alias("rejected_score"),
    )
    return pairs.filter(
        F.col("chosen_score") - F.col("rejected_score") >= _DPO_MARGIN
    ).select(
        "source",
        "pair_rank",
        "chosen_doc_id",
        "chosen_score",
        "rejected_doc_id",
        "rejected_score",
        (F.col("chosen_score") - F.col("rejected_score")).alias("score_gap"),
    )


def llm_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget source mixing: downsample every source to the SMALLEST
    source's token budget — the corpus-mixture step that stops one crawl
    from dominating the training distribution.

    Two-phase: (1) per-source token totals — a partial-aggregated groupBy
    whose exchange carries |sources| rows; (2) a narrow keep-filter via
    the same deterministic LCG bucket as stratified sampling, with
    per-source thresholds (min_tokens · BUCKETS) DIV source_tokens — all
    integer arithmetic, so the kept set is reproducible on any cluster
    size AND SQL-verifiable. The threshold relation is |sources|-sized and
    joins back without a hint (AQE broadcasts it when small). At 100 TB
    phase 1 reads precomputed per-source stats instead of re-scanning;
    the keep-filter pass is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    with_n = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    totals = with_n.groupBy("source").agg(
        F.sum("n_tokens").alias("src_tokens")
    )
    min_row = totals.agg(F.min("src_tokens").alias("min_tokens"))
    thresholds = totals.crossJoin(min_row).select(
        "source",
        "src_tokens",
        # integer DIV (see llm_chunk_windows): exact at any token scale
        F.expr(f"(min_tokens * {_BUCKETS}) DIV src_tokens").alias(
            "keep_threshold"
        ),
    )
    return (
        with_n.join(thresholds, "source")
        .withColumn("mix_bucket", sample_bucket(F.col("doc_id")))
        .filter(F.col("mix_bucket") < F.col("keep_threshold"))
        .select("doc_id", "source", "n_tokens", "mix_bucket")
    )


#: DoReMi reweight: η·excess scale. η = 0.1 per bit of excess loss,
#: which over micro-bit integers makes the update's common denominator
#: 10^7·N² — see the A_d derivation in the docstring.
_DOREMI_ETA_DENOM = 10_000_000


def llm_domain_mix_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L42 — DoReMi-style domain-mixture reweighting (Xie et al. 2023
    shape): upweight domains whose proxy-model loss exceeds the corpus
    baseline, starting from token-share base weights — the production
    step between per-source stats (L15's input) and the sampling rate
    each source gets in the next training mix. The proxy loss is the
    corpus-unigram NLL (the L4i signal) aggregated per source; the
    published method's exp(η·excess) update is replaced by its
    first-order multiplicative-weights form w_d ∝ share_d·(1+η·excess_d)
    — same fixed point direction, and (unlike exp) expressible in EXACT
    integer arithmetic, so the weights are bit-identical across engines
    and partitionings rather than exp-libm-dependent.

    Exactness: per-token-TYPE surprise bits = log2(N) − log2(c_w). Both
    logs take exact integers, but the ENGINES' log2 differ at the ulp
    (Spark computes log(x)/log(2); DuckDB calls libm log2), so the
    product 10⁶·bits can land on opposite sides of an integer when it
    falls within ~1e-8 of one (ADVICE r13). The repo's stabilizer idiom
    applies: fb_w = FLOOR(10⁶·bits_w + 1e-7) — the bias sits far above
    the cross-libm gap (~1e-8) and far below the 1e-6 quantum (1e-7 of
    a micro-bit), so both engines floor identically everywhere (floor
    itself has no tie semantics, unlike round-half); per-domain sums
    n_d (tokens) and q_d = Σ c_{d,w}·fb_w
    (micro-bits) accumulate as DECIMAL(38,0). With N = Σn_d,
    Q = Σq_d, η = 0.1/bit, the unnormalized weight has the common
    denominator 10⁷·N²:
        A_d = 10⁷·n_d·N + max(q_d·N − Q·n_d, 0)
    — an exact integer, so the normalization w_d = A_d / ΣA_d is one
    division of two exact decimals: NO float sum anywhere. Magnitude
    bound: A_d < 10⁷·N² + q_max·N needs N ≲ 10¹⁵ tokens under
    DECIMAL(38,0) — beyond any published corpus; past it, drop the 10⁶
    quantization to 10³.

    Sources whose every document has NULL text produce no token rows
    and are absent (no loss signal → no weight); a NULL source is a
    regular group on both engines. Docs contribute via their (source,
    token) counts — the token stream is shuffled ONCE on (source, tok);
    the vocabulary join (|vocab·domains| × |vocab|) and the 1-row
    corpus-token total ride tiny relations, and the corpus-loss
    baseline + ΣA normalizer fold as unbounded windows over the
    |sources|-row domains relation (small by definition — a scalar-fold
    cascade of agg + crossJoin would replan the token stream once per
    fold). In production the per-(source, token) counts are the
    reusable artifact; reweighting re-runs without touching the
    corpus."""
    documents = load_table(spark, sf_dir, "documents")
    toks = documents.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    tokd = toks.groupBy("source", "tok").agg(F.count("*").alias("c_dw"))
    dec = "decimal(38,0)"
    freq = tokd.groupBy("tok").agg(
        F.sum(F.col("c_dw").cast(dec)).cast("long").alias("c_w")
    )
    totals = freq.agg(
        F.sum(F.col("c_w").cast(dec)).cast("long").alias("n_total")
    )
    # per-token-type quantized surprise (integer-log rule: both args exact)
    fb = F.floor(
        (
            F.log2(F.col("n_total").cast("double"))
            - F.log2(F.col("c_w").cast("double"))
        )
        * F.lit(1000000.0)
        # cross-libm log2 stabilizer (ADVICE r13): ≫ ulp gap, ≪ quantum
        + F.lit(1e-7)
    ).cast("long")
    scored = tokd.join(freq, "tok").crossJoin(totals).withColumn("fb", fb)
    domains = scored.groupBy("source").agg(
        F.sum(F.col("c_dw").cast(dec)).alias("n_d"),
        F.sum(F.col("c_dw").cast(dec) * F.col("fb")).alias("q_d"),
    )
    # corpus totals and the ΣA normalizer fold as UNBOUNDED windows over
    # the domains relation — |sources| rows by definition, so the single
    # partition is harmless at any corpus scale, and unlike a cascade of
    # agg + crossJoin scalar folds the token stream is scanned for ONE
    # domains build instead of once per fold (4× replanned = 12 corpus
    # scans before this rewrite). All window sums are DECIMAL — exact in
    # any accumulation order.
    tot_w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    enriched = (
        domains.withColumn("n_corpus", F.sum("n_d").over(tot_w))
        .withColumn("q_corpus", F.sum("q_d").over(tot_w))
        .withColumn(
            "a_d",
            F.lit(_DOREMI_ETA_DENOM).cast(dec)
            * F.col("n_d")
            * F.col("n_corpus")
            + F.greatest(
                F.col("q_d") * F.col("n_corpus")
                - F.col("q_corpus") * F.col("n_d"),
                F.lit(0).cast(dec),
            ),
        )
        .withColumn("a_sum", F.sum("a_d").over(tot_w))
    )
    n_dd = F.col("n_d").cast("double")
    nc_d = F.col("n_corpus").cast("double")
    return (
        enriched
        .select(
            "source",
            F.col("n_d").cast("long").alias("n_tokens"),
            F.round(
                F.col("q_d").cast("double") / n_dd / F.lit(1000000.0), 6
            ).alias("nll_bits_per_token"),
            F.round(
                F.greatest(
                    F.col("q_d").cast("double") / n_dd
                    - F.col("q_corpus").cast("double") / nc_d,
                    F.lit(0.0),
                )
                / F.lit(1000000.0),
                6,
            ).alias("excess_bits"),
            F.round(n_dd / nc_d, 6).alias("weight_base"),
            F.round(
                F.col("a_d").cast("double") / F.col("a_sum").cast("double"), 6
            ).alias("weight"),
        )
    )


def llm_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (alpha = 0.5): sample each source
    proportionally to src_tokens^alpha instead of flattening every source
    to the minimum — the standard multilingual/multi-source rebalance
    (sampling temperature in the XLM-R / mT5 sense: alpha=1 keeps the
    natural distribution, alpha=0 is uniform; 0.5 sits between).

    Keep-rate per source is sqrt(min_tokens / src_tokens), so the smallest
    source is kept whole and a source 100x larger keeps 10x the minimum's
    tokens (not 1x like llm_mix_sources' hard flatten). alpha is fixed at
    0.5 because IEEE-754 defines sqrt as EXACTLY rounded — both engines
    produce bit-identical doubles, so the floor'd per-source thresholds
    (and therefore the kept document set) are deterministic cross-engine;
    an arbitrary pow(x, alpha) carries no such guarantee. Same two-phase
    shape as llm_mix_sources: a |sources|-row totals exchange, then a
    narrow LCG-bucket keep-filter — reproducible on any cluster size."""
    docs = load_table(spark, sf_dir, "documents")
    with_n = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    totals = with_n.groupBy("source").agg(
        F.sum("n_tokens").alias("src_tokens")
    )
    min_row = totals.agg(F.min("src_tokens").alias("min_tokens"))
    thresholds = totals.crossJoin(min_row).select(
        "source",
        "src_tokens",
        F.expr(
            f"CAST(FLOOR({_BUCKETS} * SQRT(min_tokens) / SQRT(src_tokens))"
            " AS BIGINT)"
        ).alias("keep_threshold"),
    )
    return (
        with_n.join(thresholds, "source")
        .withColumn("mix_bucket", sample_bucket(F.col("doc_id")))
        .filter(F.col("mix_bucket") < F.col("keep_threshold"))
        .select("doc_id", "source", "n_tokens", "mix_bucket")
    )


def llm_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L29 — quality-weighted importance resampling: keep each document
    with probability proportional to a per-document quality weight,
    instead of the per-stratum flat rates of L8 — the DCLM/FineWeb-style
    step where a learned or heuristic quality score decides how much of
    each individual document's neighborhood survives into the training
    mix.

    The weight here is the type-token ratio (distinct tokens / tokens —
    repetitive documents get downsampled hardest), mapped to an integer
    keep threshold with one DIV: threshold = (n_distinct · BUCKETS) DIV
    n_tokens, keep iff the document's deterministic LCG bucket falls
    under it. Everything is integer arithmetic on a single narrow
    projection — no RNG (reproducible and auditable on any cluster
    size/partitioning, resumable mid-corpus), no shuffle (the keep
    predicate runs inside the scan stage), and a full SQL oracle. At
    100 TB the weight column typically arrives precomputed from a
    classifier; only the threshold map and bucket filter are this
    operator, and they stay embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    ).withColumn(
        "keep_threshold",
        F.expr(f"(n_distinct * {_BUCKETS}) DIV n_tokens"),
    ).withColumn("bucket", sample_bucket(F.col("doc_id")))
    return scored.filter(F.col("bucket") < F.col("keep_threshold")).select(
        "doc_id", "n_tokens", "n_distinct", "keep_threshold", "bucket"
    )


_N_SHARDS = 16


def llm_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-shard assignment: deal documents onto _N_SHARDS
    output shards so every shard carries a near-equal token load — the
    step that decides file boundaries when the corpus is written out for
    the trainer (unbalanced shards = stragglers in every later epoch).

    Longest-processing-time heuristic made distribution-friendly: within
    each source, rank documents by (n_tokens DESC, doc_id) and deal
    SERPENTINE by rank (passes alternate direction: 0..K-1 then K-1..0),
    so no shard systematically receives every source's largest document —
    plain round-robin leaves shard 0 ~2-3x heavier. The window partitions
    by source, so no global sort exists at any corpus size; determinism
    comes from the unique (n_tokens, doc_id) order, not from
    partitioning. Output is the
    per-shard load summary (the balance evidence); the doc->shard map is
    the same relation before the final groupBy, used as the write
    partition key in production."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_tokens"), "doc_id")
    assigned = staged.withColumn("rn0", F.row_number().over(w) - 1).withColumn(
        "shard",
        F.expr(
            f"CAST(IF((rn0 DIV {_N_SHARDS}) % 2 = 0, rn0 % {_N_SHARDS},"
            f" {_N_SHARDS - 1} - rn0 % {_N_SHARDS}) AS BIGINT)"
        ),
    )
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


_SHUF_SHARDS = 64
_SHUF_SEED = "epoch0"
_SHUF_MOD = 1_000_000_007


def llm_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L25 — deterministic epoch shuffle: give the corpus a seed-keyed
    pseudo-random training order, the step every epoch of pretraining
    needs between shard assignment and the data loader. A true global
    sort at 100 TB is one giant range exchange; instead each doc gets a
    deterministic shuffle key (md5 of seed:doc_id — the SQL-reproducible
    base hash, new seed per epoch), lands on key-mod shard, and is
    ordered (key, doc_id) WITHIN its shard — one hash exchange plus a
    partition-local external sort, the same shape the shard writer needs
    anyway. Shard count is fixed, so the layout is reproducible on any
    cluster size.

    Output proves the ORDER, not just membership: per shard, the
    position-weighted checksum Σ (doc_id·pos mod p) mod-free-summed —
    any transposition of two docs changes it — plus the pos-1 doc and
    the max key. All integers (products < 2^60 even at 10^10 docs per
    shard), so the key carries a full SQL oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    k = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.lit(_SHUF_SEED), F.col("doc_id"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    )
    staged = docs.select(
        "doc_id", k.alias("k"), (k % _SHUF_SHARDS).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    per = staged.withColumn(
        "pos", F.row_number().over(w).cast("bigint")
    )
    term = (
        (F.col("doc_id") % _SHUF_MOD) * (F.col("pos") % _SHUF_MOD)
    ) % _SHUF_MOD
    return per.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(term).alias("order_checksum"),
        F.min(F.when(F.col("pos") == 1, F.col("doc_id"))).alias(
            "first_doc"
        ),
        F.max("k").alias("max_key"),
    )


#: Curriculum phase boundaries (token counts) and the phase-shuffle seed.
_CURR_SHORT = 16
_CURR_MID = 64
_CURR_SEED = "curriculum0"


def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L28 — curriculum data ordering: assign each document a training
    PHASE by length tier (short/medium/long token counts — the
    easy-to-hard axis curriculum schedules actually use) and a
    deterministic rank within its phase via the md5 shuffle-key idiom of
    L25, so the loader reads phase 0 ranks 1..n, then phase 1, … and any
    two runs (any cluster size, any partitioning) produce the identical
    order. Seed-keyed: a new curriculum seed reshuffles within phases
    without touching the phase assignment.

    Scale shape: token count and phase are narrow codegen arithmetic;
    the only exchange is the phase-partitioned window (3 partitions ×
    local sort — same shape as L25's shard window, and at 100 TB the
    rank-within-phase would ride the shard writer's existing sort)."""
    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.col("text"), " "))
    k = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(_CURR_SEED), F.col("doc_id"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    staged = docs.select(
        "doc_id",
        F.when(n_toks < _CURR_SHORT, 0)
        .when(n_toks < _CURR_MID, 1)
        .otherwise(2)
        .cast("int")
        .alias("phase"),
        n_toks.cast("bigint").alias("n_tokens"),
        k.alias("k"),
    )
    w = Window.partitionBy("phase").orderBy("k", "doc_id")
    return staged.select(
        "doc_id",
        "phase",
        "n_tokens",
        F.row_number().over(w).cast("bigint").alias("rank_in_phase"),
    )


#: The L10 packing relation as a DuckDB CTE chain ending in
#: ``packed(doc_id, shard, n_tokens, seq_no, seq_offset_tokens)`` —
#: shared verbatim by the llm_pack_sequences oracle and the L10b
#: quality-report oracle (the report must grade the SAME packing, not a
#: re-derivation).
_PACK_ORACLE_CTES = f"""
        staged AS (
            SELECT doc_id,
                   doc_id % {_PACK_SHARDS} AS shard,
                   LEAST(CAST(LENGTH(string_split(text, ' ')) AS BIGINT),
                         {_CTX_TOKENS}) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, shard, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM staged
        ),
        packed AS (
            SELECT doc_id, shard, n_tokens,
                   (cum_tokens - n_tokens) // {_CTX_TOKENS} AS seq_no,
                   cum_tokens - n_tokens AS seq_offset_tokens
            FROM cum
        )
"""

def llm_classifier_trainset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L40 — quality-classifier training-set assembly: the CCNet/DCLM
    prep step L20 presumes (Wenzek et al. 2020 §4: positives from a
    curated corpus, negatives a random crawl sample; DCLM's fastText
    filter trains on exactly this shape). Positives = every document
    from the CURATED source — chosen corpus-agnostically as the
    lexicographically first non-NULL ``source`` (the fixture's stand-in
    for "the Wikipedia slice"); negatives = a deterministic L8
    hash-bucket sample of the remaining sources, rate-balanced to the
    positive class size (threshold = ceil(_BUCKETS·n_pos/n_neg_pool),
    capped at _BUCKETS). Each kept row carries the label AND the L20
    feature vector (f_tokens/f_stop/f_distinct + composite score) — the
    exact relation a trainer consumes. NULL-source documents belong to
    neither pool (min() skips NULLs and both CASE arms require a
    non-NULL source — identical in DuckDB).

    Scale shape: class statistics come from ONE map-side-combinable
    groupBy(source) agg whose output is source-count-sized (thousands of
    rows at 100 TB, never corpus-sized), folded to a 1-row threshold
    relation; labeling is then a single narrow pass over the corpus with
    that row broadcast — the only corpus-sized shuffle in the whole op
    is the partial-agg exchange of the source counts. The hash-bucket
    keep decision is partition-invariant (L8's reproducibility
    argument), so the assembled training set is bit-stable across
    cluster sizes and resumes."""
    from .text import quality_feature_cols, quality_score_col

    docs = load_table(spark, sf_dir, "documents")
    srcstats = (
        docs.where(F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    stats = (
        srcstats.agg(
            F.min("source").alias("curated_src"),
            F.expr("min_by(n, source)").alias("n_pos"),
            F.sum("n").alias("n_total"),
        )
        .select(
            "curated_src",
            "n_pos",
            (F.col("n_total") - F.col("n_pos")).alias("n_neg"),
        )
        .select(
            "curated_src",
            F.expr(
                f"CASE WHEN n_neg = 0 THEN 0"
                f" ELSE least({_BUCKETS},"
                f" ({_BUCKETS} * n_pos + n_neg - 1) DIV n_neg) END"
            ).alias("neg_thr"),
        )
    )
    feats = quality_feature_cols()
    labeled = (
        docs.crossJoin(F.broadcast(stats))
        .withColumn("bucket", sample_bucket(F.col("doc_id")))
        .withColumn(
            "label",
            F.expr(
                "CASE WHEN source = curated_src THEN 1"
                " WHEN source IS NOT NULL AND bucket < neg_thr THEN 0"
                " END"
            ).cast("bigint"),
        )
        .where(F.col("label").isNotNull())
    )
    return labeled.select(
        "doc_id",
        "label",
        feats["f_tokens"].alias("f_tokens"),
        feats["f_stop"].alias("f_stop"),
        feats["f_distinct"].alias("f_distinct"),
        quality_score_col().alias("quality_score"),
    )


def _classifier_trainset_oracle_sql() -> str:
    from .text import quality_feature_sql, quality_score_sql

    f = quality_feature_sql()
    return f"""
        WITH srcstats AS (
            SELECT source, COUNT(*) AS n FROM documents
            WHERE source IS NOT NULL GROUP BY source
        ),
        stats AS (
            SELECT MIN(source) AS curated_src,
                   MIN_BY(n, source) AS n_pos,
                   SUM(n) - MIN_BY(n, source) AS n_neg
            FROM srcstats
        ),
        thr AS (
            SELECT curated_src,
                   CASE WHEN n_neg = 0 THEN 0
                        ELSE LEAST({_BUCKETS},
                            ({_BUCKETS} * n_pos + n_neg - 1) // n_neg) END
                       AS neg_thr
            FROM stats
        ),
        labeled AS (
            SELECT d.doc_id, d.text, d.n_chars,
                   CASE WHEN d.source = t.curated_src THEN 1
                        WHEN d.source IS NOT NULL
                             AND ((d.doc_id % {_PRIME}) * {_MULT}
                                  + {_INC}) % {_BUCKETS} < t.neg_thr
                            THEN 0
                   END AS label
            FROM documents d CROSS JOIN thr t
        )
        SELECT doc_id, CAST(label AS BIGINT) AS label,
               {f['f_tokens']} AS f_tokens,
               {f['f_stop']} AS f_stop,
               {f['f_distinct']} AS f_distinct,
               {quality_score_sql()} AS quality_score
        FROM labeled WHERE label IS NOT NULL
    """


ORACLES: dict[str, str] = {
    "llm_curriculum_order": f"""
        WITH d AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   CAST(('0x' || substr(md5('{_CURR_SEED}:' || doc_id), 1, 8))
                        AS BIGINT) AS k
            FROM documents
        ),
        p AS (
            SELECT doc_id,
                   CAST(CASE WHEN n_tokens < {_CURR_SHORT} THEN 0
                             WHEN n_tokens < {_CURR_MID} THEN 1
                             ELSE 2 END AS INTEGER) AS phase,
                   CAST(n_tokens AS BIGINT) AS n_tokens, k
            FROM d
        )
        SELECT doc_id, phase, n_tokens,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY phase ORDER BY k, doc_id
               ) AS BIGINT) AS rank_in_phase
        FROM p
    """,
    "llm_corpus_shuffle": f"""
        WITH keyed AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5('{_SHUF_SEED}:' || doc_id), 1, 8))
                        AS BIGINT) AS k
            FROM documents
        ),
        sharded AS (
            SELECT doc_id, k, k % {_SHUF_SHARDS} AS shard FROM keyed
        ),
        positioned AS (
            SELECT doc_id, k, shard,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY shard ORDER BY k, doc_id
                   ) AS BIGINT) AS pos
            FROM sharded
        )
        SELECT shard, COUNT(*) AS n_docs,
               CAST(SUM((doc_id % {_SHUF_MOD}) * (pos % {_SHUF_MOD})
                    % {_SHUF_MOD}) AS BIGINT) AS order_checksum,
               MIN(CASE WHEN pos = 1 THEN doc_id END) AS first_doc,
               MAX(k) AS max_key
        FROM positioned GROUP BY shard
    """,
    "llm_shard_assign": f"""
        WITH staged AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        ranked AS (
            SELECT n_tokens,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_tokens DESC, doc_id
                   ) - 1 AS rn0
            FROM staged
        ),
        assigned AS (
            SELECT CAST(CASE WHEN (rn0 // {_N_SHARDS}) % 2 = 0
                             THEN rn0 % {_N_SHARDS}
                             ELSE {_N_SHARDS - 1} - rn0 % {_N_SHARDS}
                        END AS BIGINT) AS shard,
                   n_tokens
            FROM ranked
        )
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM assigned GROUP BY shard
    """,
    "llm_sample_temperature": f"""
        WITH n AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        tot AS (
            SELECT source, SUM(n_tokens) AS src_tokens FROM n GROUP BY source
        ),
        m AS (SELECT MIN(src_tokens) AS min_tokens FROM tot),
        thr AS (
            SELECT source,
                   CAST(FLOOR({_BUCKETS} * SQRT(min_tokens)
                              / SQRT(src_tokens)) AS BIGINT)
                       AS keep_threshold
            FROM tot, m
        )
        SELECT n.doc_id, n.source, n.n_tokens,
               ((n.doc_id % {_PRIME}) * {_MULT} + {_INC}) % {_BUCKETS}
                   AS mix_bucket
        FROM n JOIN thr USING (source)
        WHERE ((n.doc_id % {_PRIME}) * {_MULT} + {_INC}) % {_BUCKETS}
              < keep_threshold
    """,
    "llm_pack_sequences": f"""
        WITH {_PACK_ORACLE_CTES}
        SELECT doc_id, shard, n_tokens, seq_no, seq_offset_tokens
        FROM packed
    """,
    "llm_pack_quality": f"""
        WITH {_PACK_ORACLE_CTES},
        per_seq AS (
            SELECT shard, seq_no,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS used_tokens
            FROM packed GROUP BY shard, seq_no
        )
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_seqs,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(used_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN used_tokens < {_CTX_TOKENS}
                             THEN {_CTX_TOKENS} - used_tokens
                             ELSE 0 END) AS BIGINT) AS slack_tokens,
               CAST(SUM(CASE WHEN used_tokens > {_CTX_TOKENS}
                             THEN used_tokens - {_CTX_TOKENS}
                             ELSE 0 END) AS BIGINT) AS overflow_tokens,
               CAST(MAX(used_tokens) AS BIGINT) AS max_fill,
               CAST(MIN(used_tokens) AS BIGINT) AS min_fill,
               CAST((SUM(used_tokens) * 1000000)
                    // (COUNT(*) * {_CTX_TOKENS}) AS BIGINT)
                   AS efficiency_micro
        FROM per_seq GROUP BY shard
    """,
    "llm_importance_resample": f"""
        WITH scored AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' ')))
                        AS BIGINT) AS n_distinct,
                   ((doc_id % {_PRIME}) * {_MULT} + {_INC}) % {_BUCKETS}
                       AS bucket
            FROM documents
        )
        SELECT doc_id, n_tokens, n_distinct,
               (n_distinct * {_BUCKETS}) // n_tokens AS keep_threshold,
               bucket
        FROM scored
        WHERE bucket < (n_distinct * {_BUCKETS}) // n_tokens
    """,
    "llm_sample_stratified": f"""
        WITH b AS (
            SELECT doc_id, lang, source,
                   ((doc_id % {_PRIME}) * {_MULT} + {_INC}) % {_BUCKETS} AS sample_bucket
            FROM documents
        )
        SELECT doc_id, lang, source, sample_bucket
        FROM b
        WHERE sample_bucket < CASE lang
            WHEN 'en' THEN 512
            WHEN 'de' THEN 1024
            WHEN 'es' THEN 1024
            WHEN 'fr' THEN 1024
            WHEN 'zh' THEN 1536
            ELSE {_DEFAULT_KEEP} END
    """,
    "llm_chunk_windows": f"""
        WITH {chunk_windows_cte()}
        SELECT * FROM chunks
    """,
    "llm_preference_pairs": None,  # assigned below (needs text helper)
    "llm_domain_mix_reweight": f"""
        WITH toks AS (
            SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        tokd AS (
            SELECT source, tok, COUNT(*) AS c_dw
            FROM toks GROUP BY source, tok
        ),
        freq AS (
            SELECT tok, CAST(SUM(CAST(c_dw AS HUGEINT)) AS BIGINT) AS c_w
            FROM tokd GROUP BY tok
        ),
        tot AS (
            SELECT CAST(SUM(CAST(c_w AS HUGEINT)) AS BIGINT) AS n_total
            FROM freq
        ),
        scored AS (
            SELECT source, c_dw,
                   CAST(FLOOR((log2(CAST(n_total AS DOUBLE))
                               - log2(CAST(c_w AS DOUBLE)))
                              * 1000000.0 + 1e-7) AS BIGINT) AS fb
            FROM tokd JOIN freq USING (tok) CROSS JOIN tot
        ),
        domains AS (
            SELECT source, SUM(CAST(c_dw AS HUGEINT)) AS n_d,
                   SUM(CAST(c_dw AS HUGEINT) * fb) AS q_d
            FROM scored GROUP BY source
        ),
        corpus AS (
            SELECT SUM(n_d) AS n_corpus, SUM(q_d) AS q_corpus FROM domains
        ),
        enr AS (
            SELECT *,
                   CAST({_DOREMI_ETA_DENOM} AS HUGEINT) * n_d * n_corpus
                   + greatest(q_d * n_corpus - q_corpus * n_d,
                              CAST(0 AS HUGEINT)) AS a_d
            FROM domains CROSS JOIN corpus
        ),
        s AS (SELECT SUM(a_d) AS a_sum FROM enr)
        SELECT source, CAST(n_d AS BIGINT) AS n_tokens,
               ROUND(CAST(q_d AS DOUBLE) / CAST(n_d AS DOUBLE)
                     / 1000000.0, 6) AS nll_bits_per_token,
               ROUND(greatest(CAST(q_d AS DOUBLE) / CAST(n_d AS DOUBLE)
                              - CAST(q_corpus AS DOUBLE)
                                / CAST(n_corpus AS DOUBLE), 0.0)
                     / 1000000.0, 6) AS excess_bits,
               ROUND(CAST(n_d AS DOUBLE) / CAST(n_corpus AS DOUBLE), 6)
                   AS weight_base,
               ROUND(CAST(a_d AS DOUBLE) / CAST(a_sum AS DOUBLE), 6)
                   AS weight
        FROM enr CROSS JOIN s
    """,
    "llm_mix_sources": f"""
        WITH n AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        tot AS (
            SELECT source, SUM(n_tokens) AS src_tokens FROM n GROUP BY source
        ),
        m AS (SELECT MIN(src_tokens) AS min_tokens FROM tot),
        thr AS (
            SELECT source,
                   CAST((min_tokens * {_BUCKETS}) // src_tokens AS BIGINT)
                       AS keep_threshold
            FROM tot, m
        )
        SELECT n.doc_id, n.source, n.n_tokens,
               ((n.doc_id % {_PRIME}) * {_MULT} + {_INC}) % {_BUCKETS}
                   AS mix_bucket
        FROM n JOIN thr USING (source)
        WHERE ((n.doc_id % {_PRIME}) * {_MULT} + {_INC}) % {_BUCKETS}
              < keep_threshold
    """,
}

def _preference_pairs_oracle_sql() -> str:
    from .text import quality_score_sql

    return f"""
        WITH scored AS (
            SELECT doc_id, source, {quality_score_sql()} AS score
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, source, score,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY score DESC, doc_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM scored
        ),
        chosen AS (
            SELECT source, rn AS pair_rank,
                   doc_id AS chosen_doc_id, score AS chosen_score
            FROM ranked WHERE rn <= LEAST({_DPO_TOPK}, n // 2)
        ),
        rejected AS (
            SELECT source, n - rn + 1 AS pair_rank,
                   doc_id AS rejected_doc_id, score AS rejected_score
            FROM ranked WHERE n - rn + 1 <= LEAST({_DPO_TOPK}, n // 2)
        )
        SELECT source, CAST(pair_rank AS BIGINT) AS pair_rank,
               chosen_doc_id, chosen_score,
               rejected_doc_id, rejected_score,
               CAST(chosen_score - rejected_score AS BIGINT) AS score_gap
        FROM chosen JOIN rejected USING (source, pair_rank)
        WHERE chosen_score - rejected_score >= {_DPO_MARGIN}
    """


ORACLES["llm_preference_pairs"] = _preference_pairs_oracle_sql()
ORACLES["llm_classifier_trainset"] = _classifier_trainset_oracle_sql()

QUERY_FNS = {
    "llm_sample_stratified": llm_sample_stratified,
    "llm_preference_pairs": llm_preference_pairs,
    "llm_importance_resample": llm_importance_resample,
    "llm_pack_sequences": llm_pack_sequences,
    "llm_pack_quality": llm_pack_quality,
    "llm_chunk_windows": llm_chunk_windows,
    "llm_mix_sources": llm_mix_sources,
    "llm_domain_mix_reweight": llm_domain_mix_reweight,
    "llm_sample_temperature": llm_sample_temperature,
    "llm_shard_assign": llm_shard_assign,
    "llm_corpus_shuffle": llm_corpus_shuffle,
    "llm_curriculum_order": llm_curriculum_order,
    "llm_classifier_trainset": llm_classifier_trainset,
}
