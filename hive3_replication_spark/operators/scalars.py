"""Scalar functions (SURVEY.md §2.8, F1-F13).

Every function here is a built-in ``pyspark.sql.functions`` expression — they
stay inside whole-stage codegen with zero Python in the hot path, which is the
engine's rule for scalar work at 100 TB (UDFs are a last resort, §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_embeddings, load_table


def fn_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — path prefixing: ``${SOURCE_HDFS_PREFIX}${DUMP_PATH}``
    (``beeline_functions.sh:196``)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.concat(F.lit("hdfs://nn1"), F.lit("/repl/"), F.col("n_name")).alias(
            "dump_path"
        ),
    )


def fn_regexp_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — regexp_replace (awk ``gsub``, ``beeline_functions.sh:24``)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("consonants"),
    )


def fn_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — delimiter split (``awk -F|``): first/second token + word count
    via length arithmetic (no array materialization in the output so the
    oracle compares scalars)."""
    part = load_table(spark, sf_dir, "part")
    n_words = (
        F.length("p_name") - F.length(F.regexp_replace(F.col("p_name"), " ", "")) + 1
    )
    return part.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("w2"),
        n_words.cast("int").alias("n_words"),
    )


def fn_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — basename extraction (``hive3repl.sh:18,47`` use ``basename``/
    ``dirname``) via regexp_extract on a constructed dump path."""
    nation = load_table(spark, sf_dir, "nation")
    path = F.concat(F.lit("/repl/dump/"), F.col("n_name"))
    return nation.select(
        "n_nationkey",
        F.regexp_extract(path, r"([^/]+)$", 1).alias("base_name"),
    )


def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — timestamp formatting (log lines ``misc_functions.sh:16``, run ids
    ``init_variables.sh:18``)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
    )


def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5b — date/interval arithmetic suite: offset (+30 days), month
    start/end, day distance to a fixed horizon, calendar parts. Derived
    dates are emitted as formatted strings so the cross-engine comparison
    is representation-exact. All codegen'd JVM date expressions — narrow
    map, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_day"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).alias("days_to_horizon"),
        F.month(d).alias("order_month"),
        F.quarter(d).alias("order_quarter"),
        (F.dayofweek(d) - 1).alias("dow_sunday0"),
    )


def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 — cryptographic content hashing (md5 / sha-256 hex digests):
    the content-addressing primitive behind exact dedup keys, dump
    manifest fingerprints, and cache keys. JVM-side digest per row, narrow
    map; standard algorithms so digests are engine-portable by
    definition."""
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.md5(F.col("text")).alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
    )


def fn_div_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — integer div/mod (``misc_functions.sh:102``: ``/60``, ``%60``)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.floor(F.col("event_id") / 60).alias("id_div"),
        (F.col("event_id") % 60).alias("id_mod"),
    )


def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — conditional ladder (the verification if/elif chain,
    ``hive3repl.sh:106-119``) as CASE WHEN."""
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return orders.select("o_orderkey", band.alias("price_band"))


def fn_param_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — parameterized SQL: the engine analog of ``--hivevar``
    substitution (``beeline_functions.sh:20,160``; ``${hivevar:dbname}`` in
    every HQL). Uses Spark's named-parameter SQL API — injection-safe, unlike
    the reference's text substitution."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_param_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM _param_orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        """,
        args={"min_price": 100000, "status": "O"},
    )


def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — string↔int casts (txid compared numerically,
    ``hive3repl.sh:96,110``): round-trip long → string → long."""
    orders = load_table(spark, sf_dir, "orders")
    as_str = F.col("o_orderkey").cast("string")
    return orders.select(
        "o_orderkey",
        as_str.alias("key_str"),
        as_str.cast("long").alias("key_back"),
    )


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — JSON extraction from the event props column (FIXTURES.md §8).
    Malformed-input posture (hostile-row fuzz wave 2, round 12): a 100 TB
    event stream WILL contain broken and wrong-typed JSON —
    get_json_object is already lenient (NULL on unparseable input), and
    try_cast pins the wrong-typed-field case ('$.k' holding a non-integer
    string) to NULL instead of an ANSI cast fault; the oracle mirrors
    with json_valid + TRY_CAST."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.expr(
            "try_cast(get_json_object(props, '$.k') AS BIGINT)"
        ).alias("k_val"),
    )


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — array functions over embedding vectors: size, first element,
    L2 norm via transform+aggregate (JVM higher-order functions — the same
    codegen path the similarity ops use; no Python). Reads the cleaned
    embeddings relation (catalog.load_embeddings — NULL/empty/zero-norm
    vectors excluded), the same table-level policy every vector op
    shares: element_at(_, 1) ANSI-faults on an empty array (hostile-row
    fuzz wave 2, round 12)."""
    emb = load_embeddings(spark, sf_dir)
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.sqrt(sq_sum).alias("l2_norm"),
    )


def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — map construction + key/value access (event attribute maps)."""
    events = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return events.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 — math suite: abs/sqrt/pow (similarity scores, measures)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.abs(F.col("value") - 100.0).alias("abs_dev"),
        F.sqrt(F.abs(F.col("value"))).alias("sqrt_val"),
        F.pow(F.lit(2.0), (F.col("event_id") % 10).cast("double")).alias("pow2"),
    )


def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 — edit distance (insert/delete/substitute), the classic fuzzy
    string comparator for entity resolution and typo-tolerant dedup
    blocking. Built-in JVM expression — O(len²) per pair but zero Python;
    at 100 TB gate it behind a cheap blocker (length band / first-char)
    so it only runs on candidate pairs, exactly as llm_dedup_ngram gates
    its Jaccard."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region),
        nation.n_regionkey == region.r_regionkey,
    ).select(
        "n_nationkey",
        F.levenshtein(F.col("n_name"), F.col("r_name")).alias("dist"),
        F.levenshtein(F.col("n_name"), F.lit("NATION_1")).alias("dist_lit"),
    )


def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 — URL decomposition via the built-in ``parse_url`` (host /
    path / query / single query-param extraction): the C4-style
    provenance step — per-domain grouping, path-based filtering, and
    tracking-param handling all start from these four pieces. URLs are
    synthesized deterministically from document provenance columns (the
    fixture corpus carries no raw URLs); every extraction is a codegen'd
    JVM expression, no UDFs."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("lang"),
        F.lit("&n="),
        F.col("doc_id").cast("string"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
    )


def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19 — semi-structured access via Spark 4's VARIANT type: props
    parses once into the binary variant encoding (``parse_json``), fields
    extract TYPED (``variant_get`` with a target type) — the
    shred-on-read path that replaces per-access string re-parsing
    (``get_json_object``, F10) for JSON-heavy event streams; at 100 TB
    the variant column also stores smaller than the raw string and
    pushes typed extraction into the scan.

    Malformed-input posture (hostile-row fuzz wave 2, round 12):
    try_parse_json turns unparseable props into a NULL variant instead
    of a FAILFAST task abort, and try_variant_get turns a wrong-typed
    field into NULL instead of a cast fault — so one broken producer
    can't kill a 100 TB shred job; the oracle mirrors with json_valid +
    TRY_CAST. is_variant_null is FALSE-total (measured): it answers "is
    this the JSON null literal", and NULL/unparseable/empty props are
    NOT that literal — FALSE, not NULL (the oracle's json_type guard
    mirrors exactly)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.expr(
            "try_variant_get(try_parse_json(props), '$.k', 'bigint')"
        ).alias("k_typed"),
        F.expr(
            "try_variant_get(try_parse_json(props), '$.missing', 'bigint')"
        ).alias("missing_field"),
        F.expr("is_variant_null(try_parse_json(props))").alias(
            "is_null_doc"
        ),
    )


def fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 — collation-aware comparison (Spark 4 collations,
    SPARK-46830): case-insensitive grouping via the UTF8_LCASE collation
    instead of wrapping every reference in lower() — the collation
    travels with the type, so every downstream comparison/join/group on
    the column is case-insensitive by declaration. Grouping normalizes
    case variants of the order-priority code; output keys re-emitted in
    canonical lower case so the oracle (DuckDB lower()) matches
    byte-for-byte."""
    orders = load_table(spark, sf_dir, "orders")
    varied = orders.select(
        F.when(
            F.col("o_orderkey") % 3 == 0, F.upper(F.col("o_orderpriority"))
        )
        .otherwise(F.col("o_orderpriority"))
        .alias("prio_mixed")
    )
    collated = varied.select(
        F.expr("collate(prio_mixed, 'UTF8_LCASE')").alias("prio_ci")
    )
    return (
        collated.groupBy("prio_ci")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.lower(F.col("prio_ci").cast("string")).alias("priority"),
            "n_orders",
        )
    )


def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F22 — error-safe arithmetic under ANSI mode: the engine runs with
    ANSI enabled (overflow/bad-cast/div-zero FAIL the job, by design —
    silent wraparound at 100 TB is data corruption), so the explicit
    escape hatches are the try_* family: ``try_divide`` → NULL on zero,
    ``try_cast`` → NULL on malformed input, ``try_add`` → NULL on
    overflow. Exercised over real nullable/zero-prone columns; DuckDB
    oracle via TRY_CAST and NULLIF-guarded division."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.expr("try_divide(value, CAST(user_id % 3 AS DOUBLE))").alias(
            "safe_div"
        ),
        F.expr(
            "try_cast(CASE WHEN event_id % 5 = 0 THEN 'not-a-number'"
            " ELSE CAST(event_id AS STRING) END AS BIGINT)"
        ).alias("safe_cast"),
        F.expr("try_add(event_id, 1)").alias("safe_add"),
    )


def fn_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 — column encryption at rest (``aes_encrypt``/``aes_decrypt``,
    GCM): the PII-handling primitive for regulated corpora — encrypt the
    raw value before it lands, decrypt inside the authorized pipeline.
    Ciphertexts are IV-randomized (GCM), so the VERIFIABLE contract is
    the round trip: decrypt(encrypt(x)) must equal x for every row, plus
    a ciphertext-length sanity bound. The oracle reproduces the derived
    booleans/lengths (exact), not the ciphertext bytes — the same
    bracketing idea as the sketch oracles, applied to randomized
    crypto."""
    events = load_table(spark, sf_dir, "events")
    key = "0123456789abcdef"  # 128-bit test key; prod keys come from a KMS
    enc = F.expr(f"aes_encrypt(props, '{key}')")
    dec = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(props, '{key}'), '{key}') AS STRING)"
    )
    return events.select(
        "event_id",
        (dec == F.col("props")).alias("roundtrip_ok"),
        # GCM layout: 12-byte IV + ciphertext(len(plain)) + 16-byte tag
        (F.length(enc) == F.length("props") + 28).alias("len_ok"),
    )


def fn_datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 — calendar-field extraction (year/quarter/month/day/ISO week/
    ISO weekday/day-of-year): the partitioning-key derivations every
    date-partitioned layout needs. All codegen'd JVM expressions. Day-of-
    week uses the ISO numbering (1=Monday..7=Sunday) — Spark's default
    ``dayofweek`` is Sunday-based while other engines are Monday- or
    zero-based, so the portable surface pins ISO via ``weekday()+1``."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.weekofyear(d).alias("iso_week"),
        (F.weekday(d) + 1).alias("iso_dow"),
        F.dayofyear(d).alias("doy"),
    )


ORACLES: dict[str, str] = {
    "fn_try_arith": """
        SELECT event_id,
               value / NULLIF(CAST(user_id % 3 AS DOUBLE), 0.0) AS safe_div,
               TRY_CAST(CASE WHEN event_id % 5 = 0 THEN 'not-a-number'
                             ELSE CAST(event_id AS VARCHAR) END AS BIGINT)
                   AS safe_cast,
               event_id + 1 AS safe_add
        FROM events
    """,
    "fn_crypto_roundtrip": """
        -- NULL plaintext: aes_encrypt/aes_decrypt NULL-propagate, so the
        -- engine's flags are NULL (nothing to verify), not TRUE
        SELECT event_id,
               CASE WHEN props IS NULL THEN NULL ELSE TRUE END
                   AS roundtrip_ok,
               CASE WHEN props IS NULL THEN NULL ELSE TRUE END AS len_ok
        FROM events
    """,
    "fn_collate": """
        SELECT lower(CASE WHEN o_orderkey % 3 = 0
                          THEN upper(o_orderpriority)
                          ELSE o_orderpriority END) AS priority,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "fn_variant": """
        -- json_valid guards DuckDB's erroring json_extract on malformed
        -- props; TRY_CAST pins wrong-typed fields to NULL (mirrors
        -- try_parse_json / try_variant_get); is_variant_null is
        -- FALSE-total in Spark (TRUE only for the valid JSON null
        -- literal, FALSE for NULL/unparseable/empty props) — mirrored
        -- by the json_type guard
        SELECT event_id,
               CASE WHEN json_valid(props)
                    THEN TRY_CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)
               END AS k_typed,
               CASE WHEN json_valid(props)
                    THEN TRY_CAST(json_extract_string(props, '$.missing')
                                  AS BIGINT)
               END AS missing_field,
               CASE WHEN json_valid(props)
                    THEN json_type(props) = 'NULL'
                    ELSE FALSE END AS is_null_doc
        FROM events
    """,
    "fn_datetime_extract": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(month(o_orderdate) AS INTEGER) AS m,
               CAST(day(o_orderdate) AS INTEGER) AS dom,
               CAST(week(o_orderdate) AS INTEGER) AS iso_week,
               CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
        FROM orders
    """,
    "fn_url": """
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/' || lang
                   || '/doc/' || CAST(doc_id AS VARCHAR)
                   || '?ref=' || lang || '&n=' || CAST(doc_id AS VARCHAR)
                       AS url
            FROM documents
        )
        SELECT doc_id, url,
               regexp_extract(url, 'https?://([^/]+)', 1) AS host,
               regexp_extract(url, 'https?://[^/]+(/[^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS query,
               regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param
        FROM u
    """,
    "fn_levenshtein": """
        SELECT n_nationkey,
               CAST(levenshtein(n_name, r_name) AS INTEGER) AS dist,
               CAST(levenshtein(n_name, 'NATION_1') AS INTEGER) AS dist_lit
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    "fn_concat": """
        SELECT n_nationkey, 'hdfs://nn1' || '/repl/' || n_name AS dump_path
        FROM nation
    """,
    "fn_regexp_replace": """
        SELECT p_partkey, regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants
        FROM part
    """,
    "fn_split": """
        SELECT p_partkey,
               split_part(p_name, ' ', 1) AS w1,
               split_part(p_name, ' ', 2) AS w2,
               CAST(LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS INTEGER)
                   AS n_words
        FROM part
    """,
    "fn_regexp_extract": """
        SELECT n_nationkey,
               regexp_extract('/repl/dump/' || n_name, '([^/]+)$', 1) AS base_name
        FROM nation
    """,
    "fn_date_format": """
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day
        FROM orders
    """,
    "fn_date_arith": """
        SELECT o_orderkey,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
                   AS month_start,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31')
                    AS INTEGER) AS days_to_horizon,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
               CAST(dayofweek(o_orderdate) AS INTEGER) AS dow_sunday0
        FROM orders
    """,
    "fn_hash": """
        SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
        FROM documents
    """,
    "fn_div_mod": """
        SELECT event_id,
               CAST(FLOOR(event_id / 60) AS BIGINT) AS id_div,
               event_id % 60 AS id_mod
        FROM events
    """,
    "fn_case_when": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'high' END AS price_band
        FROM orders
    """,
    "fn_param_sql": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
    """,
    "fn_cast": """
        SELECT o_orderkey,
               CAST(o_orderkey AS VARCHAR) AS key_str,
               CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_back
        FROM orders
    """,
    "fn_json": """
        SELECT event_id,
               CASE WHEN json_valid(props)
                    THEN TRY_CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)
               END AS k_val
        FROM events
    """,
    "fn_array": """
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               sqrt(list_aggregate(
                   list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   'sum')) AS l2_norm
        FROM embeddings
    """,
    "fn_map": """
        SELECT event_id, event_type AS type_val, 2 AS n_keys FROM events
    """,
    "fn_math": """
        SELECT event_id,
               ABS(value - 100.0) AS abs_dev,
               SQRT(ABS(value)) AS sqrt_val,
               POWER(2.0, CAST(event_id % 10 AS DOUBLE)) AS pow2
        FROM events
    """,
}

QUERY_FNS = {
    "fn_concat": fn_concat,
    "fn_regexp_replace": fn_regexp_replace,
    "fn_split": fn_split,
    "fn_regexp_extract": fn_regexp_extract,
    "fn_date_format": fn_date_format,
    "fn_date_arith": fn_date_arith,
    "fn_hash": fn_hash,
    "fn_div_mod": fn_div_mod,
    "fn_case_when": fn_case_when,
    "fn_param_sql": fn_param_sql,
    "fn_cast": fn_cast,
    "fn_json": fn_json,
    "fn_array": fn_array,
    "fn_map": fn_map,
    "fn_math": fn_math,
    "fn_levenshtein": fn_levenshtein,
    "fn_url": fn_url,
    "fn_datetime_extract": fn_datetime_extract,
    "fn_variant": fn_variant,
    "fn_collate": fn_collate,
    "fn_crypto_roundtrip": fn_crypto_roundtrip,
    "fn_try_arith": fn_try_arith,
}
