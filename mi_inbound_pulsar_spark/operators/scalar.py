"""Scalar function surface (SURVEY.md §2B): string, date/time, math,
conditional, array/higher-order. All JVM-side built-ins — every
expression here stays inside whole-stage codegen (no Python in the
row path), which is the 100 TB requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.sources.tables import load_table


@query(
    "q_string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                         AS lname,
           upper(p_brand)                        AS ubrand,
           substr(p_type, 1, 5)                  AS type5,
           length(p_name)                        AS name_len,
           concat(p_brand, ':', p_type)          AS brand_type,
           replace(p_name, ' ', '_')             AS snake,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
           split_part(p_type, ' ', 1)            AS head_token,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a
    FROM part
    ORDER BY p_partkey
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: case, substring, length, concat, replace, regexp,
    split, LIKE-in-CASE."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.lower("p_name").alias("lname"),
            F.upper("p_brand").alias("ubrand"),
            F.substring("p_type", 1, 5).alias("type5"),
            F.length("p_name").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_name", " ", "_").alias("snake"),
            F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
            F.split(F.col("p_type"), " ").getItem(0).alias("head_token"),
            F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           year(o_orderdate)                                   AS yr,
           month(o_orderdate)                                  AS mo,
           dayofweek(o_orderdate)                              AS dow,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
           o_orderdate + INTERVAL 90 DAY                       AS due_date,
           strftime(o_orderdate, '%Y-%m-%d')                   AS iso_day
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: trunc, extract, diff, interval add, format.

    DuckDB ``dayofweek`` is 0=Sunday; Spark ``dayofweek`` is 1=Sunday,
    so the Spark side subtracts 1 to align the calendars.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
            F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
                "days_to_2002"
            ),
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_math_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)            AS disc_dev,
           round(sqrt(l_extendedprice), 6)             AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)           AS price_ln,
           round(power(l_quantity, 2), 2)              AS qty_sq,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
           CAST(ceil(l_quantity) AS BIGINT)            AS qty_ceil,
           l_linenumber % 3                            AS ln_mod,
           CASE WHEN l_quantity > 40 THEN 'high'
                WHEN l_quantity > 20 THEN 'mid'
                ELSE 'low' END                         AS qty_band,
           greatest(l_tax, l_discount)                 AS max_rate,
           least(l_tax, l_discount)                    AS min_rate
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + CASE WHEN + greatest/least surface."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
            F.floor(F.col("l_extendedprice") / 1000).alias("price_bucket"),
            F.ceil("l_quantity").alias("qty_ceil"),
            (F.col("l_linenumber") % 3).alias("ln_mod"),
            F.when(F.col("l_quantity") > 40, "high")
            .when(F.col("l_quantity") > 20, "mid")
            .otherwise("low")
            .alias("qty_band"),
            F.greatest("l_tax", "l_discount").alias("max_rate"),
            F.least("l_tax", "l_discount").alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_array_higher_order",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           len(words)                                          AS n_words,
           len(list_distinct(words))                           AS n_distinct,
           len(list_filter(words, w -> length(w) > 4))         AS n_long,
           list_sort(list_distinct(list_transform(words, w -> upper(w))))[1] AS first_upper
    FROM t
    ORDER BY doc_id
    """,
)
def q_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions: split, size, distinct, filter,
    transform, sort, index. All codegen'd — no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id",
            F.size(words).alias("n_words"),
            F.size(F.array_distinct(words)).alias("n_distinct"),
            F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long"),
            F.array_sort(F.array_distinct(F.transform(words, lambda w: F.upper(w))))
            .getItem(0)
            .alias("first_upper"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_explode_posexplode",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id < 20)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, words[i] AS word
    FROM t, unnest(generate_series(1, len(words))) AS u(i)
    ORDER BY doc_id, pos
    """,
)
def q_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — flatten arrays to rows with position.

    Scale: explode is a narrow transformation (no shuffle); row-count
    amplification is per-partition, which is why shingling (dedup.py)
    can run at 100 TB without repartitioning first.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"))
        .orderBy("doc_id", "pos")
    )


@query(
    "q_udf_surface",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100, 0) * round(l_discount * 100, 0) AS BIGINT)
             AS disc_micros,
           len(string_split(p_name, ' ')) AS n_tokens
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_orderkey < 64
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF surface demo: a vectorized ``@pandas_udf`` (Arrow batches,
    exact integer arithmetic) and a row-at-a-time ``F.udf`` (the
    documented slow path) invoked through ``spark.sql`` after
    ``register_udfs`` — proving SQL users see the same surface.

    The filter keeps the row-UDF demo off the full table: the
    per-row interpreter cost is the point being documented, not paid.
    """
    from mi_inbound_pulsar_spark.functions.udfs import register_udfs

    register_udfs(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_udf_demo")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_udf_demo")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               discount_micros(l_extendedprice, l_discount) AS disc_micros,
               CAST(size(tokenize_slow(p_name)) AS BIGINT) AS n_tokens
        FROM lineitem_udf_demo JOIN part_udf_demo ON l_partkey = p_partkey
        WHERE l_orderkey < 64
        ORDER BY l_orderkey, l_linenumber
        """
    )


@query(
    "q_try_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey % 7 = 0 THEN NULL
                ELSE round(o_totalprice / (o_custkey % 7), 4) END AS price_per,
           TRY_CAST(o_orderpriority AS INTEGER)                   AS bad_int,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)    AS prio_num
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
)
def q_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe surface: this engine runs with ANSI mode on (Spark 4
    default), where division by zero and bad casts are runtime ERRORS —
    the ``try_*`` forms return NULL instead, which is what a pipeline
    that must not die on one malformed record uses.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return (
        o.select(
            "o_orderkey",
            F.round(
                F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 7), 4
            ).alias("price_per"),
            F.col("o_orderpriority").try_cast("int").alias("bad_int"),
            F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_num"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_null_semantics",
    oracle="""
    WITH m AS (
      SELECT event_id,
             CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS maybe_user,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END   AS maybe_value
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           coalesce(maybe_user, -1)                   AS user_or_default,
           nullif(maybe_user, 10)                     AS user_not_10,
           maybe_user IS NOT DISTINCT FROM maybe_user AS self_ndsafe,
           maybe_user IS DISTINCT FROM 10             AS not_user_10,
           maybe_value IS NULL AND maybe_user IS NULL AS both_null,
           round(coalesce(maybe_value, 0.0), 2)       AS value_or_zero
    FROM m ORDER BY event_id
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: COALESCE, NULLIF, null-safe equality
    (`<=>` ≙ IS NOT DISTINCT FROM), IS DISTINCT FROM, and NULL
    conjunctions — the semantics every outer join and filter sits on.
    All row-local; Catalyst constant-folds the null-safe self-compare
    to true."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    maybe_user = F.when(F.col("user_id") % 10 == 0, None).otherwise(F.col("user_id"))
    maybe_value = F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    m = e.select(
        "event_id", maybe_user.alias("maybe_user"), maybe_value.alias("maybe_value")
    )
    return m.select(
        "event_id",
        F.coalesce("maybe_user", F.lit(-1)).alias("user_or_default"),
        F.nullif("maybe_user", F.lit(10)).alias("user_not_10"),
        F.col("maybe_user").eqNullSafe(F.col("maybe_user")).alias("self_ndsafe"),
        (~F.col("maybe_user").eqNullSafe(F.lit(10))).alias("not_user_10"),
        (F.col("maybe_value").isNull() & F.col("maybe_user").isNull()).alias("both_null"),
        F.round(F.coalesce("maybe_value", F.lit(0.0)), 2).alias("value_or_zero"),
    ).orderBy("event_id")


@query(
    "q_array_setops",
    oracle="""
    WITH per_user AS (
      SELECT user_id, list_sort(list(DISTINCT event_type)) AS types
      FROM events WHERE user_id < 200 GROUP BY user_id
    )
    SELECT user_id,
           array_to_string(types, ',') AS all_types,
           array_to_string(list_sort(list_intersect(types, ['click', 'view'])), ',')
             AS browse_types,
           array_to_string(list_sort(list_filter(types, t -> NOT list_contains(['click', 'view'], t))), ',')
             AS other_types,
           list_contains(types, 'purchase') AS is_buyer
    FROM per_user ORDER BY user_id
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra over collected groups: intersect / except /
    membership on each user's distinct event-type set. Arrays are
    sorted before comparison (set ops don't define an order in either
    engine); all ops run post-aggregation on tiny per-user arrays."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    browse = F.array(F.lit("click"), F.lit("view"))
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    return per_user.select(
        "user_id",
        F.array_join("types", ",").alias("all_types"),
        F.array_join(F.array_sort(F.array_intersect("types", browse)), ",").alias(
            "browse_types"
        ),
        F.array_join(F.array_sort(F.array_except("types", browse)), ",").alias(
            "other_types"
        ),
        F.array_contains("types", "purchase").alias("is_buyer"),
    ).orderBy("user_id")


@query(
    "q_udtf_strided_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE doc_id < 200
    ),
    chunks AS (
      SELECT doc_id,
             CAST(s / 48 AS INTEGER) AS chunk_id,
             CAST(least(64, len(w) - s) AS INTEGER) AS n_chunk_tokens,
             w[s + 1] AS first_token,
             w[s + least(64, len(w) - s)] AS last_token
      FROM toks, unnest(range(0, len(w), 48)) AS t(s)
      WHERE len(w) > 0
    )
    SELECT doc_id, chunk_id, n_chunk_tokens, first_token, last_token
    FROM chunks ORDER BY doc_id, chunk_id
    """,
)
def q_udtf_strided_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python **UDTF** surface (Spark 4 ``@udtf`` + SQL ``LATERAL``):
    overlapping context-window chunking — window 64 tokens, stride 48,
    so consecutive chunks share a 16-token overlap. This is the
    pre-training chunking idiom the non-overlapping
    :func:`~..sampling.q_doc_chunking` can't express with a plain
    explode-and-slice, and the table-function shape (one row in, k rows
    out, computed imperatively) is exactly what UDTFs exist for.

    Like ``q_udf_surface`` this registers the slow-tier escape hatch
    deliberately: the chunker runs row-at-a-time in a Python worker, so
    the demo is fenced to doc_id < 200. The production-scale form of
    the same semantics is the codegen'd explode+slice (see
    ``q_doc_chunking``) — the UDTF exists so SQL users have the
    general table-function surface when built-ins genuinely can't
    express the per-row expansion.

    Scale: a UDTF evaluates per input partition with no shuffle; the
    expansion is row-local, so the plan is as distributed as the scan.
    The only cost is the Python-worker serialization boundary.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_chunk_tokens int, first_token string, last_token string")
    class StridedChunker:
        def eval(self, words, window: int, stride: int):  # noqa: ANN001
            if not words:
                return
            for start in range(0, len(words), stride):
                chunk = words[start : start + window]
                yield start // stride, len(chunk), chunk[0], chunk[-1]

    spark.udtf.register("strided_chunks", StridedChunker)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).selectExpr("doc_id", "split(text, ' ') AS w").createOrReplaceTempView(
        "udtf_chunk_input"
    )
    return spark.sql(
        """
        SELECT doc_id, c.chunk_id, c.n_chunk_tokens, c.first_token, c.last_token
        FROM udtf_chunk_input, LATERAL strided_chunks(w, 64, 48) AS c
        ORDER BY doc_id, chunk_id
        """
    )
