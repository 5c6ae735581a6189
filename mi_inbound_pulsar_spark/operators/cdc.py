"""Change-data-capture maintenance operators: SCD Type-2 dimension
builds, keyed upsert/tombstone compaction, and incremental rollup
merge.

The reference delivers keyed change streams — a compacted topic is
per-key last-write-wins (``PulsarMessageConsumer.java:350-351``
``consumerBuilder.readCompacted``), and every record carries a key and
an event time (``PulsarUtils.java:121-130``). These operators are the
warehouse-side consumers of exactly that stream: history tracking
(SCD2), state materialization (upsert + delete tombstones), and
incremental aggregate maintenance, each expressed as a declarative
DataFrame plan so Catalyst keeps them to one Exchange apiece.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mi_inbound_pulsar_spark.operators import query
from mi_inbound_pulsar_spark.sources.tables import load_table

#: snapshot/delta boundary for the incremental rollup demo.
ROLLUP_CUTOFF = "2024-01-20"


@query(
    "q_scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type AS status, ts AS valid_from
      FROM ordered WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, status, valid_from,
           lead(valid_from) OVER w AS valid_to,
           lead(valid_from) OVER w IS NULL AS is_current,
           CAST(row_number() OVER w AS BIGINT) AS version
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)
    ORDER BY user_id, valid_from
    """,
)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change stream: collapse
    consecutive no-change records, then derive ``[valid_from,
    valid_to)`` validity intervals with ``lead`` — the standard
    history-tracking load for a keyed CDC feed (the reference's
    compacted-topic consumers see the *latest* value per key;
    SCD2 is what a warehouse keeps when it wants *all* of them).

    Scale: both windows partition by ``user_id`` — one Exchange total,
    and the change-filter drops no-change rows *before* the second
    window, so the interval pass runs on the (much smaller) change
    set. Ordering key ``(ts, event_id)`` is total → deterministic
    under any parallelism.
    """
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(wo).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", F.col("event_type").alias("status"), F.col("ts").alias("valid_from"))
    )
    wv = Window.partitionBy("user_id").orderBy("valid_from")
    return (
        changes.select(
            "user_id",
            "status",
            "valid_from",
            F.lead("valid_from").over(wv).alias("valid_to"),
            F.lead("valid_from").over(wv).isNull().alias("is_current"),
            F.row_number().over(wv).cast("long").alias("version"),
        )
        .orderBy("user_id", "valid_from")
    )


@query(
    "q_cdc_upsert_tombstones",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    latest AS (SELECT * FROM tagged WHERE rn = 1),
    counts AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes FROM events GROUP BY user_id)
    SELECT l.user_id, l.event_type AS last_event_type, l.value AS last_value,
           l.ts AS last_ts, c.n_changes
    FROM latest l JOIN counts c USING (user_id)
    WHERE l.op = 'U'
    ORDER BY l.user_id
    """,
)
def q_cdc_upsert_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed upsert compaction with delete tombstones: materialize the
    live state of a CDC stream — last write per key wins, and a
    trailing tombstone (here: ``event_type='error'`` as the delete op)
    removes the key entirely. This is broker-side topic compaction
    (``PulsarMessageConsumer.java:350-351``) re-done engine-side, plus
    the delete semantics compaction applies to null-value records.

    Scale: ``max_by(struct, struct)`` is a hash aggregate with
    map-side partial combine — no sort, no window, one shuffle on the
    key; out-of-order arrivals need no pre-sort because the ordering
    struct ``(ts, event_id)`` picks the winner associatively.
    """
    e = load_table(spark, sf_dir, "events")
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    latest = tagged.groupBy("user_id").agg(
        F.max_by(
            F.struct("op", "event_type", "value", "ts"), F.struct("ts", "event_id")
        ).alias("s"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    return (
        latest.filter(F.col("s.op") == "U")
        .select(
            "user_id",
            F.col("s.event_type").alias("last_event_type"),
            F.col("s.value").alias("last_value"),
            F.col("s.ts").alias("last_ts"),
            "n_changes",
        )
        .orderBy("user_id")
    )


@query(
    "q_incremental_rollup",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS total_micro,
           CAST(count(*) AS BIGINT)                                       AS n_events,
           CAST(min(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS min_micro,
           CAST(max(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT) AS max_micro,
           round(sum(CAST(round(value * 1000000, 0) AS BIGINT)) * 1.0 / count(*), 6)
                                                                          AS avg_micro
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a pre-aggregated snapshot
    (rows before ``ROLLUP_CUTOFF``) is merged with a freshly aggregated
    delta by **re-aggregating partials** — sum-of-sums, sum-of-counts,
    min-of-mins, max-of-maxes; avg is derived at the end from the
    merged sum/count. The oracle is the direct full aggregation, which
    is exactly the algebraic claim: partial merge ≡ recompute.

    This is how a 100 TB rollup stays cheap: the snapshot partials are
    a few rows per group kept from the last run, and each refresh
    shuffles only the delta. Exact integer micro-units avoid the
    engine-dependent float summation order (see q09's cents pattern).
    """
    e = load_table(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1000000, 0).cast("long")
    base = e.select("ts", "event_type", micro.alias("vmicro"))

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.sum("vmicro").alias("p_sum"),
            F.count(F.lit(1)).alias("p_cnt"),
            F.min("vmicro").alias("p_min"),
            F.max("vmicro").alias("p_max"),
        )

    snapshot = partials(base.filter(F.col("ts") < F.lit(ROLLUP_CUTOFF).cast("timestamp")))
    delta = partials(base.filter(F.col("ts") >= F.lit(ROLLUP_CUTOFF).cast("timestamp")))
    merged = snapshot.unionByName(delta).groupBy("event_type").agg(
        F.sum("p_sum").alias("total_micro"),
        F.sum("p_cnt").alias("n_events"),
        F.min("p_min").alias("min_micro"),
        F.max("p_max").alias("max_micro"),
    )
    return merged.select(
        "event_type",
        "total_micro",
        "n_events",
        "min_micro",
        "max_micro",
        F.round(F.col("total_micro") / F.col("n_events"), 6).alias("avg_micro"),
    ).orderBy("event_type")


@query(
    "q_snapshot_asof",
    oracle="""
    SELECT user_id,
           max_by(value, ts) AS value_asof,
           max(ts) AS last_event_ts,
           CAST(count(*) AS BIGINT) AS n_events_before
    FROM events
    WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time snapshot: each user's latest value AS OF a past
    cutoff, rebuilt from the append-only event log — the time-travel
    read a CDC/warehouse layer answers without storing per-day
    snapshots. (user_id, ts) is unique in this log at every scale
    factor, so ts ordering is total; with a log that can carry same-µs
    events per key, switch the order key to F.struct(ts, event_id) —
    Spark supports struct ordering in max_by, the DuckDB oracle would
    need a composite scalar key.

    Plan: the cutoff filter pushes to the parquet scan (row groups
    after the cutoff are skipped on ts min/max stats); one
    max_by aggregate with map-side partial combine — no window, no
    sort, no snapshot materialization.
    """
    e = load_table(spark, sf_dir, "events")
    cut = e.filter(F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp"))
    return (
        cut.groupBy("user_id")
        .agg(
            F.max_by("value", "ts").alias("value_asof"),
            F.max("ts").alias("last_event_ts"),
            F.count(F.lit(1)).alias("n_events_before"),
        )
        .orderBy("user_id")
    )


@query(
    "q_scd2_asof_lookup",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type <> 'purchase'
    ),
    changes AS (
      SELECT user_id, event_type AS status, ts AS valid_from
      FROM ordered WHERE prev IS NULL OR prev <> event_type
    ),
    purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(c.status, 'none') AS status_at_purchase,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(p.value), 2) AS total_value
    FROM purchases p
    ASOF LEFT JOIN changes c
      ON p.user_id = c.user_id AND p.ts >= c.valid_from
    GROUP BY 1
    ORDER BY status_at_purchase
    """,
)
def q_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup: each purchase joined to the SCD2
    status version valid AT ITS EVENT TIME — the fact-to-versioned-
    dimension join every warehouse runs ("what plan was the user on
    when they bought?"), composed from two existing operators: the
    non-purchase SCD2 change stream ("what was the user last doing
    when they bought?") and the union+window as-of join; purchases
    with no prior activity fall to 'none'.

    Plan: the as-of join is the single-shuffle JVM form (change rows
    and probe rows union, one per-user window carries the latest
    status forward) — no interval join, no per-version fan-out. The
    DuckDB oracle uses its native ASOF JOIN on the replayed change
    set.
    """
    from mi_inbound_pulsar_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.filter(F.col("event_type") != "purchase")
        .select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(wo).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", F.col("event_type").alias("status"), F.col("ts").alias("valid_from"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    looked_up = asof_join(
        purchases,
        changes,
        key="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_cols=["status"],
    )
    return (
        looked_up.groupBy(
            F.coalesce("status", F.lit("none")).alias("status_at_purchase")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("status_at_purchase")
    )


@query(
    "q_deletion_propagation",
    oracle="""
    WITH tomb AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
    o AS (
      SELECT o_orderkey,
             (o_custkey IN (SELECT c_custkey FROM tomb)) AS purged
      FROM orders
    ),
    l AS (
      SELECT (o.purged) AS purged
      FROM lineitem li JOIN o ON li.l_orderkey = o.o_orderkey
    ),
    per_table AS (
      SELECT 'customer' AS tbl,
             count(*) FILTER (c_custkey % 97 = 0) AS purged_rows,
             count(*) FILTER (c_custkey % 97 <> 0) AS retained_rows
      FROM customer
      UNION ALL
      SELECT 'orders', count(*) FILTER (purged), count(*) FILTER (NOT purged) FROM o
      UNION ALL
      SELECT 'lineitem', count(*) FILTER (purged), count(*) FILTER (NOT purged) FROM l
    )
    SELECT tbl, CAST(purged_rows AS BIGINT) AS purged_rows,
           CAST(retained_rows AS BIGINT) AS retained_rows
    FROM per_table ORDER BY tbl
    """,
)
def q_deletion_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: given a tombstone set of
    customers (here ``custkey % 97 = 0`` as the deterministic stand-in
    for a deletion-request table), count the rows each downstream
    table must purge when the deletion propagates through the foreign
    keys (customer -> orders -> lineitem) — the governance sweep every
    lake must run before a compaction cycle.

    Scale: the tombstone set is the small side everywhere — broadcast
    semi-join against orders, and the order-level purge verdict rides
    a key-only frame into the lineitem join (never the wide rows).
    Counting is map-side conditional aggregation; no table is
    rewritten just to be counted. The same plan with the filters
    flipped IS the purge job (dynamic-partition overwrite of the
    retained rows), so the audit and the enforcement share one shape.
    """
    cust = load_table(spark, sf_dir, "customer")
    tomb = F.col("c_custkey") % 97 == 0
    c_counts = cust.agg(
        F.sum(tomb.cast("long")).alias("purged_rows"),
        F.sum((~tomb).cast("long")).alias("retained_rows"),
    ).select(F.lit("customer").alias("tbl"), "purged_rows", "retained_rows")

    tomb_keys = cust.filter(tomb).select(F.col("c_custkey").alias("o_custkey"))
    o = (
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(tomb_keys.withColumn("purged", F.lit(True))),
            "o_custkey",
            "left",
        )
        .select("o_orderkey", F.coalesce("purged", F.lit(False)).alias("purged"))
    )
    o_counts = o.agg(
        F.sum(F.col("purged").cast("long")).alias("purged_rows"),
        F.sum((~F.col("purged")).cast("long")).alias("retained_rows"),
    ).select(F.lit("orders").alias("tbl"), "purged_rows", "retained_rows")

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    l_counts = (
        li.join(o, "o_orderkey")
        .agg(
            F.sum(F.col("purged").cast("long")).alias("purged_rows"),
            F.sum((~F.col("purged")).cast("long")).alias("retained_rows"),
        )
        .select(F.lit("lineitem").alias("tbl"), "purged_rows", "retained_rows")
    )
    return c_counts.unionByName(o_counts).unionByName(l_counts).orderBy("tbl")


IVM_DATE_CUTOFF = "1999-01-01"  # orders before/after = base / delta stream


@query(
    "q_ivm_join_delta",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    ORDER BY nationkey
    """,
)
def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a **join view** with deltas on
    BOTH inputs: V = γ(orders ⋈ customer) maintained under an order
    delta (rows on/after ``IVM_DATE_CUTOFF``) and a late-arriving
    customer delta (custkey % 10 == 0). The update rule is the join
    delta algebra — Δ(A ⋈ B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB — each term
    aggregated to partials and merged by re-aggregation (sum-of-sums),
    exactly :func:`q_incremental_rollup`'s algebraic contract lifted
    from a single table to a join. The oracle is the direct full
    join+aggregate: partial maintenance ≡ recompute, hash-exact.

    Scale: each refresh joins only the deltas against the other side
    (ΔA⋈B₀ broadcasts ΔA when the delta is small — the common case),
    so a 100 TB view updates at the cost of the day's changes, never a
    full rebuild. Money is exact integer cents (q09's pattern), so the
    four-way merge is immune to float summation order.
    """
    cutoff = F.lit(IVM_DATE_CUTOFF).cast("timestamp")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_orderdate") >= cutoff).alias("is_delta"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", (F.col("c_custkey") % 10 == 0).alias("is_delta")
    )
    a0 = o.filter(~F.col("is_delta")).drop("is_delta")
    da = o.filter(F.col("is_delta")).drop("is_delta")
    b0 = c.filter(~F.col("is_delta")).drop("is_delta")
    db = c.filter(F.col("is_delta")).drop("is_delta")

    def partials(orders: DataFrame, custs: DataFrame) -> DataFrame:
        return (
            orders.join(custs, orders.o_custkey == custs.c_custkey)
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("p_n"), F.sum("cents").alias("p_rev"))
        )

    terms = (
        partials(a0, b0)
        .unionByName(partials(da, b0))
        .unionByName(partials(a0, db))
        .unionByName(partials(da, db))
    )
    return (
        terms.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.sum("p_n").alias("n_orders"), F.sum("p_rev").alias("revenue_cents"))
        .orderBy("nationkey")
    )


@query(
    "q_constraint_audit",
    oracle="""
    WITH checks AS (
      SELECT 'customer_pk_unique' AS check_name,
             (SELECT count(*) - count(DISTINCT c_custkey) FROM customer) AS n_violations,
             (SELECT count(*) FROM customer) AS n_checked
      UNION ALL
      SELECT 'documents_nonempty',
             (SELECT count(*) FROM documents
              WHERE n_chars <= 0 OR text IS NULL OR length(text) = 0),
             (SELECT count(*) FROM documents)
      UNION ALL
      SELECT 'events_value_not_nan',
             (SELECT count(*) FROM events WHERE isnan(value)),
             (SELECT count(*) FROM events)
      UNION ALL
      SELECT 'lineitem_fk_orders',
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)),
             (SELECT count(*) FROM lineitem)
      UNION ALL
      SELECT 'lineitem_qty_positive',
             (SELECT count(*) FROM lineitem WHERE l_quantity <= 0),
             (SELECT count(*) FROM lineitem)
      UNION ALL
      SELECT 'orders_fk_customer',
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT count(*) FROM orders)
      UNION ALL
      SELECT 'orders_pk_unique',
             (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
             (SELECT count(*) FROM orders)
    )
    SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_checked AS BIGINT) AS n_checked,
           n_violations = 0 AS passed
    FROM checks ORDER BY check_name
    """,
)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the dbt-test / Great-Expectations
    shape): primary-key uniqueness, referential integrity, domain and
    not-null/non-empty expectations, each evaluated as a full-table
    aggregate returning (check, violations, checked, passed) — the
    contract a warehouse gates its loads on.

    Scale: every check is a single aggregate or anti-join-shaped count;
    FK checks are left-anti joins (count of dangling keys), which AQE
    broadcasts when the key side is small and shuffle-joins otherwise.
    Nothing collects; the audit output is one row per check. At 100 TB
    this runs as one pass per table — and because each check is an
    independent DataFrame, a scheduler can run them concurrently
    against the same scan via cache or let column pruning cut each to
    the checked columns only (asserted for scans in test_plans).
    """
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def check(name: str, violations: DataFrame, total: DataFrame) -> DataFrame:
        v = violations.agg(F.count(F.lit(1)).alias("n_violations"))
        t = total.agg(F.count(F.lit(1)).alias("n_checked"))
        return v.crossJoin(t).select(
            F.lit(name).alias("check_name"), "n_violations", "n_checked"
        )

    def pk_unique(name: str, df: DataFrame, key: str) -> DataFrame:
        # count(*) - count(DISTINCT key), NOT count(key): a NULL primary
        # key must count as a violation (count(key) would skip it and
        # silently pass a table with NULL PKs — and diverge from the
        # count(*)-based oracle)
        return df.agg(
            (F.count(F.lit(1)) - F.count_distinct(F.col(key))).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        ).select(F.lit(name).alias("check_name"), "n_violations", "n_checked")

    checks = (
        pk_unique("customer_pk_unique", cust, "c_custkey")
        .unionByName(
            check(
                "documents_nonempty",
                docs.filter(
                    (F.col("n_chars") <= 0)
                    | F.col("text").isNull()
                    | (F.length("text") == 0)
                ),
                docs,
            )
        )
        .unionByName(check("events_value_not_nan", ev.filter(F.isnan("value")), ev))
        .unionByName(
            check(
                "lineitem_fk_orders",
                li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
                li,
            )
        )
        .unionByName(
            check("lineitem_qty_positive", li.filter(F.col("l_quantity") <= 0), li)
        )
        .unionByName(
            check(
                "orders_fk_customer",
                o.join(cust, o.o_custkey == cust.c_custkey, "left_anti"),
                o,
            )
        )
        .unionByName(pk_unique("orders_pk_unique", o, "o_orderkey"))
    )
    return checks.select(
        "check_name",
        "n_violations",
        "n_checked",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")
