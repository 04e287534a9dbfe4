"""Data-quality audit and incremental-rollup queries.

Pipeline-operations surface: constraint validation over the relational
tables (orphan foreign keys, duplicate primary keys, null/empty and
range violations) and incremental aggregate maintenance. The
reference validates JSON structure at ingest (json_clean.py:14-231);
at warehouse scale the same trust-but-verify step runs relationally,
after load, as anti-joins and predicate counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table as _catalog_table
from conversation_analysis_tools_spark.operators.rollup import (
    build_rollup,
    finalize_rollup,
    merge_rollup,
)
from conversation_analysis_tools_spark.queries.registry import register


@register(
    "dq_audit",
    oracle="""
    SELECT 'customer_dup_pk' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
    FROM (SELECT c_custkey FROM customer GROUP BY 1 HAVING count(*) > 1)
    UNION ALL
    SELECT 'documents_empty_text', CAST(count(*) AS BIGINT)
    FROM documents WHERE text IS NULL OR text = ''
    UNION ALL
    SELECT 'events_value_invalid', CAST(count(*) AS BIGINT)
    FROM events WHERE value IS NULL OR isnan(value)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', CAST(count(*) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-audit summary: one row per check with its violation
    count (0 = clean). Orphan FK checks are left_anti joins -- at
    scale they shuffle on the join key like any equi-join and AQE
    handles skew; PK-duplicate and predicate checks are partial-
    aggregated scans. All five checks run in one job as a union of
    tiny (1-row) aggregates, so the scans can share the exchange-free
    count shape."""

    def _count(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    customer = _catalog_table(spark, "customer", sf_dir)
    orders = _catalog_table(spark, "orders", sf_dir)
    lineitem = _catalog_table(spark, "lineitem", sf_dir)
    documents = _catalog_table(spark, "documents", sf_dir)
    events = _catalog_table(spark, "events", sf_dir)

    checks = [
        _count(
            "customer_dup_pk",
            customer.groupBy("c_custkey").count().filter(F.col("count") > 1),
        ),
        _count(
            "documents_empty_text",
            documents.filter(F.col("text").isNull() | (F.col("text") == "")),
        ),
        _count(
            "events_value_invalid",
            events.filter(F.col("value").isNull() | F.isnan("value")),
        ),
        _count(
            "lineitem_orphan_orderkey",
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"),
        ),
        _count(
            "orders_orphan_custkey",
            orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti"),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "incremental_rollup",
    oracle="""
    SELECT CAST(ts AS DATE) AS d, event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS total,
           CAST(floor(CAST(2 * (sum(CAST(round((value) * 100) AS BIGINT)) * 100) + (count(*)) AS DOUBLE) / CAST(2 * (count(*)) AS DOUBLE)) AS BIGINT) / CAST(10000 AS DOUBLE)
               AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, verified against full recompute:
    build the daily rollup from the first half of the month, MERGE the
    second half in as a delta (operators/rollup.merge_rollup), and the
    result must equal the oracle's from-scratch GROUP BY over all
    events -- because (count, sum) state is associative. The split
    date plays the role of the ingest boundary; in production the
    delta is the newly-landed partition and history is never
    re-scanned."""
    events = _catalog_table(spark, "events", sf_dir)
    boundary = F.lit("2024-01-16").cast("date")
    old = build_rollup(events.filter(F.col("ts").cast("date") < boundary), "event_type")
    delta = build_rollup(events.filter(F.col("ts").cast("date") >= boundary), "event_type")
    return finalize_rollup(merge_rollup(old, delta))


@register(
    "corpus_version_diff",
    oracle="""
    WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents),
    v2 AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 31 = 0 THEN text || ' appended' ELSE text END) AS h
        FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, md5('new doc ' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE doc_id % 53 = 0
    )
    SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.h <> v2.h THEN 'changed'
                ELSE 'unchanged' END AS status,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(coalesce(v1.doc_id, v2.doc_id)) AS BIGINT) AS first_id,
           CAST(max(coalesce(v1.doc_id, v2.doc_id)) AS BIGINT) AS last_id
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    GROUP BY 1
    """,
)
def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-versioning diff between two corpus snapshots: added /
    removed / changed / unchanged by (doc_id, content-hash) -- the
    audit a training pipeline runs before promoting a new corpus
    version (what changed, and is the churn plausible?).

    One full-outer join on the id plus an md5 compare: at 100 TB both
    sides are id-bucketed, so the join is co-located, and the hash
    column means snapshots can be compared from their (tiny) manifest
    tables without re-reading text. v2 is derived in-query with
    deterministic mutations (drop id%97, edit id%31, add id%53 under
    offset ids) so the oracle reproduces it exactly."""
    docs = _catalog_table(spark, "documents", sf_dir)
    v1 = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))
    edited = F.when(
        F.col("doc_id") % 31 == 0, F.concat(F.col("text"), F.lit(" appended"))
    ).otherwise(F.col("text"))
    v2 = (
        docs.where(F.col("doc_id") % 97 != 0)
        .select("doc_id", F.md5(edited.cast("binary")).alias("h"))
        .unionByName(
            docs.where(F.col("doc_id") % 53 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.md5(
                    F.concat(
                        F.lit("new doc "), F.col("doc_id").cast("string")
                    ).cast("binary")
                ).alias("h"),
            )
        )
    )
    j = v1.alias("a").join(v2.alias("b"), "doc_id", "full_outer")
    status = (
        F.when(F.col("a.h").isNull(), "added")
        .when(F.col("b.h").isNull(), "removed")
        .when(F.col("a.h") != F.col("b.h"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(status.alias("status"), F.col("doc_id"))
        .groupBy("status")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
    )
