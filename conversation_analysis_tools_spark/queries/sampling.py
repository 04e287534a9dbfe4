"""Corpus sampling / splitting / packing queries -- the selection side
of a large-scale training-data pipeline (beyond-reference extension,
companion to the dedup and quality families):

* deterministic train/eval hash split (no RNG: reproducible across
  runs, engines, and cluster sizes -- the property a 100 TB corpus
  rebuild needs),
* per-source mixture sampling (domain mixing weights),
* token-budget sequence packing (fill fixed-size training sequences),
* unigram-LM document scoring (cheap perplexity-proxy quality signal),
* corpus n-gram counts (the LM table itself),
* PII redaction (regex scrub with match accounting).

Everything hash-based uses md5 (bit-identical in Spark and DuckDB), so
even the sampling queries have strict value oracles: uniformity comes
from the hash, determinism from the key. Lexicographic comparison on
the hex prefix is an engine-portable "u < p" test (hex chars are
ASCII-ordered in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from conversation_analysis_tools_spark.catalog import table as _catalog_table
from conversation_analysis_tools_spark.operators.cache import track
from conversation_analysis_tools_spark.functions.text import (
    STOPWORDS_SQL_ARRAY,
    raw_tokens_expr,
)
from conversation_analysis_tools_spark.queries.registry import register
from conversation_analysis_tools_spark.functions.lits import array_lit
from conversation_analysis_tools_spark.functions.spread import spread_input


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _catalog_table(spark, "documents", sf_dir)


def _doc_hash() -> F.Column:
    """md5 of the decimal doc id -- the deterministic sampling key."""
    return F.md5(F.col("doc_id").cast("string").cast("binary"))


# ---------------------------------------------------------------------------
# deterministic train/eval split
# ---------------------------------------------------------------------------

#: First-two-hex-chars threshold: '1a' = 26/256 ~ 10.2% eval.
EVAL_HEX = "1a"


@register(
    "hash_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{EVAL_HEX}'
                THEN 'eval' ELSE 'train' END AS split
    FROM documents
    """,
)
def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/10 train/eval split by md5(doc_id) prefix.

    Map-only (no shuffle, no RNG state): every engine, run, and
    partitioning produces the same assignment, and new docs never
    reshuffle old ones -- the standard reproducible-split idiom for
    pretraining corpora. The decontamination_check query audits the
    same split (doc_id % 10) family.
    """
    split = F.when(
        F.substring(_doc_hash(), 1, 2) < EVAL_HEX, F.lit("eval")
    ).otherwise(F.lit("train"))
    return _docs(spark, sf_dir).select("doc_id", split.alias("split"))


# ---------------------------------------------------------------------------
# weighted (importance) sampling
# ---------------------------------------------------------------------------

#: Weighted-Bernoulli parameters: u is the first 5 md5 hex chars of
#: the doc id (uniform on [0, 16^5)), and a doc is kept iff
#: u * WB_SCALE < weight * 16^5, i.e. with probability
#: min(1, weight / WB_SCALE) -- exact integer arithmetic, no floats.
WB_M = 16 ** 5  # 1,048,576
WB_SCALE = 2000  # chars per unit probability: 200-char doc -> p = 0.1


def _hex5_sql() -> str:
    """DuckDB mirror of conv(substring(md5, 1, 5), 16, 10)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {1 + j}, 1)) - 1) * {16 ** (4 - j)}"
        for j in range(5)
    )


@register(
    "weighted_bernoulli_sample",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source, n_chars,
               ({_hex5_sql()}) * {WB_SCALE} < n_chars * {WB_M} AS kept
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(count(*) FILTER (kept), 0) AS BIGINT) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           CAST(coalesce(sum(n_chars) FILTER (kept), 0) AS BIGINT)
               AS chars_sampled,
           CAST(min(doc_id) FILTER (kept) AS BIGINT) AS min_sampled_id,
           CAST(max(doc_id) FILTER (kept) AS BIGINT) AS max_sampled_id
    FROM s GROUP BY 1
    """,
)
def weighted_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (importance) Bernoulli sampling -- each doc kept with
    probability proportional to its weight (here n_chars, capped at
    1), the selection primitive that executes a DSIR-style importance
    resample at 100 TB: MAP-ONLY (no sort, no RNG state, no global
    pass), every engine/run/partitioning keeps the same docs, and new
    docs never flip old decisions (the hash_split property, extended
    from uniform to weighted). u = first 5 md5 hex chars of the id;
    keep iff u * WB_SCALE < weight * 16^5 -- pure 63-bit-safe integer
    arithmetic, so the DuckDB oracle reproduces the EXACT sample
    membership, certified here by per-source sampled counts, sampled
    weight mass, and min/max sampled ids. Weighted-without-replacement
    top-k (Efraimidis-Spirakis) deliberately NOT used: its u^(1/w)
    keys are transcendental floats whose last-ulp ordering differs
    across engines; Bernoulli/Poisson sampling is the standard
    scale-out design anyway (expected, not fixed, sample size)."""
    u = F.conv(F.substring(_doc_hash(), 1, 5), 16, 10).cast("bigint")
    kept = (u * F.lit(WB_SCALE)) < (F.col("n_chars") * F.lit(WB_M))
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "source", "n_chars", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("bigint")).alias("n_sampled"),
            F.sum("n_chars").alias("chars_total"),
            F.sum(F.when(F.col("kept"), F.col("n_chars")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("chars_sampled"),
            F.min(F.when(F.col("kept"), F.col("doc_id"))).alias(
                "min_sampled_id"
            ),
            F.max(F.when(F.col("kept"), F.col("doc_id"))).alias(
                "max_sampled_id"
            ),
        )
    )


@register(
    "shard_manifest",
    oracle="""
    SELECT CAST(strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
               AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end shard-writer check: write the corpus as 16
    md5-bucketed training shards (sources/sinks.write_training_shards,
    partitionBy one-pass write), read the shard directory BACK, and
    emit the per-shard manifest (doc/token counts, id range). The
    oracle recomputes the manifest straight from the source table with
    the same hex-digit shard function -- a mismatch means the write
    path dropped, duplicated, or misrouted rows. Staging is the
    deterministic per-sf_dir dir (bounded disk, same policy as
    partition_pruned_scan)."""
    from conversation_analysis_tools_spark.catalog import staging_dir
    from conversation_analysis_tools_spark.sources.sinks import write_training_shards

    docs = _docs(spark, sf_dir)
    out = staging_dir("training_shards", sf_dir)
    write_training_shards(docs, out)
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("shard").cast("bigint").alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.ceil(F.length("text") / 4.0).cast("bigint")).alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# per-source mixture sampling
# ---------------------------------------------------------------------------

#: Keep-rates by source parity: even-numbered sources 25%, odd 75%
#: (stand-in for a real domain-mixing table, e.g. web 25% / books 75%).
#: Thresholds are 4-hex-digit prefixes: floor(rate * 65536) in hex.
MIX_EVEN_HEX = "4000"  # 0.25
MIX_ODD_HEX = "c000"  # 0.75


@register(
    "source_mixing_sample",
    oracle=f"""
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    < (CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                            THEN '{MIX_EVEN_HEX}' ELSE '{MIX_ODD_HEX}' END)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents
    GROUP BY source
    """,
)
def source_mixing_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing sampler: per-source deterministic keep-rates
    (25% even-numbered sources / 75% odd), audited as kept-vs-total
    counts per source.

    The keep decision is a pure row expression (hash prefix <
    per-source threshold) -- at 100 TB this is a map-only filter that
    composes with any downstream op; the rate table would be a
    broadcast join against a real mixing-weights dimension instead of
    the inline CASE.
    """
    rate_hex = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(MIX_EVEN_HEX)
    ).otherwise(F.lit(MIX_ODD_HEX))
    kept = (F.substring(_doc_hash(), 1, 4) < rate_hex).cast("int")
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n_total"), F.sum(kept).alias("n_kept"))
    )


# ---------------------------------------------------------------------------
# token-budget sequence packing
# ---------------------------------------------------------------------------

SEQ_BUDGET = 512


@register(
    "token_budget_pack",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               len(regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / {SEQ_BUDGET}) AS BIGINT) AS seq_id
    FROM toks
    """,
)
def token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {SEQ_BUDGET}-token training sequences per
    source: seq_id = floor(cumulative-tokens-before / budget) in
    doc_id order.

    One window shuffle partitioned by source (the natural packing
    unit); the running sum is a streaming frame, never a
    materialized cross-doc state. Docs longer than the budget simply
    own consecutive seq_ids -- the boundary-crossing splitter is a
    downstream flatMap over (doc, seq offsets).
    """
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(raw_tokens_expr("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return docs.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.floor(cum_before / SEQ_BUDGET).cast("bigint").alias("seq_id"),
    )


# ---------------------------------------------------------------------------
# unigram-LM document scoring (perplexity proxy)
# ---------------------------------------------------------------------------


@register(
    "unigram_logprob",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\b[a-z]{3,}\b')) AS term
        FROM documents
    ),
    counts AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
    lm AS (SELECT term, sum(cnt) AS tcnt FROM counts GROUP BY term),
    total AS (SELECT sum(tcnt) AS tot FROM lm)
    SELECT c.doc_id,
           CAST(sum(c.cnt) AS BIGINT) AS n_tokens,
           round(sum(c.cnt * ln(l.tcnt * 1.0 / t.tot)) / sum(c.cnt), 6) + 0
               AS avg_logprob
    FROM counts c JOIN lm l ON c.term = l.term CROSS JOIN total t
    GROUP BY c.doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average unigram log-probability under the corpus's own
    unigram LM -- the cheap perplexity-proxy quality filter (documents
    of gibberish / boilerplate score far from the corpus mode).

    Plan: one tokenize+count shuffle; the LM table is vocabulary-sized
    -> broadcast back onto the counts; total token mass is a scalar.
    Docs with zero tokens have no defined score and are absent (inner
    join), mirroring how a perplexity filter treats empty docs.
    """
    # spread to scan parallelism (round 12, guide §2.5/§6): the regex
    # tokenize otherwise runs as one task on single-row-group corpora
    docs = spread_input(_docs(spark, sf_dir), "doc_id")
    # raw surface tokens (stopwords KEPT): an LM quality signal wants
    # the real token stream, unlike the relevance pipeline's tokenizer
    tok = docs.select("doc_id", F.explode(raw_tokens_expr("text")).alias("term"))
    counts = (
        track(tok.groupBy("doc_id", "term").agg(F.count("*").alias("cnt")))
    )
    lm = counts.groupBy("term").agg(F.sum("cnt").alias("tcnt"))
    total = lm.agg(F.sum("tcnt")).first()[0]
    return (
        counts.join(F.broadcast(lm), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            # +0.0: negative-zero parity (degenerate near-single-term
            # corpora can round the average log-prob to -0.0)
            (
                F.round(
                    F.sum(
                        F.col("cnt") * F.log(F.col("tcnt") / F.lit(float(total)))
                    )
                    / F.sum("cnt"),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# corpus n-gram counts (the LM table)
# ---------------------------------------------------------------------------


@register(
    "corpus_ngram_top20",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\b[a-z]{3,}\b') AS toks
        FROM documents
    ),
    grams AS (
        SELECT unnest(CASE WHEN len(toks) >= 3
                      THEN list_transform(range(0, len(toks) - 2),
                                          i -> array_to_string(toks[i+1:i+3], ' '))
                      ELSE [] END) AS trigram
        FROM toks
    )
    SELECT trigram, count(*) AS cnt
    FROM grams
    GROUP BY trigram
    ORDER BY cnt DESC, trigram
    LIMIT 20
    """,
)
def corpus_ngram_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus word-trigrams by occurrence (multiset -- unlike
    the dedup shingles, duplicates within a doc count). The n-gram LM
    table in miniature: flatMap explode -> one partial-aggregated
    groupBy -> TakeOrderedAndProject; count-desc with lexicographic
    tiebreak for a deterministic oracle.
    """
    docs = _docs(spark, sf_dir)
    toks = docs.select(raw_tokens_expr("text").alias("_toks"))
    arr = F.col("_toks")
    grams = F.when(
        F.size(arr) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - F.lit(3)),
            lambda i: F.concat_ws(" ", F.slice(arr, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.select(F.explode(grams).alias("trigram"))
        .groupBy("trigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("trigram"))
        .limit(20)
    )


# pii_scrub retired (round-10 registry consolidation): its corpus-
# planted scrub assertion lives on as the case_id >= 1000 rows of
# queries/textstats.pii_redaction_fixed, upgraded from the two-pattern
# email+phone chain to the full five-pattern chain in
# functions/redact.py.


@register(
    "temperature_mixture",
    oracle="""
    WITH per_source AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY 1
    ),
    tot AS (
        SELECT sum(n_tokens)::DOUBLE AS tok_total,
               sum(pow(n_tokens::DOUBLE, 0.3)) AS pow_total
        FROM per_source
    )
    SELECT s.source, s.n_docs, s.n_tokens,
           round(s.n_tokens / t.tok_total, 6) AS p_natural,
           round(pow(s.n_tokens::DOUBLE, 0.3) / t.pow_total, 6) AS p_temp,
           round((pow(s.n_tokens::DOUBLE, 0.3) / t.pow_total)
                 / (s.n_tokens / t.tok_total), 4) AS boost
    FROM per_source s CROSS JOIN tot t
    """,
)
def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture weights (alpha = 0.3, the
    multilingual-corpus rebalancing rule p_s ~ n_s^alpha): small
    sources are up-weighted relative to their natural token share,
    boost = p_temp / p_natural.

    Plan: one partial-aggregated groupBy(source) over the BPE-estimate
    token counts, then a broadcast 1-row total -- corpus-scan bound,
    result is |sources| rows.
    """
    docs = _docs(spark, sf_dir)
    per_source = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.ceil(F.length("text") / 4.0).cast("bigint")).alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum("n_tokens").cast("double").alias("tok_total"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), 0.3)).alias("pow_total"),
    )
    p_nat = F.col("n_tokens") / F.col("tok_total")
    p_temp = F.pow(F.col("n_tokens").cast("double"), 0.3) / F.col("pow_total")
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(p_nat, 6).alias("p_natural"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(p_temp / p_nat, 4).alias("boost"),
    )


@register(
    "data_recipe_epochs",
    oracle="""
    WITH per_source AS (
        SELECT source,
               CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY 1
    ),
    tot AS (
        SELECT sum(n_tokens)::DOUBLE AS tok_total,
               sum(pow(n_tokens::DOUBLE, 0.3)) AS pow_total
        FROM per_source
    )
    SELECT s.source, s.n_tokens,
           CAST(floor(3.0 * t.tok_total * pow(s.n_tokens::DOUBLE, 0.3) / t.pow_total) AS BIGINT)
               AS alloc_tokens,
           round(floor(3.0 * t.tok_total * pow(s.n_tokens::DOUBLE, 0.3) / t.pow_total)
                 / s.n_tokens::DOUBLE, 4) AS epochs,
           round(least(floor(3.0 * t.tok_total * pow(s.n_tokens::DOUBLE, 0.3) / t.pow_total)
                       / s.n_tokens::DOUBLE, 4.0), 4) AS epochs_capped,
           CAST(floor(least(floor(3.0 * t.tok_total * pow(s.n_tokens::DOUBLE, 0.3) / t.pow_total)
                            / s.n_tokens::DOUBLE, 4.0) * s.n_tokens::DOUBLE) AS BIGINT)
               AS effective_tokens
    FROM per_source s CROSS JOIN tot t
    """,
)
def data_recipe_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-recipe planner: per-source epoch counts for a training run
    whose token budget is 3x the corpus (the data-constrained case).
    Budget shares follow the temperature mixture (p ~ n^0.3); a
    source's repetition is capped at 4 epochs -- past ~4 epochs
    repeated data stops substituting for fresh data (Muennighoff et
    al. 2023, Scaling Data-Constrained Language Models), so
    effective_tokens < alloc_tokens flags where the recipe needs new
    sources rather than more sampling.

    Plan: one partial-aggregated groupBy(source) + a broadcast 1-row
    total; all arithmetic (floor/least on doubles) is engine-portable.
    """
    docs = _docs(spark, sf_dir)
    per_source = docs.groupBy("source").agg(
        F.sum(F.ceil(F.length("text") / 4.0).cast("bigint")).alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum("n_tokens").cast("double").alias("tok_total"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), 0.3)).alias("pow_total"),
    )
    nt = F.col("n_tokens").cast("double")
    alloc = F.floor(
        F.lit(3.0) * F.col("tok_total") * F.pow(nt, 0.3) / F.col("pow_total")
    )
    epochs = alloc / nt
    capped = F.least(epochs, F.lit(4.0))
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        alloc.cast("bigint").alias("alloc_tokens"),
        F.round(epochs, 4).alias("epochs"),
        F.round(capped, 4).alias("epochs_capped"),
        F.floor(capped * nt).cast("bigint").alias("effective_tokens"),
    )


@register(
    "quality_decile_bins",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               len(regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b')) AS n_tokens,
               round(len(list_filter(
                         regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b'),
                         t -> list_contains({STOPWORDS_SQL_ARRAY}, t))) * 1.0
                     / nullif(len(regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b')), 0),
                     6) AS stop_ratio
        FROM documents
    ),
    binned AS (
        SELECT doc_id, n_tokens, stop_ratio,
               ntile(10) OVER (ORDER BY stop_ratio, doc_id) AS decile
        FROM feats WHERE n_tokens > 0
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(stop_ratio), 6) AS avg_stop_ratio,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM binned GROUP BY 1
    """,
)
def quality_decile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: docs ntile(10)-bucketed by stopword ratio
    (rounded, doc_id tiebreak -> identical bucket boundaries in both
    engines), profiled per decile.

    Scale-safe exact ntile: instead of ``ntile(10) OVER (ORDER BY ...)``
    (a global sort through ONE task), the global rank is assembled
    distributed -- ``repartitionByRange`` on the sort key (non-
    overlapping ranges), per-partition ``row_number`` (window keyed by
    partition id, so every partition ranks locally in parallel), plus a
    broadcast of per-partition row counts (#partitions values -- a
    bounded strategy probe, not a data collect). The ntile bucket is
    then pure arithmetic on the global rank, reproducing SQL ntile's
    exact split (first N%k buckets get one extra row)."""
    from conversation_analysis_tools_spark.functions.text import STOPWORDS

    docs = _docs(spark, sf_dir)
    raw = raw_tokens_expr("text")
    stop_arr = array_lit(sorted(STOPWORDS))
    n_tokens = F.size(raw).cast("bigint")
    n_stop = F.size(F.filter(raw, lambda t: F.array_contains(stop_arr, t)))
    feats = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(n_stop * 1.0 / F.nullif(n_tokens, F.lit(0)), 6).alias("stop_ratio"),
    ).where(F.col("n_tokens") > 0)

    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    ranged = feats.repartitionByRange(n_parts, "stop_ratio", "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy("stop_ratio", "doc_id")),
    )
    local.persist()
    try:
        part_counts = sorted(
            (r["_pid"], r["cnt"])
            for r in local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
        )
        offsets = {}
        acc = 0
        for pid, cnt in part_counts:
            offsets[pid] = acc
            acc += cnt
        n_total = acc

        k = 10
        r = n_total % k  # first r buckets get (small+1) rows, SQL ntile semantics
        small = n_total // k
        big = small + 1
        off = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in offsets.items() for x in kv]
                ),
                F.col("_pid"),
            ),
            F.lit(0),
        )
        rn = (off + F.col("_lrn")).cast("bigint")
        decile = (
            F.when(rn <= r * big, ((rn - 1) / big).cast("bigint") + 1)
            .otherwise(F.lit(r) + ((rn - r * big - 1) / F.lit(small)).cast("bigint") + 1)
            .cast("int")
        )
        binned = local.withColumn("decile", decile)
        out = binned.groupBy("decile").agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        # Materialize before unpersist so the cached rank map is not
        # recomputed (and the map stays deterministic); localCheckpoint
        # keeps the 10-row result executor-side (no driver round-trip).
        return out.localCheckpoint(eager=True)
    finally:
        local.unpersist()


# ---------------------------------------------------------------------------
# bigram-LM document scoring (interpolated smoothing)
# ---------------------------------------------------------------------------

_BIGRAM_LAMBDA = 0.7


@register(
    "bigram_logprob",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\b[a-z]{{3,}}\b') AS toks
        FROM documents
    ),
    big AS (
        SELECT doc_id,
               unnest(CASE WHEN len(toks) >= 2
                      THEN list_transform(range(0, len(toks) - 1),
                                          i -> {{'w1': toks[i+1], 'w2': toks[i+2]}})
                      ELSE [] END, recursive := true) 
        FROM toks
    ),
    uni AS (
        SELECT term, count(*) AS ucnt
        FROM (SELECT unnest(toks) AS term FROM toks)
        GROUP BY term
    ),
    tot AS (SELECT sum(ucnt) AS mass FROM uni),
    bi AS (SELECT w1, w2, count(*) AS bcnt FROM big GROUP BY w1, w2)
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln({_BIGRAM_LAMBDA} * b.bcnt * 1.0 / u1.ucnt
                        + {1.0 - _BIGRAM_LAMBDA} * u2.ucnt * 1.0 / t.mass)), 6) + 0
               AS avg_logprob
    FROM big d
    JOIN bi b ON d.w1 = b.w1 AND d.w2 = b.w2
    JOIN uni u1 ON d.w1 = u1.term
    JOIN uni u2 ON d.w2 = u2.term
    CROSS JOIN tot t
    GROUP BY d.doc_id
    """,
)
def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average bigram log-probability under the corpus's own
    interpolated bigram LM: log(0.7*P(w2|w1) + 0.3*P(w2)) -- one step
    up the perplexity-proxy ladder from unigram_logprob (catches
    scrambled word salad that unigram stats cannot).

    Plan: one map-only bigram expansion, two aggregates over it (the
    bigram LM and, via a second pass on tokens, the unigram LM), then
    the doc bigrams re-join the LM tables on their own keys --
    shuffle joins on (w1,w2)/term, partial-aggregated, broadcast-
    eligible under AQE when the vocabulary is small. Docs with < 2
    tokens have no bigrams and are absent (unigram_logprob contract).
    """
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", raw_tokens_expr("text").alias("_toks"))
    arr = F.col("_toks")
    bigrams = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - F.lit(2)),
            lambda i: F.struct(
                F.element_at(arr, i + 1).alias("w1"),
                F.element_at(arr, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = track(
        toks.select("doc_id", F.explode(bigrams).alias("b")).select(
            "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
        )
    )
    uni = track(
        toks.select(F.explode(arr).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("ucnt"))
    )
    mass = float(uni.agg(F.sum("ucnt")).first()[0])
    bi = big.groupBy("w1", "w2").agg(F.count("*").alias("bcnt"))
    lam = _BIGRAM_LAMBDA
    p = lam * F.col("bcnt") / F.col("u1cnt") + (1.0 - lam) * F.col("u2cnt") / F.lit(mass)
    return (
        big.join(bi, ["w1", "w2"])
        .join(uni.select(F.col("term"), F.col("ucnt").alias("u1cnt")), F.col("w1") == F.col("term"))
        .drop("term")
        .join(uni.select(F.col("term"), F.col("ucnt").alias("u2cnt")), F.col("w2") == F.col("term"))
        .drop("term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            # +0.0: negative-zero parity (see unigram_logprob)
            (F.round(F.avg(F.log(p)), 6) + F.lit(0.0)).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# document chunking (training-sequence / RAG window construction)
# ---------------------------------------------------------------------------

_CHUNK_LEN = 200
_CHUNK_STRIDE = 150


@register(
    "doc_chunks",
    oracle=f"""
    SELECT d.doc_id,
           CAST((gs.start - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(gs.start AS BIGINT) AS chunk_start,
           substr(d.text, CAST(gs.start AS INT), {_CHUNK_LEN}) AS chunk_text,
           CAST(length(substr(d.text, CAST(gs.start AS INT), {_CHUNK_LEN}))
                AS BIGINT) AS chunk_len
    FROM documents d,
         unnest(generate_series(1, CAST(greatest(length(d.text), 1) AS BIGINT),
                                {_CHUNK_STRIDE})) AS gs(start)
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping character chunks (len 200, stride 150)
    per document -- the window construction every training-sequence /
    RAG pipeline runs before tokenization.

    Map-only: ``sequence`` + ``posexplode`` + ``substring`` are all
    whole-stage-codegen expressions; no shuffle at any scale, output
    partitioning inherits the scan. Empty docs still yield one (empty)
    chunk so every doc_id survives -- the greatest(len,1) guard on
    both sides. Reference has no chunker (its unit is the whole
    conversation); this is the beyond-reference LLM-pipeline tier.
    """
    docs = _docs(spark, sf_dir)
    starts = F.sequence(
        F.lit(1).cast("bigint"),
        F.greatest(F.length("text"), F.lit(1)).cast("bigint"),
        F.lit(_CHUNK_STRIDE).cast("bigint"),
    )
    chunk = F.expr(f"substring(text, CAST(chunk_start AS INT), {_CHUNK_LEN})")
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            ((F.col("chunk_start") - 1) / F.lit(_CHUNK_STRIDE))
            .cast("bigint")
            .alias("chunk_idx"),
            "chunk_start",
            chunk.alias("chunk_text"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style hashed-feature importance weights (domain selection)
# ---------------------------------------------------------------------------

#: Target domain for the importance ratio (the "high-quality" slice).
_DSIR_TARGET_SOURCE = "src0"


@register(
    "dsir_importance",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(regexp_extract_all(lower(text), '\b[a-z]{{3,}}\b')) AS term
        FROM documents
    ),
    feat AS (
        SELECT doc_id, substr(md5(term), 1, 2) AS b, count(*) AS cnt
        FROM tok GROUP BY 1, 2
    ),
    raw AS (SELECT b, sum(cnt) AS rc FROM feat GROUP BY b),
    tgt AS (
        SELECT substr(md5(term), 1, 2) AS b, count(*) AS tc
        FROM tok WHERE source = '{_DSIR_TARGET_SOURCE}' GROUP BY 1
    ),
    tot AS (SELECT (SELECT sum(rc) FROM raw) AS rtot,
                   (SELECT coalesce(sum(tc), 0) FROM tgt) AS ttot),
    lm AS (
        SELECT r.b,
               ln((coalesce(t.tc, 0) + 1.0) / (tot.ttot + 256.0))
             - ln((r.rc + 1.0) / (tot.rtot + 256.0)) AS llr
        FROM raw r LEFT JOIN tgt t ON r.b = t.b CROSS JOIN tot
    )
    SELECT f.doc_id,
           CAST(sum(f.cnt) AS BIGINT) AS n_tokens,
           round(sum(f.cnt * lm.llr) / sum(f.cnt), 6) + 0 AS dsir_logratio
    FROM feat f JOIN lm ON f.b = lm.b
    GROUP BY f.doc_id
    """,
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weight per document: mean log-likelihood
    ratio of a target-domain hashed-feature LM over the raw-corpus LM
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"). Docs whose token distribution looks like
    the target domain score high; resampling by these weights tilts a
    100 TB crawl toward the target mix.

    Hashed features = md5(term) 2-hex-char prefix (256 buckets) --
    engine-portable, fixed-width state regardless of vocabulary, the
    same trick DSIR uses to make the LM O(buckets) not O(vocab).
    Plan: one tokenize+count shuffle to doc-grain features; the two
    bucket LMs are 256-row aggregates broadcast back; final per-doc
    agg reuses the feature shuffle's partitioning. Zero-token docs are
    absent (perplexity-filter contract shared with unigram_logprob).
    """
    # spread to scan parallelism (round 12, guide §2.5/§6)
    docs = spread_input(_docs(spark, sf_dir), "doc_id")
    tok = docs.select(
        "doc_id", "source", F.explode(raw_tokens_expr("text")).alias("term")
    ).withColumn("b", F.substring(F.md5(F.col("term").cast("binary")), 1, 2))
    # one tokenize+count shuffle feeds everything; keeping source in
    # the key (doc -> source is functional, grain unchanged) lets the
    # target-domain LM read the SAME cached frame instead of
    # re-tokenizing the corpus
    feat = track(
        tok.groupBy("doc_id", "source", "b").agg(F.count("*").alias("cnt"))
    )
    is_tgt = F.col("source") == _DSIR_TARGET_SOURCE
    bucket = feat.groupBy("b").agg(
        F.sum("cnt").alias("rc"),
        F.sum(F.when(is_tgt, F.col("cnt")).otherwise(F.lit(0))).alias("tc"),
    )
    rtot, ttot = bucket.agg(F.sum("rc"), F.sum("tc")).first()  # 256-row frame
    lm = bucket.select(
        "b",
        (
            F.log((F.col("tc") + 1.0) / F.lit(float(ttot) + 256.0))
            - F.log((F.col("rc") + 1.0) / F.lit(float(rtot) + 256.0))
        ).alias("llr"),
    )
    return (
        feat.join(F.broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            # +0.0 folds -0.0 to 0.0 (cross-engine negative-zero parity)
            (
                F.round(F.sum(F.col("cnt") * F.col("llr")) / F.sum("cnt"), 6)
                + F.lit(0.0)
            ).alias("dsir_logratio"),
        )
    )
