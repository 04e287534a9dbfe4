"""Sparse-vector document similarity (N16-N18, J8) -- inverted-index
join, never a blind crossJoin.

Reference semantics (pipeline/duplicate_detector.py:74-167): cosine
over sum-normalized TF dicts; pairs i<j kept when sim >= threshold.
Pairs with no shared term have cosine 0, so generating candidates from
an inverted-index self-join on ``term`` is *exact* (SURVEY §4 item 1):
only pairs that share at least one term are ever materialized.

Scale path: at 100 TB the frequent-term blowup (a term shared by k
docs contributes k^2 candidate rows) is the wall; ``max_df`` drops
terms present in more than a fraction of docs (stopword-like terms
contribute almost nothing to cosine ordering but dominate the join),
and the MinHash-LSH variant in dedup.py replaces the exact join
entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.operators import tfidf as T


def tf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """(id, term, tf) sum-normalized -- the duplicate-detector vector.

    Pass a precomputed (persisted) ``counts`` table to share the
    tokenize+count shuffle with other branches of a pipeline."""
    if counts is None:
        counts = T.term_counts(T.explode_tokens(docs, id_col, text_col), id_col)
    return T.tf_sum(counts, id_col)


#: Threshold comparisons subtract this epsilon on BOTH the engine and
#: every oracle: small-integer count vectors produce cosines that are
#: EXACT rationals (e.g. exactly 0.9), and the two engines' float
#: pipelines land on opposite sides of ``>= thr`` by one ulp (observed
#: at sf0.1: rowcount 2627 vs 2626). Shifting the cut to thr - 1e-9 --
#: far above fp noise (~1e-15), far below the gap to the next distinct
#: rational -- makes both engines agree on every pair.
THRESHOLD_EPS = 1e-9

#: Vocabulary size below which the dense-vector plan beats the
#: inverted index: with v distinct terms shared by nearly all docs the
#: term join materializes O(v * n^2) rows, while the dense plan is a
#: blocked matrix product over n^2 pairs with BLAS dots.
SMALL_VOCAB_LIMIT = 256

#: Corpus size above which the dense plan's n^2 FLOPs are hopeless on
#: any cluster (10^10+ pair dots) -- force the inverted index (or the
#: MinHash-LSH dedup variant) regardless of vocabulary size.
DENSE_MAX_N = 100_000

#: Target rows per block in the blocked dense plan. Grid parallelism
#: is B(B+1)/2 cells for B = ceil(n / DENSE_BLOCK_ROWS); shuffle
#: volume is n * B vector rows.
DENSE_BLOCK_ROWS = 2_000

#: Collapse decision + threshold live in operators/density.py now,
#: shared with the dedup-family collapse consumers; re-exported here
#: for call-site and test continuity.
from conversation_analysis_tools_spark.operators.density import (  # noqa: E402
    DUP_COLLAPSE_MIN_FRAC,
    dup_density_decision as _dup_density_decision_shared,
)


def _dup_density_decision(docs: DataFrame, member: DataFrame) -> bool:
    return _dup_density_decision_shared(docs, member=member)


def pairwise_cosine(
    tf: DataFrame,
    id_col: str = "doc_id",
    max_df: int | None = None,
    strategy: str = "auto",
    threshold: float = 0.0,
) -> DataFrame:
    """All-pairs cosine -> (id1, id2, sim). Physical strategy chosen
    from corpus statistics (a deliberate optimizer decision, SURVEY §4):

    * ``inverted``: self-join on term -- optimal for large sparse
      vocabularies (real text), where few pairs share terms.
    * ``dense``: vocab-aligned normalized dense vectors, broadcast
      nested-loop pair scan with an unrolled dot product -- optimal
      when the vocabulary is tiny and shared (every pair overlaps, so
      the inverted index degenerates to O(vocab * n^2) join rows).
    * ``auto``: count distinct terms, pick accordingly.

    ``max_df`` (drop terms appearing in more than max_df docs) is
    applied HERE, before the strategy probe, so every physical
    strategy sees the same filtered corpus -- previously only the
    inverted plan honored it, and the auto probe could silently route
    a max_df request onto the unfiltered dense plan.
    """
    if max_df is not None:
        doc_freq = tf.groupBy("term").agg(F.count("*").alias("df"))
        tf = tf.join(
            F.broadcast(doc_freq.where(F.col("df") <= max_df)), "term", "left_semi"
        )
    vocab = None
    if strategy == "auto":
        from conversation_analysis_tools_spark.operators.cache import track

        # The strategy probe and the main plan both consume ``tf``;
        # persist it so tokenize + term-count shuffle run once (the
        # reference's precomputed-vector optimization,
        # pipeline/duplicate_detector.py:147-151 -- SURVEY §4). The
        # inverted path reads it twice more (both sides of the term
        # self-join), so the persist pays for itself three times.
        tf = track(tf)
        # one tiny job decides the strategy AND yields the vocabulary
        probe = (
            tf.select("term").distinct().limit(SMALL_VOCAB_LIMIT + 1).collect()
        )
        if len(probe) <= SMALL_VOCAB_LIMIT:
            # Tentatively dense: build (and persist) the vectors, and
            # let their count -- needed for grid blocking anyway --
            # double as the DENSE_MAX_N fence (even a tiny vocabulary
            # cannot rescue the dense plan's n^2 FLOPs above it). The
            # vector build is linear, so probing via it is safe, and
            # this fuses what used to be a separate
            # approx_count_distinct job into a count the dense path
            # paid regardless.
            vocab = sorted(r["term"] for r in probe)
            per_doc = track(_dense_doc_vectors(tf, id_col, vocab))
            n_docs = per_doc.count()
            if n_docs <= DENSE_MAX_N:
                return grid_blocked_pairs(per_doc, threshold, n=n_docs)
            per_doc.unpersist()
            strategy = "inverted"
        else:
            strategy = "inverted"
    if strategy == "dense":
        return _pairwise_cosine_dense(tf, id_col, threshold, vocab)
    return _pairwise_cosine_inverted(tf, id_col)


def _dense_doc_vectors(
    tf: DataFrame, id_col: str, vocab: list
) -> DataFrame:
    """(id, term, tf) -> (_id, v) with v vocab-aligned and
    L2-normalized, entirely JVM-side.

    One codegen'd aggregate per vocabulary slot (round 12, guide
    §1.2/§4.1): ``sum(CASE WHEN term = t THEN tf END)`` -- tf rows are
    unique per (id, term), so the sum is the single value or NULL,
    and coalesce(.., 0.0) reproduces the map-lookup default exactly.
    The previous shape built a per-doc term->tf map through
    ``collect_list(struct(..))`` -- an ObjectHashAggregate that drops
    the stage out of whole-stage codegen -- and then probed it with
    interpreted higher-order transforms per row: at sf1 the vector
    build + count job measured 4.09 s; this form runs the same stage
    as <= SMALL_VOCAB_LIMIT codegen'd sum buffers (inside the
    session's maxFields=600). The norm folds left-to-right in vocab
    order exactly like the old F.aggregate, so every float is
    bit-identical."""
    if not vocab:
        # empty vocabulary <=> empty tf (vocab is its distinct terms,
        # e.g. max_df dropped every term): no docs, no vectors
        return tf.select(
            F.col(id_col).alias("_id"),
            F.array(F.lit(0.0)).alias("v"),
        )
    vcols = [
        F.sum(F.when(F.col("term") == t, F.col("tf"))).alias(f"_s{i}")
        for i, t in enumerate(vocab)
    ]
    sums = tf.groupBy(id_col).agg(*vcols)
    x = [F.coalesce(F.col(f"_s{i}"), F.lit(0.0)) for i in range(len(vocab))]
    nrm_sq = F.lit(0.0)
    for xi in x:
        nrm_sq = nrm_sq + xi * xi
    # norm in its own projection: sqrt(..) is referenced by every
    # element of the division below, and CollapseProject declines to
    # inline a non-cheap alias used more than once, so the norm is
    # evaluated once per row, not once per vocabulary slot
    safe = F.when(F.col("_n") == 0.0, F.lit(1.0)).otherwise(F.col("_n"))
    return (
        sums.select(
            F.col(id_col).alias("_id"),
            F.sqrt(nrm_sq).alias("_n"),
            *[x[i].alias(f"_x{i}") for i in range(len(vocab))],
        )
        .select(
            "_id",
            F.array(
                *[F.col(f"_x{i}") / safe for i in range(len(vocab))]
            ).alias("v"),
        )
    )


def _pairwise_cosine_dense(
    tf: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.0,
    vocab: list | None = None,
) -> DataFrame:
    """Dense plan: GRID-BLOCKED matrix product, no driver-side matrix.

    Docs are hashed into B = ceil(n / DENSE_BLOCK_ROWS) row-blocks;
    every row is replicated to the B grid cells its block belongs to
    (cell (bi, bj), bi <= bj), and each cell independently computes a
    block_i @ block_j^T BLAS product inside ``applyInPandas``,
    emitting only pairs >= threshold. Exactness: an unordered pair
    {x, y} lands in exactly one cell (min(bx,by), max(bx,by)); the
    diagonal cell keeps the strict upper triangle.

    Cost model (SURVEY §4): shuffle = n*B vector rows, FLOPs = n^2*v
    spread over B(B+1)/2 independent tasks. n > DENSE_MAX_N never
    reaches this function (auto-strategy forces inverted/LSH).
    """
    import numpy as np
    import pandas as pd

    if vocab is None:
        vocab = sorted(r["term"] for r in tf.select("term").distinct().collect())

    from conversation_analysis_tools_spark.operators.cache import track

    # persisted: consumed by the count job here AND by the grid cells;
    # registered with the cache tracker so harness loops can release it
    per_doc = track(_dense_doc_vectors(tf, id_col, vocab))
    return grid_blocked_pairs(per_doc, threshold)


def grid_blocked_pairs(
    per_doc: DataFrame, threshold: float, n: int | None = None
) -> DataFrame:
    """All-pairs cosine over L2-normalized vectors (_id, v) with the
    grid-block plan: rows hash into B = ceil(n / DENSE_BLOCK_ROWS)
    blocks, replicate to their B grid cells, and each cell (bi <= bj)
    computes one block_i @ block_j^T BLAS product in
    ``applyInPandas``, emitting pairs >= threshold. Shuffle n*B rows;
    B(B+1)/2 independent tasks; no driver-side matrix. Pass ``n`` if
    the caller already counted the (persisted) vectors."""
    import numpy as np
    import pandas as pd

    if n is None:
        n = per_doc.count()
    n_blocks = max(1, min(64, -(-n // DENSE_BLOCK_ROWS)))

    blocked = per_doc.withColumn(
        "blk", F.pmod(F.hash("_id"), F.lit(n_blocks)).cast("int")
    )
    # replicate each row to every grid cell its block participates in
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(n_blocks - 1)),
        lambda o: F.struct(
            F.least(F.col("blk"), o).alias("bi"),
            F.greatest(F.col("blk"), o).alias("bj"),
        ),
    )
    exploded = (
        blocked.select("_id", "blk", "v", F.explode(F.array_distinct(cells)).alias("c"))
        .select("_id", "blk", "v", F.col("c.bi").alias("bi"), F.col("c.bj").alias("bj"))
    )

    thr = threshold

    # deliberately UNannotated: applyInPandas only needs hints to
    # infer the eval type, and a (key, pdf) pair with a partial hint
    # set makes that inference fail with a UserWarning on every run
    def cell_product(key, pdf):
        bi, bj = key
        if bi == bj:
            left = right = pdf
        else:
            left = pdf[pdf["blk"] == bi]
            right = pdf[pdf["blk"] == bj]
        if not len(left) or not len(right):
            return pd.DataFrame({"id1": [], "id2": [], "sim": []}).astype(
                {"id1": "int64", "id2": "int64", "sim": "float64"}
            )
        L = np.stack(left["v"].to_numpy())
        R = np.stack(right["v"].to_numpy())
        sims = L @ R.T
        lid = left["_id"].to_numpy()
        rid = right["_id"].to_numpy()
        mask = sims >= thr - THRESHOLD_EPS
        if bi == bj:
            mask &= rid[None, :] > lid[:, None]
        ii, jj = np.nonzero(mask)
        a, b = lid[ii], rid[jj]
        return pd.DataFrame(
            {"id1": np.minimum(a, b), "id2": np.maximum(a, b), "sim": sims[ii, jj]}
        )

    return exploded.groupBy("bi", "bj").applyInPandas(
        cell_product, schema="id1 long, id2 long, sim double"
    )


def grouped_grid_pairs(
    vecs: DataFrame,
    group_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """WITHIN-GROUP all-pairs cosine >= threshold over a dense-vector
    column: the grid-block BLAS plan of :func:`grid_blocked_pairs`,
    but gridded per group (e.g. per k-means cluster) instead of
    globally. Each group of size s splits into B = ceil(s /
    DENSE_BLOCK_ROWS) hash blocks and every (group, bi <= bj) cell
    computes one block_i @ block_j^T numpy product in Arrow-batched
    ``applyInPandas`` -- a 64x-128x win over the per-pair interpreted
    HOF cosine fold when groups hold hundreds+ of vectors (measured
    34 s -> 4 s on semdedup at 20k vectors / 157 clusters). Typical
    groups are single-block (B=1, one task per group); a skewed
    group degrades to B(B+1)/2 bounded-size tasks instead of one
    quadratic task -- the same skew escape the global grid uses.

    Returns (group_col, id1, id2, sim) with id1 < id2."""
    import numpy as np
    import pandas as pd

    nrm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    safe = F.when(nrm == 0.0, F.lit(1.0)).otherwise(nrm)
    # null groups/vectors produce no pairs by contract (a null key
    # matches nothing in an equi-join anyway; dropping them here also
    # keeps np.stack off ragged input)
    per = vecs.where(
        F.col(group_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(group_col),
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x / safe).alias("v"),
    )
    grp_type = per.schema[group_col].dataType.simpleString()
    sizes = per.groupBy(group_col).agg(F.count("*").alias("_gsz"))
    nb = (
        F.greatest(
            F.lit(1),
            F.least(F.lit(64), F.ceil(F.col("_gsz") / F.lit(DENSE_BLOCK_ROWS))),
        )
    ).cast("int")
    blocked = (
        per.join(F.broadcast(sizes), group_col)
        .withColumn("_nb", nb)
        .withColumn("blk", F.pmod(F.hash("_id"), F.col("_nb")).cast("int"))
    )
    cells = F.transform(
        F.sequence(F.lit(0), F.col("_nb") - 1),
        lambda o: F.struct(
            F.least(F.col("blk"), o).alias("bi"),
            F.greatest(F.col("blk"), o).alias("bj"),
        ),
    )
    exploded = blocked.select(
        group_col,
        "_id",
        "blk",
        "v",
        F.explode(F.array_distinct(cells)).alias("c"),
    ).select(
        group_col,
        "_id",
        "blk",
        "v",
        F.col("c.bi").alias("bi"),
        F.col("c.bj").alias("bj"),
    )

    thr = threshold

    def cell_product(key, pdf):
        _, bi, bj = key
        if bi == bj:
            left = right = pdf
        else:
            left = pdf[pdf["blk"] == bi]
            right = pdf[pdf["blk"] == bj]
        if not len(left) or not len(right):
            return pd.DataFrame(
                {"g": pd.Series([], dtype=object), "id1": [], "id2": [], "sim": []}
            ).astype({"id1": "int64", "id2": "int64", "sim": "float64"})
        L = np.stack(left["v"].to_numpy())
        R = np.stack(right["v"].to_numpy())
        sims = L @ R.T
        lid = left["_id"].to_numpy()
        rid = right["_id"].to_numpy()
        mask = sims >= thr - THRESHOLD_EPS
        if bi == bj:
            mask &= rid[None, :] > lid[:, None]
        ii, jj = np.nonzero(mask)
        a, b = lid[ii], rid[jj]
        return pd.DataFrame(
            {
                "g": [key[0]] * len(a),
                "id1": np.minimum(a, b),
                "id2": np.maximum(a, b),
                "sim": sims[ii, jj],
            }
        )

    return (
        exploded.groupBy(group_col, "bi", "bj")
        .applyInPandas(
            cell_product,
            schema=f"g {grp_type}, id1 long, id2 long, sim double",
        )
        .withColumnRenamed("g", group_col)
    )


def blocked_cosine_pairs(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.0,
) -> DataFrame:
    """All-pairs cosine >= threshold over a dense-vector column,
    grid-blocked (see :func:`grid_blocked_pairs`) -- the scale-safe
    replacement for an unblocked crossJoin pair scan."""
    from conversation_analysis_tools_spark.operators.cache import track

    nrm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    safe = F.when(nrm == 0.0, F.lit(1.0)).otherwise(nrm)
    per_doc = track(
        vecs.select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col), lambda x: x / safe).alias("v"),
        )
    )
    return grid_blocked_pairs(per_doc, threshold)


def _l2_normalize(tf: DataFrame, id_col: str) -> DataFrame:
    """Divide each doc's tf values by its L2 norm, via a window over
    ``id_col`` -- ONE shuffle on id, no join, and crucially no
    O(n_docs) broadcast (a per-doc norms table broadcast is a driver
    OOM at corpus scale). After this, a pairwise dot product over
    shared terms IS the cosine."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col)
    nrm = F.sqrt(F.sum(F.col("tf") * F.col("tf")).over(w))
    safe = F.when(nrm == 0.0, F.lit(1.0)).otherwise(nrm)
    return tf.withColumn("tf", F.col("tf") / safe)


def _pairwise_cosine_inverted(
    tf: DataFrame,
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Inverted-index plan: self-join on term -> groupBy pair.

    ``tf`` is (id, term, tf). Vectors are L2-normalized FIRST (window
    over id), so the grouped term-join dot product is already the
    cosine -- dividing inputs by norms up front is algebraically
    identical to the reference's divide-at-the-end
    (pipeline/duplicate_detector.py:74-107) and removes two per-doc
    norm joins (previously O(n_docs) broadcasts -- an at-scale
    killer). Only pairs sharing a term appear (exact w.r.t. any
    threshold > 0). ``max_df`` is applied by :func:`pairwise_cosine`
    before dispatch (strategy-independent); the parameter here is kept
    for direct callers.
    """
    if max_df is not None:
        doc_freq = tf.groupBy("term").agg(F.count("*").alias("df"))
        tf = tf.join(
            F.broadcast(doc_freq.where(F.col("df") <= max_df)), "term", "left_semi"
        )

    unit = _l2_normalize(tf, id_col)
    a = unit.select(
        F.col(id_col).alias("id1"), F.col("term"), F.col("tf").alias("tf1")
    )
    b = unit.select(
        F.col(id_col).alias("id2"), F.col("term"), F.col("tf").alias("tf2")
    )
    return (
        a.join(b, "term")
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("tf1") * F.col("tf2")).alias("sim"))
    )


def duplicate_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    strategy: str = "auto",
    counts: DataFrame | None = None,
    collapse: str = "auto",
    route: str = "auto",
    route_budget: int = 32_000_000,
    route_info: dict | None = None,
    cand_budget: int | None = None,
) -> DataFrame:
    """N17: pairs with cosine >= threshold (default 0.8,
    pipeline/duplicate_detector.py:127-167).

    Exact-duplicate collapse: byte-identical texts (the overwhelmingly
    common duplication mode in real corpora) are collapsed to one
    representative (min id per md5(text)) BEFORE the pair join, then
    member pairs are re-expanded. A dup cluster of size k costs k
    expansion rows per surviving pair instead of k^2 inverted-index
    join rows per shared term -- near-dup-heavy corpora are exactly
    where dedup runs. Output-exact: identical texts have identical TF
    vectors, so every cross-group member pair has its representative
    pair's cosine, and within-group pairs score the representative's
    self-cosine (1 up to fp noise; docs whose text yields no terms
    have no vector and never pair, same as the direct plan).

    ``collapse`` selects the plan: ``'auto'`` (default) runs ONE
    EAGER map-side probe job AT PLAN-BUILD TIME -- an
    approx_count_distinct over md5(text) estimating the exact-dup
    count; below DUP_COLLAPSE_MIN_FRAC the direct plan runs, since on
    a dup-light corpus the rep semi-joins and expansion joins are pure
    overhead (~+30% measured at sf0.1's 8 dups / 5k docs). Callers
    that only build or explain the plan (audits, dry runs) should pass
    ``collapse='never'`` (direct plan, fully lazy) or ``'always'``
    (collapse plan, fully lazy) to skip the probe. The probe's
    decision (NOT the result) is memoized per semantic plan of
    ``docs``, so re-running the same corpus -- the bench/pipeline
    steady state -- pays the probe scan once per session; a stale hit
    (same plan hash over regenerated files) can only pick between the
    two OUTPUT-IDENTICAL plans, never change results. Either path
    yields the identical pair set.

    ``max_df`` forces the direct plan: the collapse would compute
    per-term document frequency over the collapsed representative
    corpus (df drops by cluster_size-1 per dup cluster), surviving
    terms the full-corpus filter drops, and its within-group selfdot
    would ignore the filter entirely -- not output-identical.

    ``route`` (round 9, the dedup-family saturation-router discipline
    at tf-cosine grain): 'auto' (DEFAULT since round 10 -- the n-gram
    Jaccard twin's discipline) probes the volume of the exact plan
    Catalyst would actually pick: the inverted index's candidate
    volume (sum over terms of df*(df-1)/2, one linear aggregation),
    or -- when the vocabulary fits the dense BLAS plan (<=
    SMALL_VOCAB_LIMIT terms and <= DENSE_MAX_N docs, the latter from
    one HLL count run only in that regime) -- the dense plan's PAIR
    count, since a small shared vocabulary saturates the index metric
    (~vocab * n^2) long before the dense plan is in trouble. Past
    ``route_budget`` it swaps in :func:`tuned_simhash_pairs` (banded
    cosine-LSH candidates + exact-cosine verify: recall-bounded near
    the threshold, zero false positives, candidate volume ~linear).
    'exact' pins the inverted-index/dense plan -- the certified
    exact-plan queries pass it explicitly so their driver plans stay
    byte-identical.
    All-pairs cosine has NO feasible exact plan once every pair
    shares a term (500k 55-word docs over a 4096-word vocabulary put
    ~52% of all pairs in the inverted index: ~1e11 candidate rows --
    measured killing the JVM through a 126 GiB scratch), which is why
    the engine default must not be the exact plan. The routed
    decision is WARN-logged and recorded in the ``route_info``
    out-param; ``max_df`` pins the exact plan (the routed path has no
    df filter), with ``route_info['requested']`` still reporting the
    caller's actual request.
    """
    import logging

    from conversation_analysis_tools_spark.operators.cache import track

    if collapse not in ("auto", "never", "always"):
        raise ValueError(f"collapse must be auto|never|always, got {collapse!r}")
    if route not in ("exact", "auto", "simhash"):
        raise ValueError(f"route must be exact|auto|simhash, got {route!r}")
    requested = route
    if max_df is not None:
        route = "exact"

    def _cos(tf_df: DataFrame) -> DataFrame:
        est = None
        rt = route
        dense_ok = None
        if rt == "auto":
            # The probe must estimate the EXACT plan Catalyst would
            # actually run, not just the inverted index: on a small
            # shared vocabulary pairwise_cosine's auto strategy picks
            # the grid-blocked dense BLAS plan, whose cost is the PAIR
            # count -- the inverted volume saturates (sum df^2 ~
            # vocab * n^2) long before the dense plan is in trouble.
            # Round 10: routing on inverted volume alone sent the
            # sf0.1 saturated corpus (5k docs, 31 terms, 3.9e8 index
            # rows) to simhash where the dense plan runs the exact
            # answer in a tenth of the time. Probe = one grouped
            # aggregation (volume + vocabulary size) + one HLL doc
            # count ONLY when the vocabulary is dense-plan-small.
            tf_df = track(tf_df)
            # ONE probe job (round 11, guide §2.3/§2.4): the per-term
            # df aggregation carries a DataSketches HLL partial of the
            # doc ids, merged in the same global aggregate -- the doc
            # count used to be a SECOND approx_count_distinct pass
            # over the whole tf table (a full extra corpus-derivative
            # pass at scale; one of two sequential probe jobs in every
            # route='auto' call). Default sketch lgConfigK=12 gives
            # ~1.6% relative std error, inside the 2% the fence's
            # 0.95 derate was sized for.
            stats = (
                tf_df.groupBy("term")
                .agg(
                    F.count(F.lit(1)).alias("df"),
                    F.hll_sketch_agg(id_col).alias("_sk"),
                )
                .agg(
                    F.sum(
                        F.col("df").cast("double")
                        * (F.col("df") - 1).cast("double")
                        / 2.0
                    ).alias("rows"),
                    F.count(F.lit(1)).alias("vocab"),
                    F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("n"),
                )
                .first()
            )
            inv_rows = float(stats["rows"] or 0.0)
            vocab = int(stats["vocab"] or 0)
            # the HLL doc count serves two deciders: the dense
            # feasibility fence below, and the routed path's
            # volume-aware banding solve (the random-collision floor
            # is quadratic in n -- see solve_simhash_bands)
            n_docs = int(stats["n"] or 0)
            dense_ok = False
            est = inv_rows
            # The dense-metric branch must only fire when execution can
            # actually take the dense plan: pairwise_cosine forwards
            # the caller's ``strategy``, so with strategy='inverted' a
            # small shared vocabulary would be SCORED dense (256x
            # budget) while the saturated inverted plan RUNS. And the
            # fence is derated to 0.95*DENSE_MAX_N because this count
            # is an HLL estimate while pairwise_cosine re-checks the
            # fence with an exact count: an underestimate just above
            # the fence would otherwise declare dense feasible here and
            # then silently fall back to the inverted plan -- the
            # measured JVM-kill regime this router exists to prevent.
            # 0.95 = ~3 sigma at the sketch's ~1.6% rse; corpora in
            # the derate band route on the (conservative) inverted
            # metric.
            if vocab <= SMALL_VOCAB_LIMIT and strategy in ("auto", "dense"):
                dense_ok = n_docs <= 0.95 * DENSE_MAX_N
                if dense_ok:
                    est = n_docs * max(0, n_docs - 1) / 2.0
            # A dense BLAS pair is ~100-1000x cheaper than a shuffled
            # inverted-index join row (one fused multiply-add chain
            # inside a numpy matmul vs an exchanged+aggregated row), so
            # the pair metric gets a scaled budget: at the ratio below,
            # 32M rows buys 8.2e9 pairs >= C(DENSE_MAX_N, 2), i.e.
            # every dense-feasible corpus keeps the exact plan --
            # consistent with DENSE_MAX_N being the feasibility fence
            # -- while an explicit tiny route_budget (the certificates'
            # budget-0/1 forcing trick) still forces the routed plan.
            eff_budget = route_budget * (256 if dense_ok else 1)
            rt = "simhash" if est > eff_budget else "exact"
            if rt == "simhash":
                logging.getLogger(__name__).warning(
                    "duplicate_pairs: auto-routing to tuned cosine-LSH "
                    "(approximate, recall-bounded near threshold): probed "
                    "exact-plan volume %.3g %s > budget %d.",
                    est,
                    "dense pairs" if dense_ok else "inverted-index rows",
                    eff_budget,
                )
        if route_info is not None:
            route_info.update(
                requested=requested, route=rt, probe_rows=est,
                route_budget=route_budget, dense_feasible=dense_ok,
                n_docs=n_docs if dense_ok is not None else None,
            )
        if rt == "simhash":
            # route_info doubles as tuning_info so the solved (r, b)
            # and expected recall ride the routing record (ADVICE r9:
            # a clamped low-threshold solve must be visible at the
            # call site, not just in a log)
            return tuned_simhash_pairs(
                tf_df, threshold, id_col, tuning_info=route_info,
                n_docs=n_docs if requested == "auto" else None,
                cand_budget=cand_budget,
            )
        sims = pairwise_cosine(tf_df, id_col, max_df, strategy, threshold)
        return sims.where(F.col("sim") >= threshold - THRESHOLD_EPS)
    member = docs.select(
        F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("_tsig")
    )
    if max_df is not None or collapse == "never":
        do_collapse = False
    elif collapse == "always":
        do_collapse = True
    else:
        do_collapse = _dup_density_decision(docs, member)
    if not do_collapse:
        return _cos(tf_vectors(docs, id_col, text_col, counts))
    member = track(member)  # collapse path: 3 consumers below
    groups = track(
        member.groupBy("_tsig").agg(F.min(id_col).alias("_rep"))
    )
    rep_ids = groups.select(F.col("_rep").alias(id_col))
    docs_r = docs.join(rep_ids, id_col, "left_semi")
    counts_r = (
        counts.join(rep_ids, id_col, "left_semi") if counts is not None else None
    )
    tf = track(tf_vectors(docs_r, id_col, text_col, counts_r))
    rep_sims = _cos(tf)
    # --- expand: within-group pairs score the rep's self-cosine ------
    # (inner join on selfdot drops term-less docs, matching the direct
    # plan where they never enter the index). The _tsig self-join only
    # multiplies inside identical-text groups: its row count IS the
    # number of output pairs.
    unit = _l2_normalize(tf, id_col)
    selfdot = unit.groupBy(id_col).agg(
        F.sum(F.col("tf") * F.col("tf")).alias("sim")
    )
    m1 = member.select(F.col(id_col).alias("id1"), "_tsig")
    m2 = member.select(F.col(id_col).alias("id2"), "_tsig")
    within = (
        m1.join(m2, "_tsig")
        .where(F.col("id1") < F.col("id2"))
        .join(groups, "_tsig")
        .join(selfdot.withColumnRenamed(id_col, "_rep"), "_rep")
        .where(F.col("sim") >= threshold - THRESHOLD_EPS)
        .select("id1", "id2", "sim")
    )
    # --- expand: cross-group pairs inherit the rep pair's cosine -----
    r2sig = groups.select("_rep", "_tsig")
    g1 = member.select(F.col(id_col).alias("_m1"), F.col("_tsig").alias("_s1"))
    g2 = member.select(F.col(id_col).alias("_m2"), F.col("_tsig").alias("_s2"))
    cross = (
        rep_sims.join(
            r2sig.select(F.col("_rep").alias("id1"), F.col("_tsig").alias("_s1")),
            "id1",
        )
        .join(
            r2sig.select(F.col("_rep").alias("id2"), F.col("_tsig").alias("_s2")),
            "id2",
        )
        .join(g1, "_s1")
        .join(g2, "_s2")
        .select(
            F.least("_m1", "_m2").alias("id1"),
            F.greatest("_m1", "_m2").alias("id2"),
            "sim",
        )
    )
    return within.unionByName(cross)


#: Band-length ladder for the adaptive banding solve, best-first.
#: Shorter bands raise the per-band collision probability p^r, so the
#: solve needs fewer bands at low thresholds -- at the price of a
#: higher random-pair collision floor (b * 2^-r per pair) and, in the
#: saturated-n regime, larger buckets (2^r buckets per band). r = 12
#: is the floor: below it random collisions stop being rare (b/2^r
#: approaches 10%+) and over-cap star-degrade starts costing recall.
SIMHASH_R_LADDER = (20, 16, 14, 12)


#: Candidate-volume ceiling for the banded solve when the corpus size
#: is known: the random-pair collision floor materializes b * 2^-r *
#: n^2/2 REAL verify candidates (each a join row carrying two term
#: maps). Measured bracket on the 126 GiB scratch: 3.05e7 candidates
#: executed fine (the walked-back t=0.8 sf10 run), 2.9e8 killed the
#: JVM (the recall-first (16, 152) solve at 500k docs). The ceiling
#: sits modestly above the proven-safe point, well under the proven
#: kill. Volume outranks the recall target: past it the solve walks
#: BACK to longer bands and reports the (clamped) recall it can
#: actually afford.
SIMHASH_CAND_BUDGET = 50_000_000


def solve_simhash_bands(
    threshold: float,
    recall_target: float = 0.98,
    r_ladder: tuple = SIMHASH_R_LADDER,
    b_max: int = 256,
    n_docs: int | None = None,
    cand_budget: int = SIMHASH_CAND_BUDGET,
) -> tuple[int, int, float]:
    """(r, b, est_recall) for the banded cosine-LSH solve: the FIRST
    ladder step whose solved band count fits ``b_max`` (longest bands
    = lowest random-collision floor wins; t = 0.9 solves at the
    r9-certified (20, 85), so high-threshold plans are unchanged by
    the round-10 ladder). If every step clamps, the last step runs at
    b_max and ``est_recall`` = 1-(1-p^r)^b reports the degraded
    expectation -- callers WARN on est_recall < recall_target.

    With ``n_docs`` the solve is additionally VOLUME-aware: the
    random-collision floor costs ~b * 2^-r * n^2/2 exact-verify
    candidates, and if the recall-first choice exceeds ``cand_budget``
    (default :data:`SIMHASH_CAND_BUDGET`) the solve walks back up the
    ladder to the longest band length whose floor fits -- trading
    recall (the clamp binds again) for a candidate volume that
    actually executes. At t=0.8 this keeps the 0.98-target (16, 152)
    solve up to ~200k docs and degrades to the clamped (20, 256)
    ~0.93 beyond it, with the estimate reporting the trade either way.
    ``cand_budget`` exists for the driver certificate
    (simhash_walkback_fixed forces it to 0 so the walk-back provably
    engages on a small fixed corpus) and for operators tuned to a
    different scratch capacity."""
    import math

    t = float(threshold)
    p = 1.0 - math.acos(t) / math.pi

    def solve_at(cand_r: int) -> int:
        return max(
            4,
            min(
                b_max,
                math.ceil(
                    math.log(1.0 - recall_target)
                    / math.log(1.0 - p**cand_r)
                ),
            ),
        )

    r, b = r_ladder[-1], solve_at(r_ladder[-1])
    for cand_r in r_ladder:
        cand_b = math.ceil(
            math.log(1.0 - recall_target) / math.log(1.0 - p**cand_r)
        )
        if cand_b <= b_max:
            r, b = cand_r, max(4, cand_b)
            break
    if n_docs is not None and n_docs > 1:
        def floor_cands(cand_r: int, cand_b: int) -> float:
            return cand_b * (2.0 ** -cand_r) * n_docs * (n_docs - 1) / 2.0

        if floor_cands(r, b) > cand_budget:
            # longest bands first: smallest floor; accept the first
            # that fits, else the smallest-floor step regardless
            for cand_r in sorted(r_ladder, reverse=True):
                cand_b = solve_at(cand_r)
                if floor_cands(cand_r, cand_b) <= cand_budget:
                    r, b = cand_r, cand_b
                    break
            else:
                r = max(r_ladder)
                b = solve_at(r)
    est = 1.0 - (1.0 - p**r) ** b
    return r, b, est


def tuned_simhash_pairs(
    tf: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    recall_target: float = 0.98,
    r: int | None = None,
    max_bucket: int = 20,
    tuning_info: dict | None = None,
    n_docs: int | None = None,
    cand_budget: int | None = None,
) -> DataFrame:
    """Threshold-ADAPTIVE banded cosine-LSH + exact-cosine verify: the
    ``duplicate_pairs`` saturation router's target (round 9) -- the
    cosine mirror of dedup.tuned_lsh_pairs.

    Charikar (STOC 2002) random-hyperplane LSH: a hyperplane drawn
    from md5 bits agrees on a pair with cosine t w.p. p = 1 -
    arccos(t)/pi, so a band of ``r`` hyperplane signs collides w.p.
    p^r and b bands give recall 1-(1-p^r)^b; solving

        b = ceil(ln(1 - recall_target) / ln(1 - p^r)),  clamped [4, 256]

    Band length adapts to the threshold (round 10, closing the r9
    t<=0.8 clamp gap): ``r=None`` walks :data:`SIMHASH_R_LADDER`
    best-first and keeps the longest band length whose solve fits 256
    bands -- t = 0.9 stays at the r9-certified (r=20, b=85); t = 0.8,
    where r=20 clamped at 256 bands and measured recall sagged to
    ~0.93, now solves at (r=16, b=152) and meets the 0.98 target
    (certified by simhash_recall_frontier_fixed); t = 0.7 solves at
    (r=14, b=232). Only when every ladder step clamps (t below
    ~0.6) does the last step run at 256 bands, and then the degraded
    expected recall is WARN-logged and reported in ``tuning_info``
    instead of failing silently (ADVICE r9). An explicit ``r`` pins
    the band length (the pre-r10 behavior, clamp included). The band
    length sets the random-pair collision floor: near-orthogonal
    pairs (p ~ 0.5) collide w.p. b * 2^-r, so candidates stay
    ~linear in n even on corpora where every pair shares a term and
    the inverted index is ~n^2 by construction.

    Signatures: per doc, sign of (tf-weighted sum of +-1 bit
    projections) over k = r*b hyperplanes, the bits drawn from salted
    md5(term) digests (deterministic; the per-task memo means each
    distinct term hashes once per task). The per-doc sign matmul runs
    vectorized in Arrow-batched applyInPandas at id grain -- the
    signature stage is one pass over the (id, term, tf) table.
    Sum-normalized tf is a positive per-doc scalar times the count
    vector, so the signs equal the count-vector simhash's.

    Candidates come from :func:`dedup.capped_bucket_pairs` (full pairs
    <= max_bucket, star degrade above -- linear volume). Every
    candidate is verified EXACTLY: per-doc term->tf maps join by pair
    and an array_intersect/aggregate fold computes the true cosine
    JVM-side, so emitted pairs carry exact sims and false positives
    are impossible -- the trade is bounded recall near the threshold,
    exactly the tuned-LSH contract.
    """
    import logging
    import math

    import numpy as np
    import pandas as pd

    from conversation_analysis_tools_spark.operators.dedup import (
        capped_bucket_pairs,
    )

    t = float(threshold)
    if not 0.0 < t < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold!r}")
    if r is None:
        r, b, est_recall = solve_simhash_bands(
            t, recall_target, n_docs=n_docs,
            cand_budget=(
                SIMHASH_CAND_BUDGET if cand_budget is None else cand_budget
            ),
        )
    else:
        p = 1.0 - math.acos(t) / math.pi
        b = min(
            256,
            max(4, math.ceil(math.log(1.0 - recall_target) / math.log(1.0 - p**r))),
        )
        est_recall = 1.0 - (1.0 - p**r) ** b
    if tuning_info is not None:
        tuning_info.update(r=r, b=b, est_recall=est_recall)
    if est_recall < recall_target:
        logging.getLogger(__name__).warning(
            "tuned_simhash_pairs: the 256-band clamp binds at threshold "
            "%.3g even at the shortest band length (r=%d): expected recall "
            "~%.3f < target %.3f. The exact route is the contract in this "
            "regime (pass route='exact').",
            t, r, est_recall, recall_target,
        )
    k = r * b
    salts = math.ceil(k / 60)
    id_type = tf.schema[id_col].dataType.simpleString()
    weights = (1 << np.arange(r, dtype=np.int64))

    memo: dict = {}  # per-task term-bits cache (closure survives the pickle)

    def sign_one(pdf: pd.DataFrame) -> pd.DataFrame:
        def term_bits(term: str) -> np.ndarray:
            v = memo.get(term)
            if v is None:
                import hashlib

                chunks = []
                for s in range(salts):
                    d = hashlib.md5(f"{term}#c{s}".encode()).digest()
                    chunks.append(
                        np.unpackbits(np.frombuffer(d, dtype=np.uint8))[:60]
                    )
                v = np.concatenate(chunks)[:k].astype(np.float64) * 2.0 - 1.0
                memo[term] = v
            return v

        # sort by term FIRST: the float dot below sums in row order,
        # which otherwise follows shuffle order -- a hyperplane sum
        # near zero could flip sign between runs and make the routed
        # output (and its driver certificate) shuffle-luck-dependent
        pdf = pdf.sort_values("term")
        tfv = pdf["tf"].to_numpy(dtype=np.float64)
        M = np.stack([term_bits(tm) for tm in pdf["term"]])
        bits = (tfv @ M > 0).astype(np.int64).reshape(b, r)
        return pd.DataFrame(
            {
                id_col: np.repeat(pdf[id_col].iloc[0], b),
                "band": np.arange(b, dtype=np.int32),
                "key": bits @ weights,
            }
        )

    bx = tf.groupBy(id_col).applyInPandas(
        sign_one, schema=f"{id_col} {id_type}, band int, key long"
    )
    cands = capped_bucket_pairs(bx, id_col, max_bucket)
    # exact verify: per-doc term->unit-tf maps, one fold over the
    # shared-term intersection per candidate -- JVM-side, no Python
    unit = _l2_normalize(tf, id_col)
    vec = unit.groupBy(id_col).agg(
        F.map_from_arrays(
            F.collect_list("term"), F.collect_list("tf")
        ).alias("m")
    )
    v1 = vec.select(F.col(id_col).alias("id1"), F.col("m").alias("m1"))
    v2 = vec.select(F.col(id_col).alias("id2"), F.col("m").alias("m2"))
    dot = F.aggregate(
        F.array_intersect(F.map_keys("m1"), F.map_keys("m2")),
        F.lit(0.0),
        lambda acc, tm: acc + F.element_at("m1", tm) * F.element_at("m2", tm),
    )
    return (
        cands.join(v1, "id1")
        .join(v2, "id2")
        .select("id1", "id2", dot.alias("sim"))
        .where(F.col("sim") >= t - THRESHOLD_EPS)
        .groupBy("id1", "id2")
        .agg(F.first("sim").alias("sim"))
    )


def near_duplicates_of(
    docs: DataFrame,
    target_id,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """N18: one-vs-all cosine for a single target document.

    The target's TF vector is a handful of rows -> broadcast; the scan
    side never shuffles on pairs, only the per-candidate dot-product
    aggregation runs. All vectors are L2-normalized up front (window
    over id -- no O(n_docs) norms broadcast), so the grouped dot IS
    the cosine.
    """
    unit = _l2_normalize(tf_vectors(docs, id_col, text_col), id_col)
    target = unit.where(F.col(id_col) == target_id).select(
        F.col("term"), F.col("tf").alias("tf_t")
    )
    return (
        unit.where(F.col(id_col) != target_id)
        .join(F.broadcast(target), "term")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("tf_t")).alias("sim"))
        .select(F.col(id_col).alias("dup_id"), "sim")
        .where(F.col("sim") >= threshold - THRESHOLD_EPS)
    )
