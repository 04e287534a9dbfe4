"""Similarity-search queries over the embeddings table: exact
brute-force kNN (oracle-checked) and the hyperplane-LSH approximate
path (rows-only -- the hyperplane constants live in Python; recall is
asserted against the exact result in tests instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table as _catalog_table
from conversation_analysis_tools_spark.operators import ann as A
from conversation_analysis_tools_spark.operators import cache
from conversation_analysis_tools_spark.queries.registry import REGISTRY, register
from conversation_analysis_tools_spark.fitcache import cached_fit
from conversation_analysis_tools_spark.functions.spread import spread_input

N_QUERIES = 5  # vec_id 0..4 used as the query batch
EMB_DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _catalog_table(spark, "embeddings", sf_dir)


@register(
    "ann_bruteforce_knn",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, e.vec_id,
               round(list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6)
                   AS sim
        FROM e, q
        WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, sim,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
        FROM sims
    )
    SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= 5
    """,
)
def ann_bruteforce_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for a 5-query batch: broadcast
    queries x one corpus scan, per-query window rank. The baseline
    every approximate path is measured against."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # spread the corpus side to scan parallelism (round 12, guide
    # §2.5/§6): the single-row-group embeddings file otherwise runs
    # the whole dot-product scan as one task
    return A.brute_force_topk(
        spread_input(emb, "vec_id"), queries, k=5, exclude_self=True
    )


@register("ann_lsh_knn", oracle=None)
def ann_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 (3 planes x 3 independent
    tables, multiprobe 1-bit).

    Rows-only check; tests assert recall >= 0.8 against
    ann_bruteforce_knn (measured 0.96 at 3 tables vs 0.64 single-
    table: a miss requires splitting from the query in EVERY table).
    Plane count trades recall for candidate fraction: these synthetic
    embeddings are near-isotropic (worst case for LSH), so few planes
    + multiprobe + multi-table is the operating point; real clustered
    embeddings support more planes (smaller buckets). At 100 TB this
    is the path: bucket join is linear, brute force is not.
    """
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # spread the corpus side (round 12, guide §2.5/§6): bucket exprs +
    # cosine re-rank otherwise run as one task on the single-row-group
    # embeddings file (measured: the whole search was one map-only job)
    return A.lsh_topk(
        spread_input(emb, "vec_id"), queries, dim=EMB_DIM, k=5, n_planes=3,
        exclude_self=True, n_tables=3,
    )


@register("ann_ivf_knn", oracle=None)
def ann_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: k-means coarse quantizer (C=16 lists),
    10-list probe per query, exact cosine re-rank of candidates.

    The third standard ANN shape next to brute force and LSH: probe
    fraction n_probe/C bounds the candidate scan; recall is certified
    against ann_bruteforce_knn (floor 0.9 in ann_recall_frontier). The
    default probe count is picked off the measured frontier
    (the 'ivf' family of ``ann_recall_frontier``): these synthetic near-isotropic
    embeddings are IVF's worst case -- k-means lists carry little
    signal, so clearing recall 0.9 costs 10/16 lists here (measured
    0.96 at sf0.001 AND sf0.01), where real clustered embeddings
    clear it at n_probe 1-2 of hundreds of lists. At 100 TB the
    assigned table is written bucketed by centroid_id so each probed
    list is a contiguous scan, and the quantizer is trained on a
    sample. Rows-only (k-means float iteration is engine-specific).
    """
    emb = _emb(spark, sf_dir)
    cents = cached_fit(
        "ivf_centroids", (16,), sf_dir, lambda: A.kmeans_centroids(emb, n_centroids=16)
    )
    # vectorized assignment (Arrow-batch numpy argmin) -- this query
    # builds its index inline per run, so assignment is its dominant
    # cost at scale; rows-only, and the certified staged/inline parity
    # paths stay on the expression assignment (see ivf_assign)
    # 4 MB floor: the Arrow assignment kernel is light per row, so the
    # spread exchange only pays above the measured 0.8->5.9 MB
    # crossover (sf0.1 A/B: spread cost ~0.3 s; sf1 A/B: saved ~0.7 s)
    assigned = A.ivf_assign(
        spread_input(emb, "vec_id", min_bytes=4 << 20), cents, vectorized=True
    )
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return A.ivf_topk(assigned, queries, cents, k=5, n_probe=10, exclude_self=True)


@register("kmeans_clusters", oracle=None)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N28 KMeans over embeddings (sql_search.py:32-33 declares
    KMeans/PCA surface): k=10, fixed seed, returns cluster sizes.
    Rows-only (float iteration order is engine-specific)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = _emb(spark, sf_dir).select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=10, seed=42, maxIter=20).fit(emb)
    preds = model.transform(emb)
    return (
        preds.groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cluster")
    )


@register("pca_projection", oracle=None)
def pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N28 PCA projection to 2D (the reference imports PCA for result
    projection). Returns per-label centroid of the projected points --
    stable aggregate of an engine-specific decomposition (rows-only).
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = _emb(spark, sf_dir).select(
        "vec_id",
        "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = PCA(k=2, inputCol="features", outputCol="pca").fit(emb)
    proj = model.transform(emb).select(
        "label", vector_to_array("pca").alias("p")
    )
    return (
        proj.groupBy("label")
        .agg(
            F.round(F.avg(F.col("p")[0]), 4).alias("pc1_centroid"),
            F.round(F.avg(F.col("p")[1]), 4).alias("pc2_centroid"),
            F.count("*").alias("n"),
        )
        .orderBy("label")
    )


#: Three well-separated integer-mean blobs: k-means must recover them
#: exactly for ANY init, making cluster sizes and centroids
#: engine-deterministic despite the iterative float fit.
KMEANS_FIXED_POINTS: list[tuple[float, float]] = [
    (0.0, 0.0), (0.0, 3.0), (3.0, 0.0),
    (100.0, 100.0), (100.0, 102.0), (102.0, 100.0), (102.0, 102.0),
    (-100.0, 100.0), (-100.0, 102.0), (-102.0, 100.0), (-102.0, 102.0),
    (-101.0, 101.0),
]


@register(
    "kmeans_fixed_clusters",
    oracle="""
    SELECT * FROM (VALUES (3, 1, 1), (4, 101, 101), (5, -101, 101))
        AS t(n, cx, cy)
    """,
)
def kmeans_fixed_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N28 KMeans driver certificate: the real Spark ML estimator
    (k-means|| init, distributed fit) on a fixed 12-point corpus of
    three well-separated blobs must recover blob sizes and integer
    centroids exactly -- verified stable across init seeds 7/42/123
    before pinning. A literal oracle then certifies the ML path the
    testdata-grain kmeans_clusters query can only rows-check.
    sf_dir unused by design (fixed corpus, regeneration-immune)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = spark.createDataFrame(
        [(i, list(p)) for i, p in enumerate(KMEANS_FIXED_POINTS)],
        "id long, xy array<double>",
    )
    feats = df.select("id", "xy", array_to_vector("xy").alias("features"))
    model = KMeans(k=3, seed=42, maxIter=20).fit(feats)
    return (
        model.transform(feats)
        .groupBy("prediction")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("xy")[0])).cast("int").alias("cx"),
            F.round(F.avg(F.col("xy")[1])).cast("int").alias("cy"),
        )
        .drop("prediction")
    )


@register(
    "pca_fixed_projection",
    oracle="""
    SELECT * FROM (VALUES (0, 0, 0), (1, 5, 0), (2, 10, 0), (3, 15, 0), (4, 5, 0))
        AS t(id, abs_pc1, abs_pc2)
    """,
)
def pca_fixed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N28 PCA driver certificate: exactly-collinear fixed points
    (integer multiples of direction (3,4)) make the projections exact
    -- |pc1| is the point's distance along the line (the unit
    direction is ±(0.6, 0.8)), |pc2| is exactly 0 -- so the
    engine-specific eigendecomposition still yields literal-oracle
    integers after abs+round (sign of a principal axis is arbitrary;
    abs removes it). sf_dir unused (fixed corpus)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    pts = [(0, [0.0, 0.0]), (1, [3.0, 4.0]), (2, [6.0, 8.0]), (3, [9.0, 12.0]), (4, [-3.0, -4.0])]
    df = spark.createDataFrame(pts, "id int, xy array<double>")
    feats = df.select("id", array_to_vector("xy").alias("features"))
    model = PCA(k=2, inputCol="features", outputCol="pca").fit(feats)
    proj = model.transform(feats).select("id", vector_to_array("pca").alias("p"))
    return proj.select(
        "id",
        F.round(F.abs(F.col("p")[0])).cast("int").alias("abs_pc1"),
        F.round(F.abs(F.col("p")[1])).cast("int").alias("abs_pc2"),
    )


@register("ann_int8_knn", oracle=None)
def ann_int8_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 over int8-quantized embeddings (per-vector
    symmetric scale, cosine computed in integer arithmetic -- the
    scales cancel). The 4x-storage-compression rung of the ANN
    ladder; measured recall 0.96 vs the exact float baseline on this
    corpus (tests/test_ann_streaming.py). Rows-only: round-half
    behavior at the int8 boundary is engine-specific."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return A.int8_brute_force_topk(
        spread_input(emb, "vec_id"), queries, k=5, exclude_self=True
    )


@register("ann_pq_knn", oracle=None)
def ann_pq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized top-5: per-subspace k-means codebooks
    (m=8, k=32 -- 5 bytes/vector, 51x compression) trained on a
    bounded sample, ADC scan (per-query distance lookup tables
    inlined as literals, the corpus scan reads CODES, not floats),
    exact-cosine re-rank of the top-100 PQ candidates. Measured
    recall 0.96 vs the exact baseline on this corpus
    (tests/test_ann_streaming.py). At 100 TB this is the production
    vector-index shape: scan bytes drop 51x, k-means train stays a
    bounded driver-side sample, encode is a map-only column
    expression. Rows-only: codebooks are iterative k-means, not
    SQL-expressible."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codebooks = cached_fit(
        "pq_codebooks", (EMB_DIM,), sf_dir, lambda: A.pq_train(emb, EMB_DIM)
    )
    # persist: the per-query ADC frames each rescan the encoded table
    # (spread first -- round 12, guide §2.5/§6 -- so the encode and
    # the cached scan run at full parallelism; 4 MB floor because the
    # codebook-distance encode is a light codegen'd kernel: below the
    # measured 0.8->5.9 MB crossover the exchange costs more than the
    # single-task encode)
    encoded = cache.track(
        A.pq_encode(spread_input(emb, "vec_id", min_bytes=4 << 20), codebooks)
    )
    # Re-rank depth scales with corpus size: these synthetic
    # near-isotropic embeddings are PQ's worst case (ADC ordering
    # degrades as the corpus outgrows the m=8,k=32 codebook
    # resolution: recall@5 at 2000 vectors measured 0.72/0.88/0.96 at
    # rerank 100/200/400). Production keeps the re-rank fraction small
    # by raising codebook bits (k=256) as the corpus grows; the knob
    # here keeps the recall certificate honest at every test sf.
    n = emb.count()
    return A.pq_topk(
        encoded, queries, codebooks, k=5, rerank=max(100, n // 5), exclude_self=True
    )


def _recall_rows(spark, sf_dir, items, approx_of):
    """Shared recall@5-certificate scaffold (used by every family of
    ann_recall_frontier): score each item's
    approximate search against the exact cosine baseline and return
    ``[(key, floor, recall_ok)]``.

    Ground truth = exact top-5 (persisted ONCE across the loop --
    without it every broadcast(exact) re-runs the brute-force scan);
    an item scores a hit per (query, neighbor) pair it retains; all
    joins are broadcasts of tiny top-k frames, nothing rescans the
    corpus beyond what each method already does. ``n_truth == 0``
    (regenerated testdata with < N_QUERIES vectors) degrades to
    all-False rows -- a diagnosable red certificate, never a
    ZeroDivisionError at registry execution time.

    ``approx_of(key, emb, queries) -> DataFrame`` with (query_id,
    vec_id) among its columns."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = (
        A.brute_force_topk(emb, queries, k=5, exclude_self=True)
        .select("query_id", "vec_id")
        .persist()
    )
    try:
        n_truth = exact.count()
        rows = []
        for key, floor in items:
            if n_truth == 0:
                rows.append((key, floor, False))
                continue
            approx = approx_of(key, emb, queries).select("query_id", "vec_id")
            hits = approx.join(F.broadcast(exact), ["query_id", "vec_id"]).count()
            rows.append((key, floor, hits / n_truth >= floor))
    finally:
        exact.unpersist()
    return rows


#: Per-method recall@5 floors the certificate asserts. Conservative
#: (the pytest floors, not the measured 0.96-1.0 values) so the check
#: is robust to regenerated testdata while still failing on a real
#: index regression.
RECALL_FLOORS = {
    "ann_lsh_knn": 0.8,
    "ann_ivf_knn": 0.9,
    "ann_int8_knn": 0.8,
    "ann_pq_knn": 0.8,
}


@register(
    "ann_recall_frontier",
    oracle="""
    SELECT * FROM (VALUES
        ('method', 'ann_lsh_knn',          80,  TRUE),
        ('method', 'ann_ivf_knn',          90,  TRUE),
        ('method', 'ann_int8_knn',         80,  TRUE),
        ('method', 'ann_pq_knn',           80,  TRUE),
        ('ivf', 'na=1,np=2,scan=12',       15,  TRUE),
        ('ivf', 'na=1,np=4,scan=25',       45,  TRUE),
        ('ivf', 'na=1,np=8,scan=50',       70,  TRUE),
        ('ivf', 'na=1,np=10,scan=62',      90,  TRUE),
        ('ivf', 'na=1,np=16,scan=100',     100, TRUE),
        ('ivf', 'na=2,np=2,scan=25',       40,  TRUE),
        ('ivf', 'na=2,np=4,scan=50',       70,  TRUE),
        ('ivf', 'na=2,np=6,scan=75',       90,  TRUE),
        ('ivf', 'na=2,np=16,scan=100',     100, TRUE),
        ('lsh', 'p=1,t=1',                 100, TRUE),
        ('lsh', 'p=2,t=1',                 50,  TRUE),
        ('lsh', 'p=3,t=1',                 40,  TRUE),
        ('lsh', 'p=3,t=3',                 80,  TRUE),
        ('lsh', 'p=5,t=3',                 40,  TRUE),
        ('pq', 'n/10',                     60,  TRUE),
        ('pq', 'n/5',                      80,  TRUE),
        ('pq', '2n/5',                     90,  TRUE),
        ('pq', 'all',                      100, TRUE)
    ) AS t(family, point, floor_x100, recall_ok)
    """,
)
def ann_recall_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 certificate for the WHOLE approximate-ANN surface in
    one family-tagged table (round-10 registry consolidation: the
    former ann_recall_eval + ann_ivf_probe_frontier +
    ann_lsh_plane_frontier + ann_pq_rerank_frontier rows survive
    verbatim, family-tagged, with the IVF scan fraction folded into
    the point label -- every floor of the four retired certificates is
    preserved, and the exact brute-force ground truth is now computed
    ONCE and shared across all 22 operating points instead of four
    times).

    Families and their provable anchors:

    * ``method`` -- each shipped default index (the registered
      ann_*_knn queries) against its pinned floor; a silent recall
      regression in any of the four turns that row red.
    * ``ivf`` -- the recall-vs-scan-cost frontier over (n_assign,
      n_probe) points; ``scan`` in the label is the candidate-scan
      fraction n_assign*n_probe/C (x100, capped). n_probe=16 of C=16
      probes EVERYTHING, so those rows' 1.0 is provable, anchoring
      the frontier's top end; the n_assign=2 rows expose the
      soft-assignment (list replication) lever that reaches the 0.9
      knee at 6 probes instead of 10.
    * ``lsh`` -- the (n_planes, n_tables) frontier; the (1,1) anchor
      is provable (1-bit multiprobe covers both buckets of a single
      plane: candidates = whole corpus, exact re-rank).
    * ``pq`` -- recall vs exact-re-rank depth RELATIVE to corpus size
      (ADC ordering quality tracks the re-rank FRACTION, so relative
      depths keep the certificate meaningful at every sf); the 'all'
      row re-ranks every encoded row by true cosine, provably 1.0.

    Floors are the conservative cross-sf minima (see the *_FLOORS
    constants), so the literal-VALUES oracle stays green on
    regenerated testdata while still failing on a real index,
    quantizer, or replica-dedup regression -- at the exact operating
    point where the frontier sagged. All baseline joins are
    broadcasts of tiny top-k frames; each method scans only what its
    index already scans.
    """
    emb = _emb(spark, sf_dir)
    n = emb.count()
    cents = cached_fit(
        "ivf_centroids", (16,), sf_dir,
        lambda: A.kmeans_centroids(emb, n_centroids=16),
    )
    assigned = {
        na: cache.track(A.ivf_assign(emb, cents, n_assign=na))
        for na in sorted({na for na, _, _ in IVF_FRONTIER_FLOORS})
    }
    codebooks = cached_fit(
        "pq_codebooks", (EMB_DIM,), sf_dir, lambda: A.pq_train(emb, EMB_DIM)
    )
    encoded = cache.track(A.pq_encode(emb, codebooks))
    depths = {"n/10": n // 10, "n/5": n // 5, "2n/5": 2 * n // 5, "all": n}

    ivf_pts = {
        f"na={na},np={np_},scan={min(100, na * np_ * 100 // 16)}": (na, np_)
        for na, np_, _ in IVF_FRONTIER_FLOORS
    }
    lsh_pts = {f"p={p_},t={tb}": (p_, tb) for p_, tb, _ in LSH_FRONTIER_FLOORS}
    items = (
        [(("method", m), f) for m, f in RECALL_FLOORS.items()]
        # labels zip 1:1 with the floors (both derive from
        # IVF_FRONTIER_FLOORS in order), so the scan formula lives once
        + [
            (("ivf", label), f)
            for label, (_, _, f) in zip(ivf_pts, IVF_FRONTIER_FLOORS)
        ]
        + [(("lsh", label), f) for label, (_, _, f) in zip(lsh_pts, LSH_FRONTIER_FLOORS)]
        + [(("pq", label), f) for label, f in PQ_FRONTIER_FLOORS]
    )

    def approx(key, emb_, queries):
        family, label = key
        if family == "method":
            return REGISTRY[label].fn(spark, sf_dir)
        if family == "ivf":
            na, np_ = ivf_pts[label]
            return A.ivf_topk(
                assigned[na], queries, cents, k=5, n_probe=np_, exclude_self=True
            )
        if family == "lsh":
            p_, tb = lsh_pts[label]
            return A.lsh_topk(
                emb_, queries, dim=EMB_DIM, k=5, n_planes=p_,
                exclude_self=True, n_tables=tb,
            )
        return A.pq_topk(
            encoded, queries, codebooks, k=5,
            rerank=max(1, depths[label]), exclude_self=True,
        )

    scored = _recall_rows(spark, sf_dir, items, approx)
    return spark.createDataFrame(
        [(fam, label, int(f * 100), ok) for (fam, label), f, ok in scored],
        "family string, point string, floor_x100 int, recall_ok boolean",
    )


#: Measured IVF recall@5 frontier floors across (n_assign, n_probe)
#: operating points (recall at sf0.001/sf0.01/sf0.1 in the comments --
#: the full validated span, incl. the 2000-vector sf0.1 corpus where
#: the LSH frontier visibly sagged; floors are the conservative
#: certificate and every row's cross-sf minimum clears its floor).
#: n_probe=16 of C=16 lists probes EVERYTHING -- candidates are the
#: whole corpus and the re-rank is exact cosine, so recall is 1.0 by
#: construction at ANY n_assign, anchoring the frontier's top end
#: provably. The n_assign=2 rows are the soft-assignment (list
#: replication) lever: recall at fixed probe count rises because a
#: true neighbor must lose the query in BOTH its lists to be missed.
IVF_FRONTIER_FLOORS = [
    (1, 2, 0.15),   # measured 0.24 / 0.36 / 0.36
    (1, 4, 0.45),   # measured 0.52 / 0.72 / 0.56
    (1, 8, 0.70),   # measured 0.76 / 0.96 / 0.92
    (1, 10, 0.90),  # measured 0.96 / 0.96 / 1.00 -- the ann_ivf_knn default
    (1, 16, 1.00),  # exhaustive: provable, not just measured
    (2, 2, 0.40),   # measured 0.64 / 0.60 / 0.60
    (2, 4, 0.70),   # measured 0.80 / 0.96 / 0.84
    (2, 6, 0.90),   # measured 0.96 / 1.00 / 0.92 -- replication's 0.9 knee
    (2, 16, 1.00),  # exhaustive with replicas: still provable
]


def _staged_ivf_lists(spark, emb, cents, sf_dir):
    """Stage the centroid-partitioned inverted lists ONCE per
    (corpus, centroids) definition and return the partitioned read.
    The marker carries a definition fingerprint (corpus row count +
    centroid-matrix digest), so regenerated testdata or a refreshed
    fitcache re-stages instead of silently serving stale lists and
    turning the parity certificates red far from the cause -- the
    pack_and_manifest memo lesson (ADVICE round 6). Shared by
    ann_ivf_partitioned_parity and ann_ivf_batch_dpp; both stay on
    the EXPRESSION assignment (never mix assignment paths across a
    staged/inline comparison -- see operators/ann.ivf_assign)."""
    import hashlib
    import os

    import numpy as np

    from conversation_analysis_tools_spark.catalog import staging_dir

    d = staging_dir("ivf_lists", sf_dir)
    marker = f"{d}/_SUCCESS_lists"
    fp = "{}:{}".format(
        emb.count(),
        hashlib.md5(
            np.ascontiguousarray(np.asarray(cents, dtype=np.float64)).tobytes()
        ).hexdigest(),
    )
    stale = True
    if os.path.exists(marker):
        with open(marker) as f:
            stale = f.read() != fp
    if stale:
        A.ivf_assign(emb, cents).write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(f"{d}/assigned.parquet")
        with open(marker, "w") as f:
            f.write(fp)
    return spark.read.parquet(f"{d}/assigned.parquet")


@register(
    "ann_ivf_partitioned_parity",
    oracle="""
    SELECT 4 AS n_probe, 4 AS lists_probed, TRUE AS results_match
    """,
)
def ann_ivf_partitioned_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF physical layout, exercised end-to-end: the assigned
    table is WRITTEN partitioned by centroid_id (every inverted list
    a directory -- the layout the ann_ivf_knn docstring prescribes for
    100 TB), and a single-query search runs off the partitioned copy
    with the probe set pushed as a static centroid_id IN-filter, so
    the scan touches exactly n_probe of C list directories
    (PartitionFilters pinned in tests/test_layout.py). The
    certificate: the pruned-layout search returns EXACTLY the rows of
    the inline-table search (layout changes bytes read, never
    results), asserted via two exceptAll counts and emitted as a
    literal-oracle boolean. At 100 TB this is the difference between
    scanning ~n_probe/C of the corpus and all of it, with the same
    declarative plan."""
    emb = _emb(spark, sf_dir)
    cents = cached_fit(
        "ivf_centroids", (16,), sf_dir, lambda: A.kmeans_centroids(emb, n_centroids=16)
    )
    part = _staged_ivf_lists(spark, emb, cents, sf_dir)

    q1 = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # probe set derived by the SAME Spark expression ivf_topk slices
    # (array_sort over (distance, cid) structs) -- one bounded
    # 4-row collect, then a STATIC partition filter. A driver-side
    # numpy re-derivation was rejected: numpy's pairwise summation can
    # order two near-equidistant centroids differently from Spark's
    # sequential aggregate fold, and a flipped 4th/5th probe would
    # turn the certificate red on a correct layout.
    pairs = F.transform(
        A._centroid_dist_array("embedding", cents),
        lambda d, i: F.struct(d.alias("d"), i.alias("cid")),
    )
    probes = [
        int(r["cid"])
        for r in q1.select(
            F.explode(F.slice(F.array_sort(pairs), 1, 4)).alias("p")
        ).select(F.col("p.cid").alias("cid")).collect()
    ]

    inline = A.ivf_topk(
        A.ivf_assign(emb, cents), q1, cents, k=5, n_probe=4, exclude_self=True
    )
    pruned = A.ivf_topk(
        part.where(F.col("centroid_id").isin(probes)),
        q1, cents, k=5, n_probe=4, exclude_self=True,
    )
    match = (
        inline.exceptAll(pruned).count() == 0
        and pruned.exceptAll(inline).count() == 0
    )
    return spark.createDataFrame(
        [(4, len(set(probes)), match)],
        "n_probe int, lists_probed int, results_match boolean",
    )


@register(
    "ann_ivf_batch_dpp",
    oracle="""
    SELECT 8 AS n_queries, 4 AS n_probe, TRUE AS dpp_planned,
           TRUE AS results_match
    """,
)
def ann_ivf_batch_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB IVF SERVING shape: a BATCH of queries searched
    against the centroid-partitioned list store, with the union of
    the batch's probe sets pruning list directories DYNAMICALLY --
    ivf_topk's probe relation joins the store on centroid_id, and
    Spark's dynamic partition pruning turns that join into a runtime
    partition filter (reusing the probe broadcast), so the fact scan
    touches only the probed lists with NO static IN-list anyone has
    to precompute. This is the step past ann_ivf_partitioned_parity
    (single query, static filter): probe sets that arrive AS DATA
    prune the same way literal filters do.

    The certificate emits two booleans: ``dpp_planned`` pins the
    mechanism (a dynamicpruning subquery in the optimized plan --
    also asserted with PartitionFilters detail in
    tests/test_layout.py), and ``results_match`` pins parity -- the
    partitioned+DPP search returns EXACTLY the rows of the inline
    (unpartitioned) search, asserted via two exceptAll counts. Layout
    and pruning change bytes read, never results."""
    import io
    import os
    from contextlib import redirect_stdout

    emb = _emb(spark, sf_dir)
    cents = cached_fit(
        "ivf_centroids", (16,), sf_dir,
        lambda: A.kmeans_centroids(emb, n_centroids=16),
    )
    part = _staged_ivf_lists(spark, emb, cents, sf_dir)

    batch = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pruned = A.ivf_topk(part, batch, cents, k=5, n_probe=4, exclude_self=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain(True)
    dpp_planned = "dynamicpruning" in buf.getvalue().lower()

    inline = A.ivf_topk(
        A.ivf_assign(emb, cents), batch, cents, k=5, n_probe=4, exclude_self=True
    )
    match = (
        inline.exceptAll(pruned).count() == 0
        and pruned.exceptAll(inline).count() == 0
    )
    return spark.createDataFrame(
        [(8, 4, dpp_planned, match)],
        "n_queries int, n_probe int, dpp_planned boolean, results_match boolean",
    )


@register("ann_ivf_batch_serve", oracle=None)
def ann_ivf_batch_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch-IVF SERVING plan alone: the same DPP-pruned search
    over the centroid-partitioned list store as ann_ivf_batch_dpp,
    WITHOUT the certificate's inline re-search and two exceptAll
    parity passes -- those proved the plan (and still run as the
    driver row ann_ivf_batch_dpp and continuously in
    tests/test_layout.py::test_ivf_batch_search_plans_dpp_inside_ivf_topk);
    this query is what a serving deployment executes per batch, so
    BENCH measures the serving cost, not the proof cost (VERDICT r7:
    19.6 s at sf1 was 2 full searches + 2 exceptAll passes
    masquerading as query cost). Rows-only: k-means float iteration
    is engine-specific (same rationale as ann_ivf_knn); result-set
    parity vs the unpartitioned search is the certificate's job."""
    emb = _emb(spark, sf_dir)
    cents = cached_fit(
        "ivf_centroids", (16,), sf_dir,
        lambda: A.kmeans_centroids(emb, n_centroids=16),
    )
    part = _staged_ivf_lists(spark, emb, cents, sf_dir)
    batch = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return A.ivf_topk(part, batch, cents, k=5, n_probe=4, exclude_self=True)


#: LSH recall@5 frontier floors across (n_planes, n_tables) with
#: 1-bit multiprobe (recall at sf0.001/sf0.01 in comments). The
#: (1, 1) anchor is PROVABLE: one plane splits the corpus into two
#: buckets and multiprobe probes both, so candidates are the whole
#: corpus and the exact re-rank makes recall 1.0 by construction.
LSH_FRONTIER_FLOORS = [
    (1, 1, 1.00),  # exhaustive by construction
    (2, 1, 0.50),  # measured 0.92 / 0.84 / 0.64 (sf0.001/0.01/0.1)
    (3, 1, 0.40),  # measured 0.64 / 0.60 / 0.56
    (3, 3, 0.80),  # measured 0.96 / 1.00 / 1.00 -- the ann_lsh_knn default
    (5, 3, 0.40),  # measured 0.60 / 0.72 / 0.72
]




#: PQ recall@5 floors per exact-re-rank depth. Depths are RELATIVE to
#: corpus size (n/10, n/5, 2n/5): at fixed codebook resolution the ADC
#: ordering quality is roughly a function of the re-rank FRACTION, so
#: relative depths keep the certificate meaningful at every sf (a
#: fixed depth of 100 is 20% of the 500-vector corpora but 5% of
#: sf0.1's 2000 -- and its recall sags exactly as PQ theory says).
#: 'all' re-ranks every encoded row by true cosine, so that row's 1.0
#: is provable regardless of codebook quality. Measured recall at
#: sf0.001 / sf0.01 / sf0.1 in the comments.
PQ_FRONTIER_FLOORS = [
    ("n/10", 0.60),  # measured 0.80 / 0.84 / 0.88
    ("n/5", 0.80),   # measured 0.96 / 0.96 / 0.96 -- the ann_pq_knn shape
    ("2n/5", 0.90),  # measured 0.96 / 1.00 / 1.00
    ("all", 1.00),   # provable: exact re-rank of the whole corpus
]


