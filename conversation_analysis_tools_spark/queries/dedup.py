"""Deduplication queries (training-data pipeline suite): exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine -- each with a
DuckDB oracle (possible because every hash involved is md5, which is
bit-identical across engines, so even LSH candidate sets match
exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table as _catalog_table
from conversation_analysis_tools_spark.operators import dedup as D
from conversation_analysis_tools_spark.operators.cache import track
from conversation_analysis_tools_spark.queries.registry import register
from conversation_analysis_tools_spark.fitcache import cached_fit


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _catalog_table(spark, "documents", sf_dir)


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT content_hash, n_docs, representative
    FROM (
        SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS representative
        FROM documents GROUP BY md5(text)
    ) WHERE n_docs > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 hash-groupBy (the cheap always-first pass).
    Empty result on this corpus (all texts unique) -- the token-set
    fingerprint variant (fingerprint_dup_groups) catches the shuffled
    near-dups."""
    return D.exact_dup_groups(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# DuckDB mirror of operators.dedup.minhash_signatures: one md5 per
# shingle, 60-bit hex windows parsed digit-at-a-time (DuckDB has no
# base-16 conv), Kirsch-Mitzenmacher h_i = (u%P + i*(v%(P-1)+1)) % P.
def _hex60_sql(start: int) -> str:
    """SQL summing 15 hex digits of column ``d`` from 1-based
    ``start`` into a 60-bit BIGINT (big-endian)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(d, {start + j}, 1)) - 1) * {16 ** (14 - j)}"
        for j in range(15)
    )


_MINHASH_SIG_SQL = ", ".join(
    f"min((um + {i} * step) % {D.MINHASH_P}) AS h{i}" for i in range(D.N_HASHES)
)

#: Full sigs CTE body: FROM shingles -> one digest -> (um, step) ->
#: 16 min-aggregates. Kept as one fragment so every minhash oracle
#: (LSH dedup, cross-corpus decontamination, edit-distance banding,
#: canonicalize) stays bit-identical to the engine.
_SIGS_CTE_SQL = f"""sigs AS (
        SELECT doc_id, {_MINHASH_SIG_SQL}
        FROM (
            SELECT doc_id,
                   u % {D.MINHASH_P} AS um,
                   v % {D.MINHASH_P - 1} + 1 AS step
            FROM (
                SELECT doc_id,
                       {_hex60_sql(1)} AS u,
                       {_hex60_sql(16)} AS v
                FROM (SELECT doc_id, md5(shingle) AS d FROM shingles)
            )
        )
        GROUP BY doc_id
    )"""

_BAND_KEYS_SQL = "\n    UNION ALL\n".join(
    f"    SELECT doc_id, {b} AS band, md5(concat_ws(':', h{4*b}, h{4*b+1}, h{4*b+2}, h{4*b+3})) AS key FROM sigs"
    for b in range(D.N_BANDS)
)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b') AS toks
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 3
                          THEN list_transform(range(0, len(toks) - 2),
                                              i -> array_to_string(toks[i+1:i+3], ' '))
                          ELSE [] END) AS shingle
            FROM toks
        )
    ),
    {_SIGS_CTE_SQL},
    bands AS (
{_BAND_KEYS_SQL}
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT c.id1, c.id2, count(*) AS inter
        FROM cands c
        JOIN shingles s1 ON s1.doc_id = c.id1
        JOIN shingles s2 ON s2.doc_id = c.id2 AND s2.shingle = s1.shingle
        GROUP BY c.id1, c.id2
    )
    SELECT i.id1, i.id2,
           round(i.inter * 1.0 / (z1.sz + z2.sz - i.inter), 6) AS jaccard
    FROM inter i JOIN sizes z1 ON i.id1 = z1.doc_id JOIN sizes z2 ON i.id2 = z2.doc_id
    WHERE i.inter * 1.0 / (z1.sz + z2.sz - i.inter) >= 0.2
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=16) -> LSH bands(4x4) -> candidate pairs -> exact
    Jaccard >= 0.2 verification.

    The scale path for all-pairs dedup: candidates are generated by
    bucket join (linear in corpus + bucket sizes), never O(n^2). md5
    signatures make the candidate set engine-exact, so this
    *approximate* algorithm still has a strict oracle.
    """
    pairs = D.minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.2)
    return pairs.select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITSUM_SQL = ",\n".join(
    "sum(cnt * (((CAST(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1 AS INT) >> {shift}) & 1) * 2 - 1)) AS s{b}".format(
        pos=b // 4 + 1, shift=3 - b % 4, b=b
    )
    for b in range(D.SIMHASH_BITS)
)
_SIMHASH_VALUE_SQL = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(D.SIMHASH_BITS)
)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b')) AS term
        FROM documents
    ),
    counts AS (
        SELECT doc_id, term, count(*) AS cnt, md5(term) AS h
        FROM tok GROUP BY doc_id, term
    ),
    sums AS (SELECT doc_id, {_SIMHASH_BITSUM_SQL} FROM counts GROUP BY doc_id),
    sigs AS (SELECT doc_id, CAST({_SIMHASH_VALUE_SQL} AS BIGINT) AS simhash FROM sums),
    blocks AS (
        SELECT doc_id, simhash, j AS blk,
               (simhash >> ({D.SIMHASH_BLOCK_BITS} * j)) & {D.SIMHASH_BLOCK_MASK} AS val
        FROM sigs, (SELECT unnest([0, 1, 2, 3]) AS j)
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
               a.simhash AS sh1, b.simhash AS sh2
        FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.val = b.val
        WHERE a.doc_id < b.doc_id
    )
    SELECT id1, id2, CAST(bit_count(xor(sh1, sh2)) AS BIGINT) AS hamming
    FROM cands
    WHERE bit_count(xor(sh1, sh2)) <= 3
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash near-dup pairs, hamming <= 3, candidates via
    15-bit block pigeonhole (hamming<=3 over 4 blocks => one block
    equal). md5-derived bit projections keep both engines identical;
    the 15-bit block width keeps random bucket collisions at
    ~n^2/32768 per block (the 16-bit/4-bit variant measured 25x wall
    at 10x rows on a near-duplicate corpus -- SCALE.md)."""
    # The block self-join references the signature relation on both
    # sides and Spark does NOT reuse the aggregate exchange across the
    # branches (measured: no ReusedExchange; the lazy plan runs the
    # 60-sum signature pass twice, 2.3x wall). Persisting is also the
    # at-scale shape: n rows x 16 bytes vs a second full token pass.
    sig = track(D.simhash(_docs(spark, sf_dir)))
    return D.simhash_pairs(sig, max_hamming=3).withColumn(
        "hamming", F.col("hamming").cast("bigint")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact)
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b') AS toks
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 3
                          THEN list_transform(range(0, len(toks) - 2),
                                              i -> array_to_string(toks[i+1:i+3], ' '))
                          ELSE [] END) AS shingle
            FROM toks
        )
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT s1.doc_id AS id1, s2.doc_id AS id2, count(*) AS inter
        FROM shingles s1 JOIN shingles s2
          ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
        GROUP BY 1, 2
    )
    SELECT i.id1, i.id2,
           round(i.inter * 1.0 / (z1.sz + z2.sz - i.inter), 6) AS jaccard
    FROM inter i JOIN sizes z1 ON i.id1 = z1.doc_id JOIN sizes z2 ON i.id2 = z2.doc_id
    WHERE i.inter * 1.0 / (z1.sz + z2.sz - i.inter) >= 0.15
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard >= 0.15 via inverted shingle index
    (only pairs sharing >= 1 shingle are generated; rare-shingle
    corpora make this near-linear).

    Scale guidance: identical-set replicas are representative-collapsed
    (operators/dedup.py ngram_jaccard_pairs), so byte-exact dup density
    no longer inflates the index join, and the exact plan's residual
    wall -- saturated shingle spaces where sum(df^2) grows
    quadratically by construction (SCALE.md) -- is closed by the
    route='auto' cost probe: when the measured index-join volume
    exceeds route_budget (32M rows default), the call auto-routes to
    the LSH-banded candidates + exact-Jaccard-verify sibling
    (identical shingles, identical >= threshold contract, bounded
    recall near the threshold). At the driver's sf0.01/sf0.1 the
    probe stays far under budget, so this query runs (and is
    oracle-verified) on the EXACT path; at sf1 the probe measures
    ~121M rows and the route engages (the routed path's own
    correctness is pinned by dedup_jaccard_routed_fixed, where
    routing provably engages under the driver's oracle gate). A
    LAST_JACCARD_ROUTE == 'exact' guard here was considered and
    REJECTED: the sf1 oracle run deliberately executes the ROUTED
    plan against the exact DuckDB oracle (value-identical there,
    SCALE.md), so pinning the route would forfeit that evidence; if
    corpus density ever pushes an oracle-gated sf over budget, the
    gate's red row plus this paragraph is the diagnosis. At
    0.15 a prefix-filter (ppjoin) index would not help: the required
    prefix is 1-t = 85% of each shingle set."""
    pairs = D.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.15)
    return pairs.select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))


_RJ_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
)
_RJ_CROSS = _RJ_BASE.rsplit(" ", 1)[0] + " mike"  # last word: jaccard 9/11
_RJ_B2 = "nov oscar papa quebec romeo sierra tango uniform"


@register(
    "dedup_jaccard_routed_fixed",
    oracle="""
    SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
           CAST(jaccard AS DOUBLE) AS jaccard
    FROM (VALUES
        (1, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0),
        (4, 5, 1.0),
        (1, 6, 0.818182), (2, 6, 0.818182), (3, 6, 0.818182)
    ) AS t(id1, id2, jaccard)
    """,
)
def dedup_jaccard_routed_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing certificate for ngram_jaccard_pairs' saturation
    router: route='auto' with route_budget=0 forces the cost probe's
    decision to 'minhash' on ANY corpus with a shared shingle, so the
    oracle gate runs the ROUTED plan (banded-LSH candidates + exact
    array-intersect verify) end to end -- probe, decision, signature,
    banding, verify, and rep-expansion -- against a literal oracle.

    The corpus exercises every routed regime: cluster {1,2,3} is
    trigram-set-identical (collapse representatives; pairs emitted at
    the 1.0 self-value by expansion, not by LSH), (1,6) differs in
    its last word (jaccard 9/11 = 0.818182, md5-deterministic band
    collision, expands over the cluster), {4,5} is a second
    set-identical cluster, doc 7 is unrelated, and doc 8 shares two
    trigrams with cluster 1 (jaccard 2/15 = 0.133 < 0.3 -- candidate
    or not, the exact verify excludes it). The expected rows equal
    the exact path's output on this corpus, so the certificate pins
    routed recall 1.0 here, and a loud guard on the PER-CALL
    route_info record (race-free under concurrent query execution --
    ADVICE r8; the thread-local LAST_JACCARD_ROUTE is for tests)
    fails if the probe ever picks 'exact'. sf_dir unused (fixed
    corpus)."""
    docs = spark.createDataFrame(
        [
            (1, _RJ_BASE),
            (2, _RJ_BASE + "?!"),
            (3, _RJ_BASE.replace(" ", "  ")),
            (4, _RJ_B2),
            (5, _RJ_B2 + "..."),
            (6, _RJ_CROSS),
            (7, "victor whiskey xray yankee zulu alpha"),
            (8, "alpha bravo charlie delta unrelated words here now then"),
        ],
        "doc_id long, text string",
    )
    info: dict = {}
    pairs = D.ngram_jaccard_pairs(
        docs, threshold=0.3, route="auto", route_budget=0, route_info=info
    )
    if info.get("route") != "minhash":  # pragma: no cover - loud guard
        raise RuntimeError(
            f"routing certificate ran on route_info={info!r}; "
            "the budget-0 probe must pick 'minhash'"
        )
    return pairs.select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))


#: Near-threshold recall grid (VERDICT r8 item 2): shared-prefix pair
#: construction gives exact analytic Jaccards. A pair shares a prefix
#: of 33 all-distinct words (31 shared trigrams = n); with qx + qy = s
#: total tail words, J = n/(n+s). The GRID s values land J in
#: (t, t+0.05] for t = 0.3 -- the hardest band for the tuned-LSH
#: banding, whose 0.98 recall target is AT J = t; the CONTROLS land
#: just below t and must never be emitted (exact verify).
_RG_PREFIX_WORDS = 33
_RG_GRID = [70, 68, 65, 63, 60, 58]  # J = 0.3069..0.3483
_RG_CONTROLS = [74, 78]  # J = 0.2952, 0.2844


def _recall_grid_rows() -> list[tuple[int, str]]:
    """Deterministic corpus: every word is a unique 5-letter token
    ([a-z]{3,} tokenizer-safe, digit-free), so cross-pair trigram
    collisions are impossible and each pair's Jaccard is exactly
    n/(n+s) by construction."""
    ctr = [0]

    def w() -> str:
        i = ctr[0]
        ctr[0] += 1
        s = ""
        for _ in range(4):
            s += chr(97 + i % 26)
            i //= 26
        return "q" + s

    rows: list[tuple[int, str]] = []
    did = 0
    for s in _RG_GRID + _RG_CONTROLS:
        prefix = [w() for _ in range(_RG_PREFIX_WORDS)]
        qx, qy = s // 2, s - s // 2
        did += 1
        rows.append((did, " ".join(prefix + [w() for _ in range(qx)])))
        did += 1
        rows.append((did, " ".join(prefix + [w() for _ in range(qy)])))
    return rows


@register(
    "dedup_jaccard_recall_grid_fixed",
    oracle="""
    SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
           CAST(jaccard AS DOUBLE) AS jaccard
    FROM (VALUES
        (1, 2, 0.306931), (3, 4, 0.313131), (5, 6, 0.322917),
        (7, 8, 0.329787), (9, 10, 0.340659), (11, 12, 0.348315)
    ) AS t(id1, id2, jaccard)
    """,
)
def dedup_jaccard_recall_grid_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial near-threshold recall certificate for the routed
    Jaccard path (VERDICT r8 item 2): six planted pairs whose TRUE
    Jaccards land at J = 31/(31+s) in (t, t+0.05] for t = 0.3 --
    0.306931, 0.313131, 0.322917, 0.329787, 0.340659, 0.348315 --
    exactly the region where the tuned-LSH banding's 0.98 recall
    target is weakest (per-pair analytic detect probability 0.984 at
    J = 0.3069 under the solved b = 42 bands), plus two sub-threshold
    controls (J = 0.2952, 0.2844) the exact verify must exclude no
    matter what the banding admits. route_budget=0 forces the probe's
    'minhash' decision, so the oracle gate certifies MEASURED routed
    recall 6/6 on the hardest grid (md5 determinism makes the outcome
    fixed) with zero false positives and value-exact Jaccard.
    Reference semantics: duplicate_detector.py:127-167 (threshold
    contract); the grid itself is beyond-reference scale hygiene.
    sf_dir unused (fixed corpus)."""
    docs = spark.createDataFrame(_recall_grid_rows(), "doc_id long, text string")
    info: dict = {}
    pairs = D.ngram_jaccard_pairs(
        docs, threshold=0.3, route="auto", route_budget=0, route_info=info
    )
    if info.get("route") != "minhash":  # pragma: no cover - loud guard
        raise RuntimeError(
            f"recall-grid certificate ran on route_info={info!r}; "
            "the budget-0 probe must pick 'minhash'"
        )
    return pairs.select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# embedding cosine
# ---------------------------------------------------------------------------


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
               AS sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by label (the blocking
    key bounds the pair space; at scale the key is an LSH bucket from
    the ann module). zip_with/aggregate cosine -- JVM-side."""
    emb = _catalog_table(spark, "embeddings", sf_dir)
    pairs = D.embedding_dup_pairs(emb, threshold=0.4, block_col="label")
    return pairs.select("label", "id1", "id2", F.round("sim", 6).alias("sim"))


_SHINGLES_ALL = r"""
    toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\b[a-z]{3,}\b') AS toks
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 3
                          THEN list_transform(range(0, len(toks) - 2),
                                              i -> array_to_string(toks[i+1:i+3], ' '))
                          ELSE [] END) AS shingle
            FROM toks
        )
    )
"""


@register(
    "decontamination_check",
    oracle=f"""
    WITH {_SHINGLES_ALL}
    SELECT e.doc_id AS eval_id,
           t.doc_id AS train_id,
           count(*) AS shared_shingles
    FROM shingles e
    JOIN shingles t ON e.shingle = t.shingle
    WHERE e.doc_id % 10 = 0 AND t.doc_id % 10 <> 0
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
)
def decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: eval docs (held-out split) sharing
    >= 3 distinct word-trigrams with any train doc, via the inverted
    shingle index (the standard benchmark-contamination scan for
    pretraining corpora -- never a cross join; candidates only where
    shingles collide)."""
    sh = track(D.shingles(_docs(spark, sf_dir)))
    ev = sh.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    tr = sh.where(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    return (
        ev.join(tr, "shingle")
        .groupBy("eval_id", "train_id")
        .agg(F.count("*").alias("shared_shingles"))
        .where(F.col("shared_shingles") >= 3)
    )


@register(
    "decontamination_bloom",
    oracle=f"""
    WITH {_SHINGLES_ALL},
    ev AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 10 = 0)
    SELECT t.doc_id AS train_id,
           count(*) AS shared_shingles
    FROM shingles t
    JOIN ev USING (shingle)
    WHERE t.doc_id % 10 <> 0
    GROUP BY 1
    HAVING count(*) >= 3
    """,
)
def decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level contamination scan with a Bloom prefilter: train docs
    sharing >= 3 distinct word-trigrams with the EVAL SHINGLE SET
    (operators/bloom.py; reference has no Bloom path -- at-scale
    extension of duplicate_detector.py's containment idea).

    The eval set's 32 KiB bitset broadcasts to every train partition
    and drops non-candidate shingles map-side BEFORE any shuffle --
    at 100 TB the exact join then runs on candidate volume (true
    contamination + ~1e-3 FP), not the whole train corpus. The exact
    semi-join verify removes Bloom false positives, so the result is
    bit-identical to the no-Bloom plan and the oracle needs no Bloom
    at all. No false negatives by construction (k positions of a
    present shingle are always set; property-pinned in
    tests/test_bloom.py)."""
    from conversation_analysis_tools_spark.operators.bloom import bloom_prefilter

    sh = track(D.shingles(_docs(spark, sf_dir)))
    # no .distinct() on the eval side: bloom bit_or is idempotent and
    # the verify is a LEFT SEMI join (never multiplies probe rows), so
    # deduping eval shingles only added two full shuffles of the eval
    # set -- one per consumer -- for identical results; the broadcast
    # hash relation dedups keys as it builds anyway
    ev_sh = sh.where(F.col("doc_id") % 10 == 0).select("shingle")
    tr = sh.where(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    cand = bloom_prefilter(tr, ev_sh, "shingle", "shingle")
    verified = cand.join(ev_sh, "shingle", "left_semi")
    return (
        verified.groupBy("train_id")
        # shingles are per-doc distinct upstream, so count(*) IS the
        # distinct-shingle overlap with the eval set
        .agg(F.count("*").alias("shared_shingles"))
        .where(F.col("shared_shingles") >= 3)
    )


@register(
    "repetition_scores",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\b[a-z]{3,}\b') AS toks
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 3
                    THEN list_transform(range(0, len(toks) - 2),
                                        i -> array_to_string(toks[i+1:i+3], ' '))
                    ELSE [] END AS shingles
        FROM toks
    )
    SELECT doc_id,
           len(shingles) AS n_shingles,
           len(list_distinct(shingles)) AS n_distinct,
           CASE WHEN len(shingles) > 0
                THEN round(1.0 - len(list_distinct(shingles)) * 1.0 / len(shingles), 6)
                ELSE 0.0 END AS repetition_ratio
    FROM sh
    """,
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (Gopher-rule-style quality signal):
    fraction of duplicate word-trigrams. Pure column expressions --
    no shuffle at all, scales as a map-only stage."""
    from conversation_analysis_tools_spark.functions.text import raw_tokens_expr

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", raw_tokens_expr("text").alias("_toks"))
    arr = F.col("_toks")
    sh = F.when(
        F.size(arr) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - F.lit(3)),
            lambda i: F.concat_ws(" ", F.slice(arr, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    withsh = toks.select("doc_id", sh.alias("shingles"))
    n = F.size("shingles")
    nd = F.size(F.array_distinct("shingles"))
    return withsh.select(
        "doc_id",
        n.cast("bigint").alias("n_shingles"),
        nd.cast("bigint").alias("n_distinct"),
        F.when(n > 0, F.round(1.0 - nd * 1.0 / n, 6)).otherwise(0.0).alias(
            "repetition_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# exact substring spans (span-grain dedup, Lee et al. 2022 shape)
# ---------------------------------------------------------------------------


@register(
    "dedup_substring_spans",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\b[a-z]{3,}\b') AS toks
        FROM documents
    ),
    spans AS (
        SELECT doc_id,
               unnest(CASE WHEN len(toks) >= 8
                      THEN list_transform(range(0, len(toks) - 7),
                                          i -> md5(array_to_string(toks[i+1:i+8], ' ')))
                      ELSE [] END) AS span_hash
        FROM toks
    ),
    hash_ndocs AS (
        SELECT span_hash, count(*) AS n_docs
        FROM (SELECT DISTINCT doc_id, span_hash FROM spans)
        GROUP BY span_hash
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id
    ),
    dup AS (
        SELECT s.doc_id, count(*) AS n_dup
        FROM spans s JOIN hash_ndocs h USING (span_hash)
        WHERE h.n_docs >= 2
        GROUP BY s.doc_id
    )
    SELECT p.doc_id,
           CAST(p.n_spans AS BIGINT) AS n_spans,
           CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
           round(coalesce(d.n_dup, 0) * 1.0 / p.n_spans, 6) AS dup_fraction
    FROM per_doc p LEFT JOIN dup d USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-grain exact dedup: per doc, the count and fraction of its
    8-token windows that appear verbatim in >=1 other document.
    Catches copy-paste contamination that whole-doc hashing misses and
    doc-level similarity underweights. See
    operators/dedup.py:substring_span_stats for the scale plan."""
    return D.substring_span_stats(_docs(spark, sf_dir), width=8)


#: Planted-replica recall floors per dedup method. Conservative vs the
#: measured values (minhash 0.72 / simhash 0.64 / jaccard 0.99 at 5%
#: token dropout) so the certificate is robust to regenerated testdata
#: while still failing on a real recall regression. The minhash number
#: is the 4x4 banding math: P(candidate) = 1-(1-J^4)^4 ~ 0.78 at
#: J~0.75, then the exact verify keeps J >= 0.5.
DEDUP_RECALL_FLOORS = {
    "dedup_minhash_lsh": 0.55,
    "dedup_simhash": 0.45,
    "dedup_ngram_jaccard": 0.85,
}

#: Replica id offset: base ids stay far below it at every sf.
_REP_OFFSET = 10_000_000


@register(
    "dedup_recall_eval",
    oracle="""
    SELECT * FROM (VALUES
        ('dedup_minhash_lsh',   55, TRUE),
        ('dedup_ngram_jaccard', 85, TRUE),
        ('dedup_simhash',       45, TRUE)
    ) AS t(method, floor_x100, recall_ok)
    """,
)
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETECTION certificate for the near-dup family: does each method
    actually CATCH near-duplicates (the oracle-match rows only prove
    the formulas agree cross-engine)?

    Plants ground truth in-query: every document gets two replicas
    with ~5% of whitespace tokens dropped deterministically
    (md5(doc_id:rep:pos) keep-test -- no RNG, identical every run),
    ids offset so a truth pair is exactly 'same id mod offset'. Each
    method runs over the 3x corpus; recall = truth pairs found /
    (3 * n_docs) (base-r1, base-r2, r1-r2). One boolean row per
    method asserts recall >= its floor; a banding/threshold
    regression (e.g. a broken block width or a wrong band key) drops
    recall to ~0 and turns the row red. Beyond-reference: the
    reference never measures its duplicate detector's recall."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")

    def _keep(rep: int):
        def keep(w, i):
            h = F.md5(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.lit(str(rep)),
                    i.cast("string"),
                ).cast("binary")
            )
            return F.substring(h, 1, 2) >= "0d"

        return keep

    parts = [docs]
    for rep in (1, 2):
        kept = F.filter(F.split("text", " "), _keep(rep))
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(rep * _REP_OFFSET)).alias("doc_id"),
                F.concat_ws(" ", kept).alias("text"),
            )
        )
    # persist: three methods x (signature + verify) evaluations would
    # otherwise re-run the interpreted replica-generation filter ~6x
    corpus = track(parts[0].unionByName(parts[1]).unionByName(parts[2]))
    n_truth = docs.count() * 3

    def _found(pairs: DataFrame) -> int:
        return pairs.where(
            (F.col("id1") % _REP_OFFSET) == (F.col("id2") % _REP_OFFSET)
        ).count()

    found = {
        "dedup_minhash_lsh": _found(D.minhash_dedup_pairs(corpus, threshold=0.5)),
        "dedup_simhash": _found(D.simhash_pairs(D.simhash(corpus), max_hamming=3)),
        "dedup_ngram_jaccard": _found(D.ngram_jaccard_pairs(corpus, threshold=0.4)),
    }
    rows = [
        (m, int(DEDUP_RECALL_FLOORS[m] * 100), found[m] / n_truth >= DEDUP_RECALL_FLOORS[m])
        for m in sorted(found)
    ]
    return spark.createDataFrame(rows, "method string, floor_x100 int, recall_ok boolean")


@register(
    "dedup_span_removal",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\b[a-z]{3,}\b') AS toks
        FROM documents
    ),
    spans AS (
        SELECT doc_id, s,
               md5(array_to_string(toks[s+1:s+8], ' ')) AS span_hash
        FROM toks, UNNEST(range(0, len(toks) - 7)) AS u(s)
    ),
    cross_doc AS (
        SELECT span_hash
        FROM (SELECT DISTINCT doc_id, span_hash FROM spans)
        GROUP BY span_hash HAVING count(*) >= 2
    ),
    dup_starts AS (
        SELECT doc_id, list_sort(list(s)) AS starts
        FROM spans WHERE span_hash IN (SELECT span_hash FROM cross_doc)
        GROUP BY doc_id
    ),
    kept AS (
        SELECT t.doc_id, t.toks,
               list_filter(
                   range(0, len(t.toks)),
                   p -> len(list_filter(coalesce(d.starts, CAST([] AS BIGINT[])),
                                        s -> s <= p AND p < s + 8)) = 0
               ) AS kept_idx
        FROM toks t LEFT JOIN dup_starts d USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(kept_idx) AS BIGINT) AS n_removed,
           -- DuckDB's array_to_string([]) is NULL; Spark concat_ws is ''
           coalesce(array_to_string(list_transform(kept_idx, p -> toks[p+1]), ' '), '')
               AS cleaned_text
    FROM kept
    """,
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transformation half of exact substring dedup (Lee et al.
    2022): re-emit every document with cross-document duplicated
    8-token spans REMOVED from its token stream
    (operators/dedup.remove_duplicate_spans). One span_hash shuffle
    marks cross-doc spans; coverage test and rebuild are row-local
    higher-order functions. Strict oracle: span identity is an
    internal grouping key (xxhash64 of the window's tokens on the
    Spark side, md5 strings on the DuckDB side -- identical
    partitions), and the coverage rule and token rebuild are
    engine-portable arithmetic."""
    return D.remove_duplicate_spans(_docs(spark, sf_dir), width=8)


# ---------------------------------------------------------------------------
# near-dup canonicalization (cluster -> quality-argmax representative)
# ---------------------------------------------------------------------------

_CANON_ORACLE = f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b') AS toks
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 3
                          THEN list_transform(range(0, len(toks) - 2),
                                              i -> array_to_string(toks[i+1:i+3], ' '))
                          ELSE [] END) AS shingle
            FROM toks
        )
    ),
    {_SIGS_CTE_SQL},
    bands AS (
{_BAND_KEYS_SQL}
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT c.id1, c.id2, count(*) AS inter
        FROM cands c
        JOIN shingles s1 ON s1.doc_id = c.id1
        JOIN shingles s2 ON s2.doc_id = c.id2 AND s2.shingle = s1.shingle
        GROUP BY c.id1, c.id2
    ),
    pairs AS (
        SELECT i.id1, i.id2
        FROM inter i JOIN sizes z1 ON i.id1 = z1.doc_id
                     JOIN sizes z2 ON i.id2 = z2.doc_id
        WHERE i.inter * 1.0 / (z1.sz + z2.sz - i.inter) >= 0.2
    ),
    edges AS (
        SELECT id1 AS a, id2 AS b FROM pairs
        UNION SELECT id2, id1 FROM pairs
    ),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
    ),
    ranked AS (
        SELECT c.component, c.id AS doc_id, d.n_chars,
               row_number() OVER (PARTITION BY c.component
                                  ORDER BY d.n_chars DESC, c.id) AS rnk
        FROM comp c JOIN documents d ON d.doc_id = c.id
    )
    SELECT component, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           rnk = 1 AS is_canonical
    FROM ranked
"""


@register("near_dup_canonicalize", oracle=_CANON_ORACLE)
def near_dup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation end-game: MinHash-LSH near-dup clusters -> per-cluster
    CANONICAL selection by quality argmax (longest doc wins, doc_id
    tiebreak) instead of the arbitrary min-id representative -- what a
    training-data pipeline actually keeps. One row per clustered doc
    with its cluster id and canonical flag; singletons (never
    candidate-paired) are not cluster members and are kept upstream.

    Scale: reuses the bucketed MinHash candidate plan (linear), and
    clustering runs at REPRESENTATIVE grain (minhash_cluster_members):
    on dup-dense corpora the m^2 expanded member-pair set is never
    materialized -- CC sees collapsed edges and members inherit their
    group's component through one fingerprint join at output grain.
    The final window partitions by cluster id -- cluster sizes bound
    the sort, never the corpus.
    Strict oracle: md5 signatures + recursive-CTE reachability.
    """
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    comp = D.minhash_cluster_members(docs, threshold=0.2)
    members = comp.join(
        docs.select(F.col("doc_id").alias("id"), F.col("n_chars").cast("bigint").alias("n_chars")),
        "id",
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("id"))
    return members.select(
        "component",
        F.col("id").alias("doc_id"),
        "n_chars",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


#: Fixed 5-node undirected graph (two triangles sharing node 3 plus a
#: pendant chain) and its pinned PageRank (damping .85, tol 1e-6,
#: <=20 iters) as 1e-6-scaled ints -- computed by the distributed
#: operator, cross-pinned against the pure-Python power iteration in
#: tests/test_pagerank.py.
PAGERANK_FIXED_EDGES: list[tuple[int, int]] = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
PAGERANK_FIXED_EXPECTED: list[tuple[int, int]] = [
    (1, 191813),
    (2, 191813),
    (3, 283440),
    (4, 212554),
    (5, 120381),
]


@register(
    "pagerank_fixed",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"({i}, {r})" for i, r in PAGERANK_FIXED_EXPECTED)
    + ") AS t(id, rank_x1e6)",
)
def pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank driver certificate: the distributed iterative-join
    operator (operators/pagerank.py) on a fixed graph, scores pinned
    as 1e-6-scaled ints by a literal oracle (the textrank_scores
    playbook). Certifies the per-iteration shuffle + dangling-mass
    redistribution formula the testdata-grain dup_graph_pagerank can
    only rows-check. sf_dir unused (fixed graph)."""
    from conversation_analysis_tools_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(PAGERANK_FIXED_EDGES, "src long, dst long")
    ranks = pagerank(edges, directed=False)
    return ranks.select(
        F.col("id"),
        F.round(F.col("rank") * 1_000_000).cast("bigint").alias("rank_x1e6"),
    )


@register("dup_graph_pagerank", oracle=None)
def dup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Influence ranking over the near-dup similarity graph:
    distributed PageRank (operators/pagerank.py) on the symmetrized
    MinHash pair edges -- the doc that many near-dups point at is the
    cluster's natural representative at corpus scale, where the
    per-group pandas TextRank cannot hold the graph. Rows-only (float
    power iteration); the formula is pinned against a pure-Python
    reference in tests/test_pagerank.py. Top-50 by rank,
    TakeOrderedAndProject cut.
    """
    from conversation_analysis_tools_spark.operators.pagerank import pagerank

    docs = _docs(spark, sf_dir)
    pairs = D.minhash_dedup_pairs(docs, threshold=0.2).select("id1", "id2")
    ranks = pagerank(pairs, src="id1", dst="id2", directed=False)
    return ranks.select(
        F.col("id").alias("doc_id"), F.round("rank", 6).alias("rank")
    ).orderBy(F.desc("rank"), F.asc("doc_id")).limit(50)


@register(
    "semdedup_fixed",
    oracle="""
    SELECT vec_id, CAST(centroid_dist AS DOUBLE) AS centroid_dist,
           CAST(component AS BIGINT) AS component, keep
    FROM (VALUES
        (0, 3.0, 0, FALSE), (1, 1.0, 0, FALSE), (2, 4.0, 0, TRUE),
        (3, 3.0, 3, FALSE), (4, 1.0, 3, FALSE), (5, 4.0, 3, TRUE)
    ) AS t(vec_id, centroid_dist, component, keep)
    """,
)
def semdedup_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup driver certificate: two well-separated collinear
    clusters with integer centroid means make every stage exact --
    k-means recovers the blobs for any init, within-cluster cosines
    are exactly 1.0 (collinear), distances to centroid are integers
    (3/1/4), so the keep-farthest rule picks ids 2 and 5. The literal
    oracle certifies assignment, within-cluster pairing, connected
    components, and the keep rule end-to-end; centroid_id is omitted
    (k-means cluster numbering is arbitrary). sf_dir unused (fixed
    vectors)."""
    from conversation_analysis_tools_spark.operators import ann as A

    pts = [
        (0, [10.0, 0.0]), (1, [12.0, 0.0]), (2, [17.0, 0.0]),
        (3, [0.0, 20.0]), (4, [0.0, 22.0]), (5, [0.0, 27.0]),
    ]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cents = A.kmeans_centroids(emb, n_centroids=2)
    # explicit path: dense_path=None would spend an eager count at
    # plan-build time just to learn what the caller already knows
    out = D.semdedup_prune(emb, cents, threshold=0.4, dense_path=False)
    return out.select(
        F.col("vec_id").cast("int").alias("vec_id"),
        "centroid_dist",
        "component",
        "keep",
    )


@register(
    "semdedup_dense_fixed",
    oracle="""
    WITH m AS (
        SELECT i AS k, CAST(i + 100 * c AS BIGINT) AS vec_id, c
        FROM generate_series(0, 59) t(i), (VALUES (0), (1)) v(c)
    )
    SELECT vec_id,
           CAST(c AS INTEGER) AS centroid_id,
           CAST(k AS DOUBLE) AS centroid_dist,
           CAST(100 * c AS BIGINT) AS component,
           (k = 59) AS keep
    FROM m
    """,
)
def semdedup_dense_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup DENSE-PATH driver certificate (round 7): the
    vectorized plan -- Arrow-batch numpy argmin assignment +
    per-cluster grid-blocked BLAS pair scan -- forced via
    ``dense_path=True`` on a corpus where every float is exact, so a
    COMPUTED oracle re-derives all 120 rows from the construction:

    - cluster c=0: vectors [10+k, 0], k = 0..59, ids k; cluster c=1:
      vectors [0, 20+k], ids 100+k. Centroids are passed EXPLICITLY
      ([10,0], [0,20]), so centroid numbering is deterministic
      (unlike the k-means certificate semdedup_fixed) and
      centroid_id is part of the contract.
    - assignment is exact in the BLAS expansion: ||v||^2, ||c||^2
      and the cross term are small integers in float64, so
      d^2(own) = k^2 beats d^2(other) > 400 exactly; centroid_dist
      = sqrt(k^2) = k exactly (correctly-rounded IEEE sqrt of an
      exact square).
    - within a cluster every cosine is exactly 1.0 (collinear
      integer-scaled unit vectors; x/||x|| folds to [1.0, 0.0] or
      [0.0, 1.0] exactly), so each cluster is one component labeled
      by its min id (0 / 100) and keep lands on the farthest member
      k = 59, no ties.

    Certifies assignment, grid pairing, connected components, and
    the keep rule through the SAME code path sf1-scale corpora take
    (the expression-path certificate is semdedup_fixed). sf_dir
    unused (fixed vectors)."""
    import numpy as np

    pts = [(k + 100 * c,
            [10.0 + k, 0.0] if c == 0 else [0.0, 20.0 + k])
           for c in (0, 1) for k in range(60)]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cents = np.array([[10.0, 0.0], [0.0, 20.0]])
    out = D.semdedup_prune(emb, cents, threshold=0.4, dense_path=True)
    return out.select(
        "vec_id", "centroid_id", "centroid_dist", "component", "keep"
    )


@register("semdedup_prune", oracle=None)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means (fixed seed) over the
    embedding table, cosine >= 0.4 near-dup pairs WITHIN each cluster
    only, connected components, keep the component member farthest
    from its centroid. The embedding-space mirror of the reference's
    duplicate pruning (pipeline/duplicate_detector.py) at corpus
    scale: pair space bounded per cluster, shuffle key is
    centroid_id.

    The cluster count SCALES with the corpus -- C = max(16,
    ceil(n/128)) -- so expected cluster size (and with it the
    within-cluster pair volume per row) stays bounded: with C fixed
    at 16 the pair space is quadratic in corpus size (measured
    2.1 s -> 94.9 s on the 10x sf0.1 -> sf1 decade, a 45x wall);
    C ~ n/128 makes total pairs ~ n*128/2, linear. This is the
    paper's own regime (SemDeDup uses tens of thousands of clusters
    at web scale). The quantizer FIT is sample-bounded for the same
    reason (round 9): full-corpus k-means at C ~ n/128 costs ~n^2 --
    the quadratic piece the disk-memoized fit hid from re-run
    benchmarks; training on ~20 deterministic-md5-sampled vectors
    per centroid keeps the fit ~linear and the buckets as useful for
    dedup as the full fit (the paper also trains on a subset). At the driver sfs (n <= 2000) C stays 16, so the
    checked plan is unchanged. Rows-only (k-means float iteration is
    engine-specific); semantics pinned in
    tests/test_similarity_dedup.py with hand-built embeddings.
    Returns the per-vector keep/drop decision table.
    """
    import math

    from conversation_analysis_tools_spark.operators import ann as A

    emb = _catalog_table(spark, "embeddings", sf_dir)
    n_vec = emb.count()  # one column-pruned count scan, driver-side int
    n_cent = max(16, math.ceil(n_vec / 128))
    # Fit on a bounded deterministic sample (round 9, sf10 probe):
    # with C ~ n/128 a FULL-corpus k-means fit costs n*C*dim*iters ~
    # n^2 -- the quadratic piece fitcache memoization hid on re-runs.
    # The paper's regime trains the quantizer on a subset; ~20
    # vectors per centroid keeps cluster assignment useful for dedup
    # bucketing while the fit stays ~linear in n. md5-hash selection
    # is deterministic per vec_id (the random_sample recipe). At
    # n <= max(2048, 20*C) every vector is sampled, so driver-sf fits
    # are byte-identical to the unsampled ones.
    fit_n = max(2048, 20 * n_cent)
    if n_vec > fit_n:
        step = math.ceil(n_vec / fit_n)
        fit_emb = emb.where(
            F.pmod(
                F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
                .cast("bigint"),
                F.lit(step),
            )
            == 0
        )
    else:
        fit_emb = emb
    cents = cached_fit(
        "semdedup_centroids",
        (n_cent, min(n_vec, fit_n)),
        sf_dir,
        lambda: A.kmeans_centroids(fit_emb, n_centroids=n_cent),
    )
    # same 2048-row knee as the C rule: driver sfs keep the
    # pure-expression plan, scaled corpora take the BLAS path
    out = D.semdedup_prune(emb, cents, threshold=0.4, dense_path=n_vec > 2048)
    return out.orderBy("vec_id")


@register(
    "dedup_edit_distance",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b') AS toks
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 3
                          THEN list_transform(range(0, len(toks) - 2),
                                              i -> array_to_string(toks[i+1:i+3], ' '))
                          ELSE [] END) AS shingle
            FROM toks
        )
    ),
    {_SIGS_CTE_SQL},
    bands AS (
{_BAND_KEYS_SQL}
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id
    ),
    texts AS (SELECT doc_id, substr(text, 1, 1000) AS t FROM documents)
    SELECT c.id1, c.id2,
           round(1 - levenshtein(t1.t, t2.t) * 1.0 / greatest(length(t1.t), length(t2.t)), 6) AS edit_sim
    FROM cands c
    JOIN texts t1 ON t1.doc_id = c.id1
    JOIN texts t2 ON t2.doc_id = c.id2
    WHERE 1 - levenshtein(t1.t, t2.t) * 1.0 / greatest(length(t1.t), length(t2.t)) >= 0.8
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-edit near-dup verify: MinHash-LSH candidates checked
    with exact Levenshtein similarity (1 - dist/max_len >= 0.8).
    Complements Jaccard (token-set) verification with an order-
    sensitive character-grain measure; both engines implement
    Levenshtein natively, so the oracle is strict. Texts are capped at
    1000 chars before comparison (bounded O(L^2) per-pair cost at
    scale) -- mirrored in the oracle's substr.
    """
    pairs = D.edit_distance_pairs(_docs(spark, sf_dir), threshold=0.8, max_chars=1000)
    return pairs.select("id1", "id2", F.round("edit_sim", 6).alias("edit_sim"))


@register(
    "decontamination_minhash",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '\\b[a-z]{{3,}}\\b') AS toks
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 3
                          THEN list_transform(range(0, len(toks) - 2),
                                              i -> array_to_string(toks[i+1:i+3], ' '))
                          ELSE [] END) AS shingle
            FROM toks
        )
    ),
    {_SIGS_CTE_SQL},
    bands AS (
{_BAND_KEYS_SQL}
    ),
    cands AS (
        SELECT DISTINCT e.doc_id AS eval_id, t.doc_id AS train_id
        FROM bands e JOIN bands t ON e.band = t.band AND e.key = t.key
        WHERE e.doc_id % 10 = 0 AND t.doc_id % 10 <> 0
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT c.eval_id, c.train_id, count(*) AS inter
        FROM cands c
        JOIN shingles s1 ON s1.doc_id = c.eval_id
        JOIN shingles s2 ON s2.doc_id = c.train_id AND s2.shingle = s1.shingle
        GROUP BY 1, 2
    )
    SELECT i.eval_id, i.train_id,
           round(i.inter * 1.0 / (z1.sz + z2.sz - i.inter), 6) AS jaccard
    FROM inter i
    JOIN sizes z1 ON i.eval_id = z1.doc_id
    JOIN sizes z2 ON i.train_id = z2.doc_id
    WHERE i.inter * 1.0 / (z1.sz + z2.sz - i.inter) >= 0.2
    """,
)
def decontamination_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus contamination at MinHash grain: the held-out
    split (doc_id % 10 = 0, same split as decontamination_check) LSH-
    banded against the train split, candidates strictly across sides,
    exact Jaccard >= 0.2 verify. The eval band table and shingle
    arrays are broadcast (benchmarks are tiny next to a 100 TB train
    corpus), so the train side never shuffles beyond its signature
    groupBy. md5-portable hashing keeps even the approximate candidate
    set engine-exact, hence the strict oracle.
    """
    docs = _docs(spark, sf_dir)
    pairs = D.cross_corpus_minhash_pairs(
        docs.where(F.col("doc_id") % 10 == 0),
        docs.where(F.col("doc_id") % 10 != 0),
        threshold=0.2,
    )
    return pairs.select("eval_id", "train_id", F.round("jaccard", 6).alias("jaccard"))


@register(
    "boilerplate_line_removal",
    oracle=r"""
    WITH pages AS (
        SELECT doc_id,
               'doc ' || CAST(doc_id AS VARCHAR) ||
                   ' opening line with unique content.' || chr(10) ||
               'subscribe to our newsletter for daily updates.' || chr(10) ||
               'copyright footer for category ' ||
                   CAST(doc_id % 100 AS VARCHAR) || '.' || chr(10) ||
               'shared disclaimer for bucket ' ||
                   CAST(doc_id % 200 AS VARCHAR) || '.' || chr(10) ||
               substr(text, 1, 60) || ' body continues.' AS page
        FROM documents
    ),
    lines AS (
        SELECT doc_id, u.pos, u.line,
               md5(lower(trim(u.line))) AS line_hash
        FROM pages,
             LATERAL (SELECT generate_subscripts(string_split(page, chr(10)), 1) - 1 AS pos,
                             unnest(string_split(page, chr(10))) AS line) u
    ),
    boilerplate AS (
        SELECT line_hash
        FROM (SELECT DISTINCT doc_id, line_hash FROM lines)
        GROUP BY line_hash HAVING count(*) >= 5
    ),
    kept AS (
        SELECT l.* FROM lines l ANTI JOIN boilerplate b USING (line_hash)
    ),
    rebuilt AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS cleaned
        FROM kept GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(len(string_split(p.page, chr(10))) AS BIGINT) AS n_lines,
           coalesce(r.n_kept, 0) AS n_kept,
           coalesce(r.cleaned, '') AS cleaned
    FROM pages p LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate line removal (Wenzek et al. 2019
    CCNet): drop every line whose normalized hash appears in >= 5
    distinct documents. The corpus-frequency complement of the per-doc
    rule gate ``c4_line_clean`` and the pairwise token-span cut
    ``dedup_span_removal``.

    The synthetic corpus is single-line, so (c4_line_clean precedent)
    the query plants a deterministic 5-line page per doc from its own
    columns -- a unique opener, a universal newsletter line (df =
    n_docs, removed everywhere), a mod-100 footer (df = 5 at sf0.01:
    exactly the >= threshold boundary), a mod-200 disclaimer (df = 2-3:
    kept), and a near-unique body line -- then runs the REAL operator
    (operators/dedup.py:remove_boilerplate_lines) over it.
    """
    docs = _docs(spark, sf_dir)
    sid = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit("doc "), sid, F.lit(" opening line with unique content.\n"),
        F.lit("subscribe to our newsletter for daily updates.\n"),
        F.lit("copyright footer for category "),
        (F.col("doc_id") % 100).cast("string"), F.lit(".\n"),
        F.lit("shared disclaimer for bucket "),
        (F.col("doc_id") % 200).cast("string"), F.lit(".\n"),
        F.substring("text", 1, 60), F.lit(" body continues."),
    )
    pages = docs.select("doc_id", page.alias("page"))
    return D.remove_boilerplate_lines(pages, max_df=5)


# ---------------------------------------------------------------------------
# engaged-collapse driver certificate (fixed dup-dense corpora)
# ---------------------------------------------------------------------------
#
# The adaptive representative-collapse plan (operators/dedup.py
# _maybe_collapse -> _expand_rep_pairs) never engages at sf0.01's
# dup-light density, so this query pins collapse="always" on FIXED
# in-query corpora with planted identical-content clusters -- the
# driver's oracle gate then proves the ENGAGED plan, not just the
# direct one (local parity tests already pin always == never). One
# query, three families (round-10 registry consolidation: the former
# dedup_collapse_{jaccard,minhash,editdist}_fixed rows survive
# verbatim as the family-tagged VALUES below -- every assertion of
# the three retired certificates is preserved).
# Corpus design notes:
#  - "token-invisible drift": docs 2/3 differ from doc 1 only in
#    punctuation/case/whitespace, which the [a-z]{3,} tokenizer
#    ignores -- byte-distinct, shingle-SET-identical, the exact
#    regime the set-grain fingerprint collapse exists for.
#  - the oracle is a literal VALUES table: the corpora are fixed,
#    so the expected pairs are hand-derivable (within-group pairs
#    score 1.0 by identity; cross-group pairs inherit the verified
#    rep-pair score; edit distances are counted appends/substitutions).
# Reference parity: duplicate_detector.py:144-167 (all-pairs
# similarity semantics) is what the expansion must preserve.

_CJ_BASE = "alpha bravo charlie delta echo"
_CJ_B2 = "zulu yankee xray whiskey victor"
_CJ_CROSS = "bravo charlie delta echo foxtrot"  # jaccard 2/4 with base

_CM_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
)
_CM_CROSS = _CM_BASE.rsplit(" ", 1)[0] + " mike"  # last word: jaccard 9/11


@register(
    "dedup_collapse_fixed",
    oracle="""
    SELECT family, CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
           CAST(score AS DOUBLE) AS score
    FROM (VALUES
        ('jaccard', 1, 2, 1.0), ('jaccard', 1, 3, 1.0),
        ('jaccard', 2, 3, 1.0), ('jaccard', 4, 5, 1.0),
        ('jaccard', 1, 6, 0.5), ('jaccard', 2, 6, 0.5),
        ('jaccard', 3, 6, 0.5),
        ('minhash', 1, 2, 1.0), ('minhash', 1, 3, 1.0),
        ('minhash', 2, 3, 1.0), ('minhash', 4, 5, 1.0),
        ('minhash', 1, 6, 0.818182), ('minhash', 2, 6, 0.818182),
        ('minhash', 3, 6, 0.818182),
        ('editdist', 1, 2, 0.986301), ('editdist', 1, 4, 0.986111),
        ('editdist', 1, 5, 1.0), ('editdist', 1, 6, 0.986301),
        ('editdist', 2, 3, 0.986486), ('editdist', 2, 5, 0.986301),
        ('editdist', 2, 6, 1.0), ('editdist', 3, 6, 0.986486),
        ('editdist', 4, 5, 0.986111), ('editdist', 5, 6, 0.986301)
    ) AS t(family, id1, id2, score)
    """,
)
def dedup_collapse_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engaged-collapse certificate for all three pair-grain dedup
    families in one family-tagged union (sf_dir unused; fixed corpora):

    * ``jaccard`` -- set-grain FULL collapse (ngram_jaccard_pairs,
      collapse='always'): cluster {1,2,3} is byte-distinct but
      trigram-set-identical (token-invisible punctuation/case drift),
      cluster {4,5} likewise; doc 6 overlaps cluster 1's set at
      exactly jaccard 2/4 = 0.5. The inverted index runs on TWO
      representatives + two singletons; within-group pairs come back
      at the 1.0 self-value and the verified cross-group rep pair
      (1,6) expands over cluster members to (1,6),(2,6),(3,6) -- both
      _expand_rep_pairs paths under the driver's oracle gate.
    * ``minhash`` -- MinHash-grain collapse (minhash_dedup_pairs,
      collapse='always'): the banded signature stage runs on
      collapsed representatives only; identical shingle sets share
      every band, so within-cluster pairs are expansion output (1.0)
      and the cross-group candidate (1,6) -- a 12-word doc differing
      in its last word, trigram jaccard 9/11 = 0.818182,
      md5-deterministic band collision -- verifies once at rep grain
      and expands to all three cluster-1 members.
    * ``editdist`` -- candidate-grain collapse (edit_distance_pairs,
      collapse='always'), the two-layer expansion: docs 5/6 are
      byte-IDENTICAL to 1/2 (text-grain verify collapse, sims
      inherited: (1,5)=(2,6)=1.0); docs 2/3 are base + '.'/'..' --
      byte-distinct but trigram-set-identical to 1, so the CANDIDATE
      stage collapses {1,2,3} to one representative and re-expands
      pairs BEFORE the banded Levenshtein (_expand_rep_pairs with
      value_col=None). The t=0.98 threshold proves the DP runs per
      MEMBER pair, not at rep grain: rep pair (1,4) qualifies (1
      substitution over len 72, 0.986111) while its sibling member
      pair (2,4) does NOT (distance 2 over len 73, 0.972603 < 0.98)
      -- a rep-inherited score would wrongly emit it. All sims are
      exact count/length fractions: 1-1/73=0.986301, 1-1/74=0.986486,
      1-1/72=0.986111.
    """
    jac_docs = spark.createDataFrame(
        [
            (1, _CJ_BASE),
            (2, _CJ_BASE + "!!"),
            (3, "Alpha  bravo CHARLIE delta echo."),
            (4, _CJ_B2),
            (5, _CJ_B2.upper()),
            (6, _CJ_CROSS),
            (7, "golf hotel india juliet kilo"),
        ],
        "doc_id long, text string",
    )
    mh_docs = spark.createDataFrame(
        [
            (1, _CM_BASE),
            (2, _CM_BASE + "?!"),
            (3, _CM_BASE.replace(" ", "  ")),
            (4, _CJ_B2),
            (5, _CJ_B2 + "..."),
            (6, _CM_CROSS),
            (7, "nov oscar papa quebec romeo sierra"),
        ],
        "doc_id long, text string",
    )
    ed_docs = spark.createDataFrame(
        [
            (1, _CM_BASE),
            (2, _CM_BASE + "."),
            (3, _CM_BASE + ".."),
            (4, _CM_BASE.rsplit(" ", 1)[0] + " limb"),
            (5, _CM_BASE),
            (6, _CM_BASE + "."),
            (7, "nov oscar papa quebec romeo sierra tango"),
        ],
        "doc_id long, text string",
    )

    def tag(pairs: DataFrame, family: str, score_col: str) -> DataFrame:
        return pairs.select(
            F.lit(family).alias("family"),
            "id1",
            "id2",
            F.round(score_col, 6).alias("score"),
        )

    jac = tag(
        D.ngram_jaccard_pairs(jac_docs, threshold=0.4, collapse="always"),
        "jaccard", "jaccard",
    )
    mh = tag(
        D.minhash_dedup_pairs(mh_docs, threshold=0.4, collapse="always"),
        "minhash", "jaccard",
    )
    ed = tag(
        D.edit_distance_pairs(ed_docs, threshold=0.98, collapse="always"),
        "editdist", "edit_sim",
    )
    return jac.unionByName(mh).unionByName(ed)
