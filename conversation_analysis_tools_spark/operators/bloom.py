"""Bloom-filter prefilter as DataFrame algebra (no UDF, no driver set).

The at-scale decontamination problem: the train side is ~100 TB of
shingles, the eval/benchmark side is tiny (thousands of docs). The
inverted-index join (queries/dedup.decontamination_check) shuffles
EVERY train shingle on its join key; at petabyte scan widths that
shuffle dominates. A Bloom filter of the eval shingle set turns the
train side into a map-only scan: only shingles whose k bit positions
are all set survive to the (now candidate-sized) exact join. False
positives are removed by the exact verify, so the final result is
bit-identical to the no-Bloom plan -- which is what makes the query
strictly oracle-able.

Spark's own ``bloom_filter_agg`` / ``might_contain`` expressions are
internal (not SQL-registered in 4.1) and ``DataFrameStatFunctions.
bloomFilter`` returns a driver-side object only usable from a Python
UDF -- the slow path. So the filter here is data, not code:

* build: k bit positions per element via Kirsch-Mitzenmacher double
  hashing (pos_i = h1 + i*h2 mod m, h1/h2 from ``xxhash64`` -- JVM
  murmur-class hashing, no Python), ``bit_or``-aggregated into
  m/64 BIGINT words, assembled into ONE row holding array<bigint>.
* probe: broadcast the one-row bitset, test all k positions with
  shift/mask inside ``forall`` -- whole-stage codegen, zero shuffle
  on the probed relation.

Sizing: m_bits=2**18 words=4096 (32 KiB) holds ~25k eval shingles at
k=5 under 1e-3 FP; the broadcast is constant-size regardless of train
corpus size. No false negatives by construction (pinned by
tests/test_bloom.py property test), so the verify join can only
remove rows, never miss one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default filter geometry: 2^18 bits = 4096 longs = 32 KiB broadcast.
DEFAULT_M_BITS = 1 << 18
DEFAULT_K = 5


def _positions(col: Column, m_bits: int, k: int) -> Column:
    """Array of the k Bloom bit positions of ``col`` (double hashing:
    two independent xxhash64 draws combined as h1 + i*h2 mod m)."""
    # reduce both draws mod m BEFORE combining: i*h2 on the raw 64-bit
    # hash overflows BIGINT (ANSI mode raises); mod-m residues compose
    # to at most k * m_bits, far inside the type
    h1 = F.pmod(F.xxhash64(col), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(0x9E3779B9)), F.lit(m_bits))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]
    )


def build_bloom(
    df: DataFrame,
    col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """ONE-row DataFrame ``(bits: array<bigint>)`` -- the Bloom bitset
    of every value of ``df[col]``, built distributively.

    explode the k positions -> word index + in-word bit -> per-word
    ``bit_or`` (map-side combined, shuffles at most m/64 rows) ->
    assemble the dense word array with a sequence/map lookup. The only
    single-row state is the final 32 KiB array.
    """
    n_words = m_bits // 64
    pos = df.select(
        F.explode(_positions(F.col(col), m_bits, k)).alias("pos")
    )
    # shiftleft by a Column is SQL-only (the PySpark wrapper takes a
    # Python int), hence the expr form
    words = pos.groupBy((F.col("pos") / 64).cast("int").alias("w")).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))"
        ).alias("word")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("wmap")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("wmap"), i), F.lit(0).cast("bigint")),
        ).alias("bits")
    )


def might_contain(
    bits: Column, col: Column, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> Column:
    """Boolean Column: all k bit positions of ``col`` set in ``bits``
    (the broadcast bitset array). Pure shift/mask inside codegen."""
    return F.forall(
        _positions(col, m_bits, k),
        lambda p: F.bit_get(F.element_at(bits, (p / 64).cast("int") + 1), p % 64)
        == 1,
    )


def bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    probe_col: str,
    build_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of ``probe`` whose ``probe_col`` MIGHT be in
    ``build[build_col]`` (no false negatives; FP rate set by m/k).

    The bitset rides in as a broadcast single-row cross join -- a
    constant-size side channel, never a shuffle of ``probe``. The
    bitset column uses a collision-proof internal name so a probe
    relation with its own ``bits`` column is untouched.
    """
    bloom = build_bloom(build, build_col, m_bits, k).select(
        F.col("bits").alias("__bloom_bits")
    )
    return (
        probe.crossJoin(F.broadcast(bloom))
        .where(might_contain(F.col("__bloom_bits"), F.col(probe_col), m_bits, k))
        .drop("__bloom_bits")
    )
