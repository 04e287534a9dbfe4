"""Pinned hyperplane-LSH bucket ids: the bucket computation is
cross-round plan-data (seeded planes, sign test, bit weights), so any
refactor of operators/ann.py must reproduce these exact ids -- a
silent change would re-bucket every LSH index and dedup blocking key.
Values recorded from the round-4 single-transform implementation,
which is bit-identical to the original per-plane fold form.
"""

from __future__ import annotations

from conversation_analysis_tools_spark.operators import ann as A

_VECS = [
    (0, [float(i % 7) - 3.0 for i in range(64)]),
    (1, [1.0] * 64),
    (2, [0.0] * 64),  # zero vector: every dot is 0, bucket 0
    (3, [(-1.0) ** i * (i + 1) / 64.0 for i in range(64)]),
]

_PINNED = {
    0: {0: 129, 1: 126, 2: 0, 3: 178},
    1: {0: 35, 1: 153, 2: 0, 3: 132},
    2: {0: 130, 1: 203, 2: 0, 3: 210},
}


def test_bucket_ids_pinned(spark):
    df = spark.createDataFrame(_VECS, "vec_id long, embedding array<double>")
    for table_id, expected in _PINNED.items():
        got = {
            r["vec_id"]: r["b"]
            for r in df.select(
                "vec_id",
                A.hyperplane_bucket_expr("embedding", 64, 8, table_id).alias("b"),
            ).collect()
        }
        assert got == expected, table_id
