"""Planted-duplicate invariant probe for the tf-cosine closure family
at scales the full-corpus DuckDB oracle cannot reach.

The five closure queries (nlp_duplicate_pairs / nlp_near_duplicates /
nlp_connected_components / nlp_unique_docs /
pipeline_analysis_results) share one core: sum-normalized-TF cosine
>= 0.9 pairs -> connected components -> unique-doc selection. Their
DuckDB oracle joins tf vectors on TERMS, which is sum(df^2)-quadratic
on the saturated synthetic vocabulary (~59 BILLION join rows at sf1),
so the oracle gate caps them at sf0.1 -- the ENGINE's sf1 behavior
was extrapolated, not verified. This probe verifies it directly,
without ever materializing a quadratic corpus oracle:

1. run the engine's pair set on the corpus (baseline);
2. PLANT duplicates of sources that baseline shows pair with nothing:
   half exact copies (expected cosine exactly 1.0), half one-token
   perturbations whose expected cosine comes from an INDEPENDENT
   DuckDB run of the canonical TF-cosine SQL on just the 2-doc
   {source, plant} corpus (oracle-grade values, linear total cost);
3. re-run on corpus + plants and assert the result is EXACTLY
   baseline + the expected planted pairs -- any lost planted pair is
   a recall bug, any extra pair a precision bug, any drifted baseline
   pair an isolation bug (sum-TF vectors are per-doc, so injection
   provably cannot move other docs' cosines);
4. assert the closure invariants downstream of the pairs: every
   planted pair lands in one component labeled by its (min-id)
   source, and unique_docs(corpus + plants) == unique_docs(corpus)
   -- plants are never representatives.

Usage: python tools/planted_probe.py [sf_dir] [n_plants]
Defaults: /root/repo/testdata_sf1, 20. Results are recorded in
SCALE.md ("Planted-duplicate invariant runs").
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.catalog import table
from conversation_analysis_tools_spark.functions.text import tokens_expr
from conversation_analysis_tools_spark.operators import components as C
from conversation_analysis_tools_spark.operators import similarity as S
from conversation_analysis_tools_spark.queries.nlp import _TF_SUM_CTE
from conversation_analysis_tools_spark.session import get_spark

PLANT_BASE = 10_000_000
THRESHOLD = 0.9


def pair_cosine_oracle(text_a: str, text_b: str) -> float:
    """Independent DuckDB evaluation of the canonical sum-TF cosine
    on a 2-doc corpus (ids 0/1) -- the same SQL the sf0.01 oracle
    gate runs, minus the quadratic corpus join."""
    cte = _TF_SUM_CTE.replace("FROM documents", "FROM documents_fixed")
    sql = f"""
    WITH documents_fixed(doc_id, text) AS (VALUES (0, ?), (1, ?)),
    {cte},
    dots AS (
        SELECT sum(a.tf * b.tf) AS dot
        FROM tf a JOIN tf b ON a.term = b.term
        WHERE a.doc_id = 0 AND b.doc_id = 1
    )
    SELECT dot / (x.nrm * y.nrm)
    FROM dots, norms x, norms y WHERE x.doc_id = 0 AND y.doc_id = 1
    """
    row = duckdb.sql(sql, params=[text_a, text_b]).fetchone()
    return float(row[0]) if row and row[0] is not None else 0.0


def pair_set(df):
    return {(r["id1"], r["id2"], round(r["sim"], 6)) for r in df.collect()}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n_plants = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(master="local[32]")
    docs = table(spark, "documents", sf_dir).select("doc_id", "text")

    t0 = time.time()
    # route="exact" pinned: this probe is the EXACT-closure invariant
    # (the routed plan has its own certificates); the r10 route-default
    # flip must not silently turn it into an approximate self-check
    baseline = pair_set(S.duplicate_pairs(docs, threshold=THRESHOLD, route="exact"))
    t_base = time.time() - t0
    paired = {i for p in baseline for i in p[:2]}
    print(f"baseline: {len(baseline)} pairs in {t_base:.1f}s")

    # deterministic source pick: unpaired docs with enough tokens that
    # a one-token perturbation provably stays >= 0.9 for distinct
    # single-occurrence terms (shared/n >= 19/20), spread over the ids
    cand = [
        r["doc_id"]
        for r in docs.where(F.size(tokens_expr("text")) >= 20)
        .select("doc_id")
        .orderBy("doc_id")
        .collect()
        if r["doc_id"] not in paired
    ]
    step = max(1, len(cand) // n_plants)
    sources = cand[::step][:n_plants]
    src_text = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.col("doc_id").isin(sources)).collect()
    }

    plants, expected_planted = [], set()
    for i, sid in enumerate(sources):
        pid = PLANT_BASE + i
        if i % 2 == 0:
            text = src_text[sid]
            exp = 1.0
        else:
            words = src_text[sid].split()
            words[-1] = "zzzplantword"
            text = " ".join(words)
            exp = pair_cosine_oracle(src_text[sid], text)
            assert exp >= THRESHOLD, (
                f"probe setup: perturbed plant for {sid} scores {exp:.4f}"
            )
        plants.append((pid, text))
        expected_planted.add((sid, pid, round(exp, 6)))

    planted_docs = docs.unionByName(
        spark.createDataFrame(plants, "doc_id long, text string")
    )
    t0 = time.time()
    run = pair_set(
        S.duplicate_pairs(planted_docs, threshold=THRESHOLD, route="exact")
    )
    t_run = time.time() - t0
    expected = baseline | expected_planted

    missing = expected - run
    extra = run - expected
    ok_pairs = not missing and not extra
    print(
        f"planted run: {len(run)} pairs in {t_run:.1f}s -- "
        f"expected {len(expected)} (baseline {len(baseline)} + "
        f"{len(expected_planted)} planted)"
    )
    if missing:
        print(f"FAIL missing pairs: {sorted(missing)[:10]}")
    if extra:
        print(f"FAIL extra pairs: {sorted(extra)[:10]}")

    # closure invariants downstream of the pairs
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b, _ in run], "id1 long, id2 long"
    )
    comp = C.connected_components(pairs_df)
    comp_rows = {r["id"]: r["component"] for r in comp.collect()}
    ok_cc = all(
        comp_rows.get(pid) == comp_rows.get(sid, sid)
        and comp_rows.get(pid) is not None
        and comp_rows[pid] <= sid
        for sid, pid, _ in expected_planted
    )
    print("cc invariant (plant joins its source's component):", "PASS" if ok_cc else "FAIL")

    all_ids = planted_docs.select(F.col("doc_id").alias("id"))
    uniq = {r["id"] for r in C.unique_representatives(all_ids, comp).collect()}
    base_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    ok_uniq = uniq == (
        base_ids
        - {i for p in run for i in p[:2] if i < PLANT_BASE}
        | {min(c) for c in _clusters(run).values()}
    )
    print("unique-docs invariant (plants never representatives):", "PASS" if ok_uniq else "FAIL")

    ok = ok_pairs and ok_cc and ok_uniq
    print("PLANTED PROBE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def _clusters(pairs):
    """pair set -> {root: member set} via driver union-find (probe
    scale: tens of edges)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = {}
    for n in parent:
        out.setdefault(find(n), set()).add(n)
    return out


if __name__ == "__main__":
    raise SystemExit(main())
