"""Randomized parity for the boolean search grammar: the Catalyst
predicate built by ``search.boolean_predicate`` must agree with a
direct Python evaluator of the documented grammar (OR binds loosest;
within a branch, terms AND-chain and NOT negates the following term;
only UPPERCASE operators are operators) on a seeded set of generated
expressions over an adversarial corpus -- one Spark job total.

The reference's grammar lives in sql_search.py:299-349; the uppercase
operator rule is this repo's round-4 behavior change, so the
literal-word cases (``and`` / ``or`` / ``not`` as search terms) are
the interesting edges here.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from conversation_analysis_tools_spark.search import boolean_predicate

# terms deliberately include lowercase operator words (searchable
# literals), mixed case, punctuation, digits, and substrings of each
# other ("cat" in "catalog") so contains() semantics are exercised
_TERMS = ["cat", "Dog", "and", "not", "or", "fish", "42", "cat!", "catalog", "a"]

_TEXTS = [
    "",
    "   ",
    "cat and dog",
    "CATALOG of fish",
    "not a dog, NOT a cat",
    "or else",
    "The answer is 42",
    "cat!dog",
    "and and and",
    "A plain sentence with none of the vocabulary words",
    "Dog dog DOG",
    "fish or fowl and neither",
]


def _gen_expr(rng: random.Random) -> str:
    """A valid expression: 1-3 OR-branches, each 1-3 units; a unit is
    ``term`` / ``NOT term`` / ``AND term`` / ``AND NOT term`` (the two
    AND forms only after the branch has started)."""
    branches = []
    for _ in range(rng.randint(1, 3)):
        units, started = [], False
        for _ in range(rng.randint(1, 3)):
            term = rng.choice(_TERMS)
            forms = ["bare", "not"] + (["and", "andnot"] if started else [])
            form = rng.choice(forms)
            units.append(
                {
                    "bare": term,
                    "not": f"NOT {term}",
                    "and": f"AND {term}",
                    "andnot": f"AND NOT {term}",
                }[form]
            )
            started = True
        branches.append(" ".join(units))
    return " OR ".join(branches)


def _ref_eval(expr: str, text: str) -> bool:
    """Direct evaluator of the documented grammar over a Python str
    (contains = case-insensitive substring)."""
    tl = text.lower()

    def hit(term: str) -> bool:
        return term.lower() in tl

    result = False
    toks = expr.split()
    # top-level split on uppercase OR
    branches, cur = [], []
    for t in toks:
        if t == "OR":
            branches.append(cur)
            cur = []
        else:
            cur.append(t)
    branches.append(cur)
    for bt in branches:
        val = True
        i = 0
        while i < len(bt):
            t = bt[i]
            if t == "AND" or t == "NOT":
                neg = t == "NOT"
                i += 1
                if not neg and i < len(bt) and bt[i] == "NOT":
                    neg = True
                    i += 1
                val = val and (not hit(bt[i]) if neg else hit(bt[i]))
            else:
                val = val and hit(t)
            i += 1
        result = result or val
    return result


def test_boolean_predicate_matches_reference_evaluator(spark):
    rng = random.Random(20260814)
    exprs = sorted({_gen_expr(rng) for _ in range(80)})
    # hand-picked edges on top of the generated set
    exprs += [
        "and",  # lowercase operator word as the sole literal term
        "not not",  # literal "not" twice (AND-chained)
        "or AND or",  # literal "or" AND literal "or"
        "cat AND NOT catalog",
        "NOT a",
        "a AND a OR a",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "i long, text string"
    )
    cols = [
        boolean_predicate(e).alias(f"e{k}") for k, e in enumerate(exprs)
    ]
    rows = {r["i"]: r for r in df.select("i", *cols).collect()}
    mismatches = []
    for ti, text in enumerate(_TEXTS):
        for k, e in enumerate(exprs):
            got = bool(rows[ti][f"e{k}"])
            want = _ref_eval(e, text)
            if got != want:
                mismatches.append((e, text, got, want))
    assert not mismatches, mismatches[:5]


@pytest.mark.parametrize(
    "bad",
    ["", "   ", "cat OR", "OR cat", "cat AND", "cat AND NOT", "NOT", "a OR OR b"],
)
def test_boolean_predicate_rejects_malformed(bad):
    with pytest.raises(ValueError):
        boolean_predicate(bad)
