"""PII redaction expressions for training-data curation (beyond the
reference: the standard scrub stage of a web-scale pipeline, e.g.
C4/ROOTS-style email/phone/IP masking before training).

Every pattern is written in the Java-regex / RE2 COMMON dialect --
no backreferences, no lookaround (RE2 has neither) -- so the exact
same pattern string runs in Spark (Java regex) and in the DuckDB
oracle (RE2 with the 'g' flag), and redaction is oracle-checkable
like every other operator here. Redaction is a pure row expression:
at 100 TB it is a map-only stage that composes with any scan and
pushes no shuffle.

Pattern order matters and is part of the contract: longer/more
specific number shapes run before shorter ones (credit-card before
phone; SSN's 3-2-4 cannot be eaten by phone's 3-3-4), and the email
rule runs first so its local part's digits are never half-eaten by a
number rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) -- applied IN ORDER.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "credit_card",
        r"\b(?:\d{4}[- ]){3}\d{4}\b",
        "<CC>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        # separator-REQUIRED 3-3-4 (optionally parenthesized area
        # code): a bare 10-digit run is more often an id than a phone
        # number, so it is deliberately NOT matched (precision over
        # recall -- the standard scrub-stage trade). The \b after the
        # optional '(' anchors the LEADING edge too: without it the
        # pattern matched the suffix of a longer digit run
        # ('12345-678-9012' -> '12<PHONE>'), mangling ids. \b between
        # two digits never holds, so a digit-preceded area code is
        # rejected while '(' or start-of-string still matches --
        # RE2/Java-common, dialect parity preserved.
        r"\(?\b\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
]


def redact_pii(col: Column | str) -> Column:
    """text -> text with every PII match replaced by its tag.

    A chain of regexp_replace expressions (Spark replaces ALL
    occurrences); whole-stage codegen keeps the chain in one pass
    over the row -- no UDF, no shuffle."""
    out = F.col(col) if isinstance(col, str) else col
    for _name, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def redact_sql(expr: str) -> str:
    """The DuckDB-side equivalent of :func:`redact_pii` for oracle
    SQL: nested regexp_replace with the 'g' (global) flag -- DuckDB
    replaces only the first match without it, Spark always replaces
    all."""
    out = expr
    for _name, pat, rep in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{rep}', 'g')"
    return out
