"""Planted web-page chrome shared by the curation certificates and
the scale-corpus generator (VERDICT r9 item 7: these strings were
defined twice -- query-side in curation_pipeline_v3 / its DuckDB
oracle, corpus-side in tools/gen_testdata.py --multiline-frac -- and
a drift between them would silently change what the line-grain rules
are being certified against).

Two families, both lowercase so every tokenizer path treats them like
corpus words:

* QUERY-SIDE chrome (curation_pipeline_v3 plants these around each
  doc's real lines so each line rule has a provable victim): the
  sentence-terminated newsletter line survives the C4 rules and only
  the cross-doc FREQUENCY cut can kill it; the per-doc lorem-ipsum
  line is unique so only C4's lorem rule can; the short unterminated
  line dies to C4's word/terminal rules; the unique opener (carrying
  the PII contact) survives everything.
* CORPUS-SIDE chrome (gen_testdata --multiline-frac plants these as
  the shared header/footer of multi-line pages): boilerplate with
  df = n_multiline_docs, the CCNet frequency cut's natural prey.
"""

from __future__ import annotations

# --- query-side (curation_pipeline_v3 + its oracle) ----------------
OPENER_PREFIX = "doc "
OPENER_MID = " opener with the unique content contact "
OPENER_SUFFIX = "@example.com now."
NEWSLETTER_LINE = "subscribe to our newsletter for daily updates."
LOREM_PREFIX = "the lorem ipsum filler line number "
LOREM_SUFFIX = " is dropped."
SHORT_LINE = "short line"

# --- corpus-side (tools/gen_testdata.py --multiline-frac) ----------
BOILER_HEADER = "subscribe to our newsletter for updates"
BOILER_FOOTER = "copyright example corp all rights reserved"
