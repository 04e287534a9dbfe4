"""Shared marker-delimited block writer for generated doc sections."""

from __future__ import annotations

import re


def write_md_block(path: str, marker: str, body: str) -> None:
    """Replace (or append) the ``<!-- {marker}:begin -->`` ...
    ``<!-- {marker}:end -->`` section of a markdown file with ``body``
    (the full block content, markers excluded)."""
    block = f"<!-- {marker}:begin -->\n{body.rstrip()}\n<!-- {marker}:end -->\n"
    text = open(path).read()
    begin = f"<!-- {marker}:begin -->"
    if begin in text:
        text = re.sub(
            rf"<!-- {re.escape(marker)}:begin -->.*?<!-- {re.escape(marker)}:end -->\n",
            lambda _m: block,  # literal replacement, no backslash escapes
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + block
    open(path, "w").write(text)
