"""Marked-page splitting — parity with the reference's LlamaParse result
parser (extractors/llamaparse.py:137-222).

Priority chain, exactly as the reference:
  1. `PAGE <n>:` markers — regex with lookahead to the next marker or end
     (llamaparse.py:149-150), page numbers taken from the markers;
  2. fallback: split on a bare `\\n---\\n` horizontal rule, pages numbered
     1..n (llamaparse.py:173);
  3. last resort: the whole content as page 1 (llamaparse.py:190-203).

Page texts are stripped; empty pages are kept (the reference keeps them and
the meaningful-content gate downstream decides, tasks.py:228-249).
"""
from __future__ import annotations

import re

PAGE_RE = re.compile(r"PAGE\s+(\d+):\s*\n(.*?)(?=PAGE\s+\d+:|\Z)", re.S)
_RULE = "\n---\n"


def split_pages(content: str) -> list[tuple[int, str]]:
    """content → [(page_number, page_text)] per the reference chain."""
    matches = PAGE_RE.findall(content)
    if matches:
        return [(int(n), t.strip()) for n, t in matches]
    if _RULE in content:
        return [(i + 1, part.strip()) for i, part in enumerate(content.split(_RULE))]
    return [(1, content.strip())]
