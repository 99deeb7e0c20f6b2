"""Deterministic language identification + span tagging.

Frozen stopword profiles (no external models — environment has none, and
determinism is required for the byte-identical gate). A text is scored per
language by the fraction of its tokens found in that language's stopword set;
spans are emitted per paragraph ("\n\n"-separated block of the extracted
text) with character offsets into the extracted text.

Reference analogue: the `lang` column of the input table is a *hint* that may
be wrong (FIXTURES.md §1); the engine emits its own language-tagged spans
(BASELINE.json north_star).
"""
from __future__ import annotations

# Frozen profiles: high-frequency function words per language.
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it for on with as are was be this by an "
        "at from or have has not but they you we his her its their which one "
        "all there when will would can could about into than then them these "
        "some more other time out up so what if no may my over such".split()
    ),
    "de": frozenset(
        "der die das und ist in den von zu mit sich des auf für nicht eine "
        "als auch es an werden aus er hat dass sie nach wird bei einer um am "
        "sind noch wie einem über einen so zum war haben nur oder aber vor "
        "zur bis mehr durch man sein wurde sei".split()
    ),
    "fr": frozenset(
        "le de la et les des en un du une que est dans qui par pour au plus "
        "pas sur se ne ce il sont la aux avec son ont cette mais ou où comme "
        "être elle tout nous sa leur bien peut ces dont aussi fait été si "
        "sans deux même".split()
    ),
    "es": frozenset(
        "de la que el en y a los se del las un por con no una su para es al "
        "lo como más pero sus le ya o fue este ha sí porque esta son entre "
        "cuando muy sin sobre también me hasta hay donde quien desde todo "
        "nos durante todos uno les ni contra".split()
    ),
    "it": frozenset(
        "di e il la che in a per è un una sono le si con non come dei più "
        "nel alla della gli lo dal questo ha anche sua dalla essere o se "
        "degli queste nella tra loro suo ed hanno".split()
    ),
}

UNKNOWN = "und"

# ASCII punctuation stripped from token ENDS before stopword lookup (the
# token count — the score denominator — is unchanged). Without this,
# sentence-final function words ("pour.", "bien.") never hit their profile,
# and a French paragraph whose remaining hits are all fr/es-shared words
# (le, la, que, un) ties fr==es and the alphabetical tie-break misroutes it
# to 'es' (round-2 verdict item 1; NOTES-32 accuracy gate). Mirrored in the
# DuckDB oracle via trim(x, PUNCT_STRIP) — DuckDB trim(s, chars) and Python
# str.strip(chars) have identical both-ends/any-of-chars semantics.
PUNCT_STRIP = ".,;:!?\"'()[]"

# One combined lookup per token instead of one membership test per language:
# token → tuple of indexes into _LANGS. Hit counts are identical to per-set
# membership, so detect_lang's scores (and tie-breaks) are unchanged.
_LANGS = sorted(STOPWORDS)  # sorted → deterministic tie-break
_TOKEN_LANG_IDS: dict[str, tuple[int, ...]] = {}
for _li, _lang in enumerate(_LANGS):
    for _w in STOPWORDS[_lang]:
        _TOKEN_LANG_IDS[_w] = _TOKEN_LANG_IDS.get(_w, ()) + (_li,)


import re as _re

# ASCII whitespace collapse (re.ASCII): the DuckDB oracle tokenizes with
# RE2's ASCII \s, and Java \s is ASCII too — Python's Unicode split() would
# additionally split on NBSP/U+2028 and silently diverge on non-ASCII docs.
_WS_RE = _re.compile(r"\s+", _re.ASCII)


def _tokens(text: str) -> list[str]:
    norm = _WS_RE.sub(" ", text.lower()).strip()
    return norm.split(" ") if norm else []


def detect_lang(text: str) -> str:
    """Best language for a text; 'und' if nothing scores."""
    toks = _tokens(text)
    if not toks:
        return UNKNOWN
    counts = [0] * len(_LANGS)
    get = _TOKEN_LANG_IDS.get
    strip = PUNCT_STRIP
    for t in toks:
        ids = get(t.strip(strip))
        if ids:
            for li in ids:
                counts[li] += 1
    best_lang, best_score = UNKNOWN, 0.0
    n = len(toks)
    for li, lang in enumerate(_LANGS):
        score = counts[li] / n
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score > 0.0 else UNKNOWN


def lang_spans(text: str) -> list[tuple[int, int, str]]:
    """(start, end, lang) per "\n\n"-paragraph of the extracted text.

    Offsets are character offsets into ``text``; paragraphs carrying no
    stopword signal are tagged 'und'. Adjacent same-language spans are NOT
    merged (keeps offsets aligned to paragraphs — deterministic and easy to
    assert in fixtures).
    """
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for i, para in enumerate(text.split("\n\n")):
        start = pos
        end = start + len(para)
        pos = end + 2  # skip the "\n\n" separator
        if para.strip():
            spans.append((start, end, detect_lang(para)))
    return spans
