"""From-scratch HTML main-content extraction kernel.

Boilerpipe/readability-style block scoring over a DOM block stream built with
the stdlib ``html.parser`` tokenizer (no lxml/bs4 in the environment, and the
north rule demands a from-scratch kernel anyway).

Reference parity (see /root/reference, ASHUTOSH2224/PDF-Extractor):
  - channel model TEXT / COMBINED / TABLE / MARKDOWN mirrors the extractor
    channel dict (pdfplumber_extractor.py:43-47, markitdown_extractor.py:40-45)
  - table rendering: cells joined " | ", rows joined "\n", tables joined
    "\n\n" (pdfplumber_extractor.py:33-41)
  - block-type classification (heading/list/text/table/boilerplate) mirrors
    Unstructured's element classification (unstructured_extractor.py:61-72)
  - error contract: never raise; degrade to empty channels + error metadata
    (pypdf2_extractor.py:41-48)

The kernel is pure Python and operates on one byte payload; the Spark layer
vectorizes it over Arrow record batches (pdf_extractor_spark/operators/extract.py).
All whitespace discipline is fixed here and mirrored by the corpus generator:
  - within a block: all runs of whitespace collapse to a single space, strip
  - blocks joined by "\n\n" in document order
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape as _unescape
from html.parser import HTMLParser

_WS_RE = re.compile(r"\s+")

# Containers whose entire subtree is boilerplate (never main content).
BOILERPLATE_CONTAINERS = frozenset(
    {
        "nav", "header", "footer", "aside", "script", "style", "noscript",
        "form", "button", "svg", "template", "iframe", "select", "option",
        "head", "menu", "dialog",
    }
)

# Tags that terminate/emit a text block.
BLOCK_TAGS = frozenset(
    {
        "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote",
        "figcaption", "caption", "dt", "dd", "div", "section", "article",
        "main", "body", "br", "tr", "td", "th", "table", "ul", "ol", "title",
    }
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Single-probe action codes for the fast parser's dispatch ladder (one
# dict.get replaces up to three frozenset membership tests per tag).
# 1=boilerplate container, 2=<a>, 3=<table>, 4=heading, 5=<li>,
# 6=other block tag, 7=<td>/<th>, 8=<tr>; absent=inline (no builder event).
_TAG_ACT: dict[str, int] = {t: 1 for t in BOILERPLATE_CONTAINERS}
_TAG_ACT["a"] = 2
for _t in BLOCK_TAGS:
    _TAG_ACT[_t] = (
        3 if _t == "table"
        else 4 if _t in HEADING_TAGS
        else 5 if _t == "li"
        else 7 if _t in ("td", "th")
        else 8 if _t == "tr"
        else 6
    )
del _t

# A block whose link density exceeds this is boilerplate unless it is long
# prose (readability/boilerpipe heuristic).
LINK_DENSITY_MAX = 0.49
# Minimum words for a high-link-density block to still count as content.
LONG_PROSE_WORDS = 40


def _norm(s: str) -> str:
    # identical to _WS_RE.sub(" ", s).strip(): argless str.split splits on
    # exactly the chars re's \s matches (SRE's UNI_SPACE is str.isspace),
    # and join collapses each run to one space — ~3x faster in the hot path
    return " ".join(s.split())


@dataclass(slots=True)
class Block:
    """One classified DOM text block."""

    kind: str  # 'text' | 'heading' | 'list' | 'table'
    text: str  # normalized text ('' for tables; tables carry rows)
    level: int = 0  # heading level for kind='heading'
    rows: list[list[str]] = field(default_factory=list)  # for kind='table'
    link_chars: int = 0
    total_chars: int = 0
    boiler_depth: int = 0  # >0 → inside a boilerplate container

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0

    @property
    def words(self) -> int:
        return len(self.text.split()) if self.text else 0

    def is_content(self) -> bool:
        if self.boiler_depth > 0:
            return False
        if self.kind == "table":
            return bool(self.rows)
        if not self.text:
            return False
        if self.link_density > LINK_DENSITY_MAX and self.words < LONG_PROSE_WORDS:
            return False
        return True


class _BlockParser(HTMLParser):
    """Streams the tag soup into a flat list of classified Blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._buf: list[str] = []
        self._buf_link = 0
        self._buf_total = 0
        self._boiler = 0
        self._a_depth = 0
        self._li_depth = 0
        self._pending_kind = "text"
        self._pending_level = 0
        # table state
        self._table_depth = 0
        self._tables_stack: list[Block] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    # -- block buffer handling -------------------------------------------
    def _flush(self, kind: str | None = None, level: int | None = None) -> None:
        if self._buf:  # counts are only ever nonzero when the buffer is
            text = _norm("".join(self._buf))
            if text:
                self.blocks.append(
                    Block(
                        kind=kind if kind is not None else self._pending_kind,
                        text=text,
                        level=level if level is not None else self._pending_level,
                        link_chars=self._buf_link,
                        total_chars=self._buf_total,
                        boiler_depth=self._boiler,
                    )
                )
            self._buf = []
            self._buf_link = 0
            self._buf_total = 0
        self._pending_kind = "text"
        self._pending_level = 0

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in BOILERPLATE_CONTAINERS:
            self._flush()
            self._boiler += 1
            return
        if tag == "a":
            self._a_depth += 1
            return
        if tag == "table":
            self._flush()
            self._table_depth += 1
            self._tables_stack.append(Block(kind="table", text="", boiler_depth=self._boiler))
            return
        if self._table_depth:
            if tag == "tr":
                self._row = []
            elif tag in ("td", "th"):
                self._cell = []
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in HEADING_TAGS:
                self._pending_kind = "heading"
                self._pending_level = int(tag[1])
            elif tag == "li":
                self._li_depth += 1
                self._pending_kind = "list"
            else:
                self._pending_kind = "list" if self._li_depth else "text"

    def handle_endtag(self, tag: str) -> None:
        if tag in BOILERPLATE_CONTAINERS:
            self._flush()
            if self._boiler:
                self._boiler -= 1
            return
        if tag == "a":
            if self._a_depth:
                self._a_depth -= 1
            return
        if tag == "table":
            self._flush()
            if self._table_depth:
                self._table_depth -= 1
                tbl = self._tables_stack.pop()
                if tbl.rows:
                    self.blocks.append(tbl)
            return
        if self._table_depth:
            if tag in ("td", "th") and self._cell is not None:
                cell = _norm("".join(self._cell))
                if self._row is not None:
                    self._row.append(cell)
                self._cell = None
            elif tag == "tr" and self._row is not None:
                if any(c for c in self._row):
                    self._tables_stack[-1].rows.append(self._row)
                self._row = None
            return
        if tag in BLOCK_TAGS:
            if tag in HEADING_TAGS:
                self._flush(kind="heading", level=int(tag[1]))
            elif tag == "li":
                self._flush(kind="list")
                if self._li_depth:
                    self._li_depth -= 1
            else:
                self._flush()

    def handle_data(self, data: str) -> None:
        if self._table_depth:
            if self._cell is not None:
                self._cell.append(data)
            return
        self._buf.append(data)
        # len(_norm(data)) without building the string: sum of part lengths
        # plus the single joining spaces
        parts = data.split()
        n = sum(map(len, parts)) + len(parts) - 1 if parts else 0
        self._buf_total += n
        if self._a_depth:
            self._buf_link += n

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


# -- fast tokenizer ----------------------------------------------------------
# The block builder consumes only three events (starttag name, endtag name,
# text between tags — attributes are never read), so the stdlib HTMLParser's
# full spec machinery (~80% of kernel CPU in profiling) is overkill for
# well-formed pages. This scanner handles exactly the verified subset —
# plain tags, self-closing tags, comments, doctype/PI, script/style rawtext,
# text with charrefs (html.unescape — the exact call HTMLParser makes with
# convert_charrefs=True; rawtext never unescaped, also matching) — and
# returns False on the FIRST construct outside it
# (stray '<', attribute soup), in which case the caller reruns the
# whole document through HTMLParser. Event-for-event identical on the fast
# path (verified differentially against HTMLParser over the entire corpus,
# tests/test_kernels_golden.py), so extraction output is byte-identical.

_FAST_TAG_RE = re.compile(
    r"<(?:"
    r"(?P<end>/)\s*(?P<ename>[a-zA-Z][a-zA-Z0-9:_.-]*)\s*>"
    # the (?=...) lookahead pins stdlib's ASCII-only tag-NAME terminator
    # class ([\t\n\r\f />\x00], tagfind_tolerant): HTMLParser keeps a
    # unicode space like U+2028 as part of the NAME ('<a  href=#>' is
    # an unknown tag 'a ', not a link), while this regex's \s-based
    # attrs would otherwise absorb it and mis-claim the tag — so those
    # inputs now fail the match and bail to stdlib. WITHIN attrs stdlib's
    # own machinery is unicode-\s, so the chunks below keep \s.
    r"|(?P<name>[a-zA-Z][a-zA-Z0-9:_.-]*)(?=[ \t\n\r\f/>])"
    # possessive quantifiers: the ws-chunk body class includes \s, so a
    # backtracking loop explores every chunk decomposition — exponential on
    # an unclosed tag with N attr tokens (truncated WARC captures hit this;
    # measured 3.7 s at N=24, hung at N=26). Atomic chunks are language-
    # identical (verified at every position over a 30k-string fuzz) and
    # match in linear time.
    r"(?P<attrs>(?:\s++[^<>\"']*+|\"[^\"]*+\"|'[^']*+')*+)\s*(?P<selfclose>/?)>"
    r"|!--(?P<comment>.*?)--\s*>"
    r"|(?P<marked>!\[)"
    r"|(?P<decl>!(?!--|\[)[^>]*)>"
    r"|(?P<pi>\?[^>]*)>"
    r")",
    re.S,
)
_RAWTEXT = ("script", "style")
# rawtext close-tag scanners, searched on the ORIGINAL string (never on a
# lowered copy: str.lower can change string length — 'İ' → 'i̇' — which
# desyncs slice indices; and re-lowercasing the document per script tag is
# quadratic on script-heavy pages). Per tag:
#   prefix — the exact stdlib HTMLParser `interesting` pattern for cdata
#            mode (`</\s*tag`, re.I): where the stdlib parser would stop.
#   close  — a clean end tag (`</\s*tag\s*>`) with ASCII-exact letters
#            (explicit [sS] classes, not re.I, so 'ſ' cannot match 's').
# The fast path proceeds only when the first stdlib-visible candidate IS a
# clean close; anything else ('</scriptfoo', '</script x>', unclosed to
# EOF) bails to the stdlib parser, which owns the subtle cases.
_RAWTEXT_RES = {
    t: (
        re.compile(rf"</\s*{t}", re.I),
        re.compile("</\\s*" + "".join(f"[{c}{c.upper()}]" for c in t) + "\\s*>"),
    )
    for t in _RAWTEXT
}

# Strict well-formed-attributes validator, applied only when the captured
# attrs contain a quote: the tag-regex's quoted chunks may open at ANY chunk
# boundary, but HTMLParser only treats quotes as delimiters in value
# position (after '='). A stray quote elsewhere ('<a href=/home">',
# "<ht'ml>") makes the fast regex's quoted chunk span the '>' stdlib stops
# at — silently swallowing markup. Quoted attrs that fullmatch this strict
# shape (name, optional ='value'/"value"/bare) end the tag at the same '>'
# as stdlib; anything else bails to the stdlib parser. Possessive
# throughout (no backtracking blowup on adversarial soup).
_STRICT_ATTRS_RE = re.compile(
    r"(?:\s++[^\s/>\"'=]++"           # attribute name
    r"(?:\s*+=\s*+"                   # = value
    r"(?:\"[^\"]*+\"|'[^']*+'|[^\s<>\"']++))?+"
    r")*+\s*+/?+\s*+"                 # trailing whitespace / lone slash
)

# Marked sections '<![...' — the exact _markupbase.parse_marked_section
# rules: a declname, then a keyword-dependent close (']]>' for CDATA-class
# sections, ']>' for MS conditionals); unknown keywords make the stdlib
# parser raise, so the fast path bails there (error-row parity).
_DECLNAME_RE = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MARKED_CLOSE_RE = re.compile(r"]\s*]\s*>")  # _markupbase._markedsectionclose
_MS_MARKED_CLOSE_RE = re.compile(r"]\s*>")  # _markupbase._msmarkedsectionclose
_MARKED_CDATA_KEYWORDS = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
_MARKED_MS_KEYWORDS = frozenset({"if", "else", "endif"})


def _parse_fast(html: str) -> list[Block] | None:
    """Fused scanner + block builder: the _FAST_TAG_RE tokenizer driving the
    exact _BlockParser state machine with LOCAL variables and inlined
    flushes — no method dispatch on the hot path (the builder's handler
    calls were ~35% of kernel CPU). Returns the block list, or None to bail
    to the stdlib path. Event-for-event parity with _BlockParser is pinned
    by the corpus-wide differential test and the hypothesis fuzzers."""
    blocks: list[Block] = []
    buf: list[str] = []
    buf_append = buf.append
    buf_link = 0
    buf_total = 0
    boiler = 0
    a_depth = 0
    li_depth = 0
    pending_kind = "text"
    pending_level = 0
    table_depth = 0
    tables_stack: list[Block] = []
    row: list[str] | None = None
    cell: list[str] | None = None

    pos = 0
    n = len(html)
    # One search() per tag instead of find('<') + match(): the regex
    # engine's literal-prefix scan does the find at C speed inside the same
    # call (measured 1.17x on the corpus). A stray '<' — where the old
    # match() would fail — now lands in the data segment and is caught by
    # the '<' in data check below, preserving exact bail semantics.
    search = _FAST_TAG_RE.search
    tag_act = _TAG_ACT.get

    while pos < n:
        m = search(html, pos)
        lt = m.start() if m is not None else n
        if lt > pos:
            data = html[pos:lt]
            if "<" in data:
                return None  # stray '<' — HTMLParser has subtle data rules here
            if "&" in data:
                data = _unescape(data)
            # handle_data
            if table_depth:
                if cell is not None:
                    cell.append(data)
            else:
                buf_append(data)
                parts = data.split()
                if parts:
                    dn = sum(map(len, parts)) + len(parts) - 1
                    buf_total += dn
                    if a_depth:
                        buf_link += dn
        if m is None:
            break
        lg = m.lastgroup
        if lg == "ename":
            # ---- handle_endtag ------------------------------------------
            tag = m["ename"].lower()
            act = tag_act(tag, 0)
            if act == 1:
                if buf:
                    text = " ".join("".join(buf).split())
                    if text:
                        blocks.append(Block(pending_kind, text, pending_level,
                                            [], buf_link, buf_total, boiler))
                    buf.clear()
                    buf_link = 0
                    buf_total = 0
                pending_kind = "text"
                pending_level = 0
                if boiler:
                    boiler -= 1
            elif act == 2:
                if a_depth:
                    a_depth -= 1
            elif act == 3:
                if buf:
                    text = " ".join("".join(buf).split())
                    if text:
                        blocks.append(Block(pending_kind, text, pending_level,
                                            [], buf_link, buf_total, boiler))
                    buf.clear()
                    buf_link = 0
                    buf_total = 0
                pending_kind = "text"
                pending_level = 0
                if table_depth:
                    table_depth -= 1
                    tbl = tables_stack.pop()
                    if tbl.rows:
                        blocks.append(tbl)
            elif table_depth:
                if act == 7 and cell is not None:
                    ctext = " ".join("".join(cell).split())
                    if row is not None:
                        row.append(ctext)
                    cell = None
                elif act == 8 and row is not None:
                    if any(c for c in row):
                        tables_stack[-1].rows.append(row)
                    row = None
            elif act:
                if act == 4:
                    if buf:
                        text = " ".join("".join(buf).split())
                        if text:
                            blocks.append(Block("heading", text, int(tag[1]),
                                                [], buf_link, buf_total, boiler))
                        buf.clear()
                        buf_link = 0
                        buf_total = 0
                    pending_kind = "text"
                    pending_level = 0
                elif act == 5:
                    if buf:
                        text = " ".join("".join(buf).split())
                        if text:
                            blocks.append(Block("list", text, pending_level,
                                                [], buf_link, buf_total, boiler))
                        buf.clear()
                        buf_link = 0
                        buf_total = 0
                    pending_kind = "text"
                    pending_level = 0
                    if li_depth:
                        li_depth -= 1
                else:
                    if buf:
                        text = " ".join("".join(buf).split())
                        if text:
                            blocks.append(Block(pending_kind, text, pending_level,
                                                [], buf_link, buf_total, boiler))
                        buf.clear()
                        buf_link = 0
                        buf_total = 0
                    pending_kind = "text"
                    pending_level = 0
            pos = m.end()
            continue
        if lg == "selfclose":
            tag = m["name"].lower()
            selfclose = m["selfclose"]
            attrs_q = m["attrs"]
            if attrs_q and ('"' in attrs_q or "'" in attrs_q) and \
                    _STRICT_ATTRS_RE.fullmatch(attrs_q) is None:
                return None  # quote outside value position — stdlib owns
            if not selfclose:
                # The attrs group can swallow a trailing '/' (e.g.
                # '<img src="x" />' puts ' /' in attrs), hiding an XHTML
                # self-close. Replicate HTMLParser's attrfind_tolerant
                # outcome from the last attrs tokens: a '=' mid-token means
                # the slash is the tail of an unquoted value (plain start
                # tag, '<a href=http://x/>'); a lone '/' after a completed
                # attribute, or a bare attribute name with a trailing slash
                # ('<input checked/>'), leaves the slash standalone before
                # '>' (startendtag). Value-expecting states ('<img src= />'
                # binds '/' AS the value), '='-leading tokens ('<li =/>' vs
                # '<p ==/>' diverge inside attrfind) and slash pileups are
                # the stdlib parser's.
                attrs = m["attrs"]
                if attrs and attrs[-1] == "/":
                    toks = attrs.split()
                    t = toks[-1]
                    if t == "/":
                        if len(toks) > 1 and toks[-2].endswith("="):
                            return None  # stdlib binds '/' as the value
                        selfclose = "/"
                    elif "=" in t:
                        if t.startswith("="):
                            return None  # '=/' vs '==/': attrfind subtlety
                        # slash is the tail of an unquoted value: plain start
                    elif t.endswith("//"):
                        return None
                    else:
                        selfclose = "/"
            act = tag_act(tag, 0)
            rawtext = not selfclose and tag in _RAWTEXT
            # ---- handle_starttag (+ immediate endtag when self-closing) --
            for _rep in range(2 if selfclose else 1):
                # first pass = starttag semantics; second = endtag semantics
                if _rep == 0:
                    if act == 1:
                        if buf:
                            text = " ".join("".join(buf).split())
                            if text:
                                blocks.append(Block(pending_kind, text,
                                                    pending_level, [], buf_link,
                                                    buf_total, boiler))
                            buf.clear()
                            buf_link = 0
                            buf_total = 0
                        pending_kind = "text"
                        pending_level = 0
                        boiler += 1
                    elif act == 2:
                        a_depth += 1
                    elif act == 3:
                        if buf:
                            text = " ".join("".join(buf).split())
                            if text:
                                blocks.append(Block(pending_kind, text,
                                                    pending_level, [], buf_link,
                                                    buf_total, boiler))
                            buf.clear()
                            buf_link = 0
                            buf_total = 0
                        pending_kind = "text"
                        pending_level = 0
                        table_depth += 1
                        tables_stack.append(
                            Block("table", "", 0, [], 0, 0, boiler))
                    elif table_depth:
                        if act == 8:
                            row = []
                        elif act == 7:
                            cell = []
                    elif act:
                        if buf:
                            text = " ".join("".join(buf).split())
                            if text:
                                blocks.append(Block(pending_kind, text,
                                                    pending_level, [], buf_link,
                                                    buf_total, boiler))
                            buf.clear()
                            buf_link = 0
                            buf_total = 0
                        if act == 4:
                            pending_kind = "heading"
                            pending_level = int(tag[1])
                        elif act == 5:
                            li_depth += 1
                            pending_kind = "list"
                            pending_level = 0
                        else:
                            pending_kind = "list" if li_depth else "text"
                            pending_level = 0
                else:
                    # endtag semantics for the self-closing case (mirrors
                    # the endtag branch above; self-closing tags are never
                    # headings/li in practice but parity demands the full
                    # state machine)
                    if act == 1:
                        if buf:
                            text = " ".join("".join(buf).split())
                            if text:
                                blocks.append(Block(pending_kind, text,
                                                    pending_level, [], buf_link,
                                                    buf_total, boiler))
                            buf.clear()
                            buf_link = 0
                            buf_total = 0
                        pending_kind = "text"
                        pending_level = 0
                        if boiler:
                            boiler -= 1
                    elif act == 2:
                        if a_depth:
                            a_depth -= 1
                    elif act == 3:
                        if buf:
                            text = " ".join("".join(buf).split())
                            if text:
                                blocks.append(Block(pending_kind, text,
                                                    pending_level, [], buf_link,
                                                    buf_total, boiler))
                            buf.clear()
                            buf_link = 0
                            buf_total = 0
                        pending_kind = "text"
                        pending_level = 0
                        if table_depth:
                            table_depth -= 1
                            tbl = tables_stack.pop()
                            if tbl.rows:
                                blocks.append(tbl)
                    elif table_depth:
                        if act == 7 and cell is not None:
                            ctext = " ".join("".join(cell).split())
                            if row is not None:
                                row.append(ctext)
                            cell = None
                        elif act == 8 and row is not None:
                            if any(c for c in row):
                                tables_stack[-1].rows.append(row)
                            row = None
                    elif act:
                        if act == 4:
                            if buf:
                                text = " ".join("".join(buf).split())
                                if text:
                                    blocks.append(Block("heading", text,
                                                        int(tag[1]), [],
                                                        buf_link, buf_total,
                                                        boiler))
                                buf.clear()
                                buf_link = 0
                                buf_total = 0
                            pending_kind = "text"
                            pending_level = 0
                        elif act == 5:
                            if buf:
                                text = " ".join("".join(buf).split())
                                if text:
                                    blocks.append(Block("list", text,
                                                        pending_level, [],
                                                        buf_link, buf_total,
                                                        boiler))
                                buf.clear()
                                buf_link = 0
                                buf_total = 0
                            pending_kind = "text"
                            pending_level = 0
                            if li_depth:
                                li_depth -= 1
                        else:
                            if buf:
                                text = " ".join("".join(buf).split())
                                if text:
                                    blocks.append(Block(pending_kind, text,
                                                        pending_level, [],
                                                        buf_link, buf_total,
                                                        boiler))
                                buf.clear()
                                buf_link = 0
                                buf_total = 0
                            pending_kind = "text"
                            pending_level = 0
            if rawtext:
                prefix_re, close_re = _RAWTEXT_RES[tag]
                pm = prefix_re.search(html, m.end())
                if pm is None:
                    return None  # unclosed rawtext → stdlib owns EOF rules
                cm = close_re.match(html, pm.start())
                if cm is None:
                    return None  # '</scriptfoo' / '</script x>' → stdlib
                close, gt = pm.start(), cm.end() - 1
                raw = html[m.end():close]
                if raw:
                    # handle_data, rawtext: no charref conversion; script/
                    # style are boilerplate containers so the data only
                    # reaches a cell inside a table — mirror exactly
                    if table_depth:
                        if cell is not None:
                            cell.append(raw)
                    else:
                        buf_append(raw)
                        parts = raw.split()
                        if parts:
                            dn = sum(map(len, parts)) + len(parts) - 1
                            buf_total += dn
                            if a_depth:
                                buf_link += dn
                # endtag for the rawtext element (a boilerplate container)
                if buf:
                    text = " ".join("".join(buf).split())
                    if text:
                        blocks.append(Block(pending_kind, text, pending_level,
                                            [], buf_link, buf_total, boiler))
                    buf.clear()
                    buf_link = 0
                    buf_total = 0
                pending_kind = "text"
                pending_level = 0
                if boiler:
                    boiler -= 1
                pos = gt + 1
                continue
        if lg == "marked":
            # '<![' marked section: skip to the keyword's close exactly as
            # _markupbase.parse_marked_section does; no builder events.
            dm = _DECLNAME_RE.match(html, m.end())
            if dm is None:
                return None  # stdlib raises 'expected name token'
            sect = dm.group().strip().lower()
            if sect in _MARKED_CDATA_KEYWORDS:
                cm = _MARKED_CLOSE_RE.search(html, m.end())
            elif sect in _MARKED_MS_KEYWORDS:
                cm = _MS_MARKED_CLOSE_RE.search(html, m.end())
            else:
                return None  # stdlib raises 'unknown status keyword'
            if cm is None:
                return None  # unclosed section → stdlib EOF rules
            pos = cm.end()
            continue
        # comments / doctype / processing instructions: no builder events
        pos = m.end()

    # close(): flush trailing text
    if buf:
        text = " ".join("".join(buf).split())
        if text:
            blocks.append(Block(pending_kind, text, pending_level,
                                [], buf_link, buf_total, boiler))
    return blocks


def parse_blocks(html: str) -> list[Block]:
    """Parse HTML into classified blocks (content and boilerplate alike)."""
    blocks = _parse_fast(html)
    if blocks is not None:
        return blocks
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def render_table(rows: list[list[str]]) -> str:
    """Pipe format per reference pdfplumber_extractor.py:33-41."""
    return "\n".join(" | ".join(c for c in row) for row in rows)


def _formula_inner(text: str) -> str | None:
    """The inner LaTeX of a block that IS one display-math formula
    (``$$...$$`` spanning the whole normalized block), else None. The
    whole-block rule mirrors the table treatment: a formula paragraph
    routes to the LATEX channel (+ combined/markdown verbatim) and stays
    out of the prose TEXT channel; inline math inside prose is prose."""
    if (len(text) > 4 and text.startswith("$$") and text.endswith("$$")
            and "$$" not in text[2:-2]):
        inner = text[2:-2].strip()
        return inner or None
    return None


def assemble_channels(blocks: list[Block]) -> dict[str, str]:
    """Assemble the reference's content channels from classified blocks.

    TEXT     — content prose blocks (headings/paragraphs/lists) joined "\n\n"
    TABLE    — pipe-rendered tables joined "\n\n"
    COMBINED — TEXT + "\n\n" + TABLE-interleaved-in-order (reference
               pdfplumber emits text then tables per page; here document order)
    MARKDOWN — headings '#'-prefixed, list items '- ', tables pipe rows,
               joined "\n\n" (markitdown_extractor.py:40-45 analogue)
    TITLES   — heading blocks joined "\n" (unstructured_extractor.py:92-97)
    LATEX    — display-math formula blocks (whole-paragraph ``$$...$$``),
               inner LaTeX joined "\n\n" (mathpix_extractor.py:133-136
               analogue; like tables, formulas reach COMBINED/MARKDOWN in
               document order but not the prose TEXT channel)
    """
    content = [b for b in blocks if b.is_content()]
    text_parts: list[str] = []
    table_parts: list[str] = []
    combined_parts: list[str] = []
    md_parts: list[str] = []
    titles: list[str] = []
    latex_parts: list[str] = []
    for b in content:
        if b.kind == "table":
            t = render_table(b.rows)
            table_parts.append(t)
            combined_parts.append(t)
            md_parts.append(t)
        elif b.kind == "text" and (formula := _formula_inner(b.text)) is not None:
            latex_parts.append(formula)
            combined_parts.append(b.text)
            md_parts.append(b.text)
        else:
            text_parts.append(b.text)
            combined_parts.append(b.text)
            if b.kind == "heading":
                md_parts.append("#" * b.level + " " + b.text)
                titles.append(b.text)
            elif b.kind == "list":
                md_parts.append("- " + b.text)
            else:
                md_parts.append(b.text)
    return {
        "text": "\n\n".join(text_parts),
        "table": "\n\n".join(table_parts),
        "combined": "\n\n".join(combined_parts),
        "markdown": "\n\n".join(md_parts),
        "titles": "\n".join(titles),
        "latex": "\n\n".join(latex_parts),
    }


# WHATWG-style charset sniff (encoding standard §4.2 precedence, trimmed to
# the deterministic subset a batch pipeline can honor): BOM first, then a
# transport (HTTP Content-Type) label if the caller carries one, then a
# <meta charset=...> / http-equiv content charset within the first 1024
# bytes, else UTF-8. Labels resolve through a closed whitelist — never
# codecs.lookup on attacker-controlled names (UTF-7 and friends stay out).
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?([A-Za-z0-9_.:-]{1,32})", re.I | re.S
)
_CHARSET_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "us-ascii": "utf-8", "ascii": "utf-8",
    "iso-8859-1": "iso-8859-1", "latin-1": "iso-8859-1", "latin1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "utf-16le": "utf-16-le", "utf-16-le": "utf-16-le",
    "utf-16be": "utf-16-be", "utf-16-be": "utf-16-be",
}


def sniff_decode(payload: bytes, transport_charset: str | None = None
                 ) -> tuple[str, str]:
    """Decode an HTML payload with charset sniffing → (text, encoding).

    errors="replace" throughout — decode NEVER raises, matching the
    kernel error contract. The returned encoding is the canonical label
    actually used ("utf-8" when nothing else matched).
    """
    if payload[:3] == b"\xef\xbb\xbf":
        return payload.decode("utf-8-sig", errors="replace"), "utf-8"
    if payload[:2] == b"\xff\xfe":
        return payload[2:].decode("utf-16-le", errors="replace"), "utf-16-le"
    if payload[:2] == b"\xfe\xff":
        return payload[2:].decode("utf-16-be", errors="replace"), "utf-16-be"
    enc = None
    if transport_charset:
        enc = _CHARSET_LABELS.get(transport_charset.strip().lower())
    if enc is None:
        m = _META_CHARSET_RE.search(payload[:1024])
        if m:
            enc = _CHARSET_LABELS.get(
                m.group(1).decode("ascii", errors="replace").lower())
    if enc is None:
        enc = "utf-8"
    return payload.decode(enc, errors="replace"), enc


def extract_html(payload: bytes,
                 transport_charset: str | None = None) -> dict:
    """Extract main content from one HTML payload.

    Returns {'channels': {...}, 'meta': {...}}; never raises (reference
    error contract pypdf2_extractor.py:41-48). The 'meaningful content'
    gate (tasks.py:228-249) is applied by the caller via meta['ok'].
    ``transport_charset`` is the HTTP Content-Type charset label when the
    caller has one (the WARC ingest path) — WHATWG precedence slots it
    between BOM and the in-page meta tag.
    """
    meta: dict[str, str] = {}
    empty = {"text": "", "table": "", "combined": "", "markdown": "",
             "titles": "", "latex": ""}
    if not payload:
        meta["error"] = "empty payload"
        meta["ok"] = "false"
        return {"channels": empty, "meta": meta}
    try:
        html, enc = sniff_decode(payload, transport_charset)
        if enc != "utf-8":  # key only when the sniff changed the decode —
            # the utf-8 default leaves existing outputs byte-identical
            meta["encoding"] = enc
        blocks = parse_blocks(html)
        channels = assemble_channels(blocks)
        ok = bool(channels["combined"] or channels["text"])
        meta["ok"] = "true" if ok else "false"
        if not ok:
            meta["error"] = "no meaningful content"
        meta["n_blocks"] = str(len(blocks))
        return {"channels": channels, "meta": meta}
    except Exception as exc:  # pragma: no cover - defensive
        meta["error"] = f"{type(exc).__name__}: {exc}"
        meta["ok"] = "false"
        return {"channels": empty, "meta": meta}
