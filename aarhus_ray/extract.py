"""Canonical, frozen HTML→text extractor (BASELINE.json:6, :15).

The contract demands "byte-identical extracted text per url" versus the
reference. The reference tree is empty in this sandbox (SURVEY.md §0), so
THIS implementation is the canonical one, frozen by committed golden fixtures
(tests/golden/extracted.parquet). Any change to this module is a breaking
change to the goldens — do not "improve" it without regenerating and
re-reviewing goldens.

Semantics (frozen):
1. Decode bytes: sniff a declared charset from ``<meta charset=...>`` /
   ``<meta http-equiv="content-type" content="...charset=...">`` within the
   first 2048 bytes; unknown/absent → utf-8. Decode with errors="replace".
2. Parse with stdlib ``html.parser.HTMLParser`` (convert_charrefs=True, so
   named + numeric entities are unescaped). stdlib-only by design: native
   parsers (lxml/selectolax) drift across versions and would break
   byte-identity.
3. Drop the contents of <script>, <style>, <template> subtrees and all
   comments / declarations / processing instructions.
4. Emit a newline at every block-level tag boundary (open and close; <br>
   and <hr> count).
5. Normalize whitespace: any whitespace run containing a newline → "\n";
   any other whitespace run (including NBSP from &nbsp;) → " "; strip ends.

Pure function of the input bytes; no I/O, no globals mutated.

Implementation note (round 2): ``extract_text`` first tries a FAST-PATH
tokenizer (one compiled regex per construct, ~6× less allocation than
stdlib HTMLParser's goahead loop — the memory-bandwidth hog limiting 8→32
CPU scaling). The fast path accepts a conservative, well-understood subset
of HTML on which it is EXACTLY equivalent to the HTMLParser semantics
above, and returns None (→ HTMLParser fallback) on anything else: stray
'<', '<![' marked sections, unterminated comments/PIs, malformed tags,
unclean CDATA closes. Equivalence is enforced three ways: the committed
byte-identity goldens, a fast-vs-HTMLParser property test across the
fixture generator space, and adversarial construct tests
(tests/test_extract.py). The frozen OUTPUT semantics are unchanged.
"""

from __future__ import annotations

import codecs
import re
from html import unescape
from html.parser import HTMLParser

_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-:.]+)""", re.IGNORECASE
)

# Block-level elements (HTML5 flow content that implies a line break) plus
# structural/void elements that visually separate text.
BLOCK_TAGS = frozenset(
    """address article aside blockquote body br caption dd details dialog div
    dl dt fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 head header
    hgroup hr html li main menu nav ol option p pre section select summary
    table tbody td tfoot th thead title tr ul""".split()
)
SKIP_TAGS = frozenset({"script", "style", "template"})

_WS_WITH_NL = re.compile(r"\s*\n\s*")
_WS_RUN = re.compile(r"[^\S\n]+")
def _normalize_ws(text: str) -> str:
    """C-speed equivalent of ``_WS_RUN.sub(" ", _WS_WITH_NL.sub("\\n",
    text)).strip()`` (frozen semantics: a maximal whitespace run becomes
    "\\n" if it contains a newline, else " "; ends stripped). str.split()'s
    whitespace set is Py_UNICODE_ISSPACE — identical to re's \\s — so
    splitting lines on "\\n", collapsing each line's runs with
    " ".join(seg.split()), and dropping empty lines reproduces the regex
    pipeline exactly (property-tested in tests/test_extract.py) at ~20×
    the throughput: the regex form stepped char-by-char through every
    single inter-word space."""
    return "\n".join(filter(None, (" ".join(seg.split()) for seg in text.split("\n"))))


def sniff_charset(html: bytes) -> str:
    """Declared charset from the document head, or utf-8."""
    m = _CHARSET_RE.search(html[:2048])
    if m:
        name = m.group(1).decode("ascii", "replace").strip().lower()
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            pass
    return "utf-8"


def decode_html(html: bytes) -> str:
    return html.decode(sniff_charset(html), errors="replace")


class _TextParser(HTMLParser):
    __slots__ = ("parts", "_skip")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip += 1
        elif tag in BLOCK_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            if self._skip:
                self._skip -= 1
        elif tag in BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data: str) -> None:
        if not self._skip:
            self.parts.append(data)


# --- fast-path tokenizer (exact on its accepted subset; None = bail) -------

# conservative start tag: simple name, optionally-valued attrs with quoted
# values allowed to contain '>', optional self-closing slash directly
# before '>' — anything else bails to HTMLParser
_FAST_START = re.compile(
    r"<([a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"((?:\s+[^\s<>\"'=/]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s<>\"'`=]+))?)*)"
    r"\s*(/?)>"
)
_FAST_END = re.compile(r"</([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in ("script", "style")
}


def _fast_parts(s: str) -> list[str] | None:
    """Tokenize ``s`` exactly as _TextParser would, or return None if any
    construct falls outside the verified-equivalent subset."""
    parts: list[str] = []
    append = parts.append
    skip = 0
    i = 0
    n = len(s)
    find = s.find
    while i < n:
        lt = find("<", i)
        if lt < 0:
            if not skip:
                chunk = s[i:]
                append(unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > i and not skip:
            chunk = s[i:lt]
            append(unescape(chunk) if "&" in chunk else chunk)
        nxt = s[lt + 1] if lt + 1 < n else ""
        if nxt == "/":
            m = _FAST_END.match(s, lt)
            if m is None:
                return None
            tag = m.group(1).lower()
            if tag in SKIP_TAGS:
                if skip:
                    skip -= 1
            elif tag in BLOCK_TAGS:
                append("\n")
            i = m.end()
        elif nxt == "!":
            if s.startswith("<!--", lt):
                end = find("-->", lt + 4)
                if end < 0:
                    return None
                i = end + 3
            elif s.startswith("<![", lt):
                return None  # marked section — HTMLParser-specific handling
            else:
                # doctype or bogus comment: both scan to '>' and emit nothing
                end = find(">", lt + 2)
                if end < 0:
                    return None
                i = end + 1
        elif nxt == "?":
            end = find(">", lt + 2)  # processing instruction: scan to '>'
            if end < 0:
                return None
            i = end + 1
        elif nxt.isalpha() and nxt.isascii():
            m = _FAST_START.match(s, lt)
            if m is None:
                return None
            tag = m.group(1).lower()
            selfclosing = bool(m.group(3))
            i = m.end()
            if selfclosing:
                if tag in BLOCK_TAGS:
                    append("\n")
                continue
            if tag in SKIP_TAGS:
                skip += 1
                if tag in _CDATA_CLOSE:
                    # script/style content is CDATA: raw until a clean
                    # matching close tag (anything murkier bails)
                    mc = _CDATA_CLOSE[tag].search(s, i)
                    if mc is None:
                        break  # unterminated: rest is raw data, suppressed
                    if skip:
                        skip -= 1
                    i = mc.end()
            elif tag in BLOCK_TAGS:
                append("\n")
        else:
            return None  # stray '<' — HTMLParser emits it as data; bail
    return parts


def _slow_parts(decoded: str) -> list[str]:
    """The frozen reference path: stdlib HTMLParser."""
    parser = _TextParser()
    try:
        parser.feed(decoded)
        parser.close()
    except Exception:
        # HTMLParser almost never raises; if it does, fall back to a
        # deterministic tag-strip so the pipeline never loses a row.
        raw = re.sub(r"(?is)<(script|style|template)\b.*?</\1\s*>", " ", decoded)
        parser.parts = [re.sub(r"<[^>]*>", "\n", raw)]
    return parser.parts


def extract_text(html: bytes | None) -> str:
    """bytes → canonical extracted text. Pure and deterministic; a null or
    non-bytes value yields "" (the pipeline never loses a row)."""
    if not html:
        return ""
    try:
        decoded = decode_html(html)
    except Exception:
        decoded = bytes(html).decode("latin-1", errors="replace")
    parts = _fast_parts(decoded)
    if parts is None:
        parts = _slow_parts(decoded)
    return _normalize_ws("".join(parts))
