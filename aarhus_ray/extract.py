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
"""

from __future__ import annotations

import codecs
import re
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


def extract_text(html: bytes | None) -> str:
    """bytes → canonical extracted text. Pure and deterministic; a null or
    non-bytes value yields "" (the pipeline never loses a row)."""
    if not html:
        return ""
    parser = _TextParser()
    try:
        decoded = decode_html(html)
    except Exception:
        decoded = bytes(html).decode("latin-1", errors="replace")
    try:
        parser.feed(decoded)
        parser.close()
    except Exception:
        # HTMLParser almost never raises; if it does, fall back to a
        # deterministic tag-strip so the pipeline never loses a row.
        raw = re.sub(r"(?is)<(script|style|template)\b.*?</\1\s*>", " ", decoded)
        parser.parts = [re.sub(r"<[^>]*>", "\n", raw)]
    text = "".join(parser.parts)
    text = _WS_WITH_NL.sub("\n", text)
    text = _WS_RUN.sub(" ", text)
    return text.strip()
