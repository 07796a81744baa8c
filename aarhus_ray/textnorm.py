"""Frozen text normalization + tokenization (BASELINE.json:6 "tokenization").

Frozen v1 semantics (SURVEY.md §2.2): NFKC normalize, casefold, then tokens
are maximal runs of ``[a-z0-9]+``. No stemming, no stopword removal — any
change here changes doc lengths, dfs and therefore the top-k goldens.

Query text goes through exactly the same code objects (SURVEY.md §3.2 —
"MUST be the same code objects").
"""

from __future__ import annotations

import re
import unicodedata

TOKEN_RE = re.compile(r"[a-z0-9]+")


def normalize_text(text: str) -> str:
    return unicodedata.normalize("NFKC", text).casefold()


def tokenize(text: str) -> list[str]:
    """Normalized-then-tokenized terms of one document or query."""
    return TOKEN_RE.findall(normalize_text(text))


def tokenize_batch(texts) -> list[list[str]]:
    """Vectorized-ish helper: tokenize an iterable of strings."""
    norm = unicodedata.normalize
    find = TOKEN_RE.findall
    return [find(norm("NFKC", t).casefold()) if t else [] for t in texts]
