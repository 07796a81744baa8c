"""Extractor unit + byte-identity golden tests (BASELINE.json:15)."""

import os

import pyarrow.parquet as pq
import pytest

from aarhus_ray.extract import extract_text, sniff_charset

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extracted.parquet")


def test_strips_script_style_template():
    h = (
        b"<html><body><script>var x = 'hidden';</script><style>.a{}</style>"
        b"<template><p>tmpl</p></template><p>visible words</p></body></html>"
    )
    assert extract_text(h) == "visible words"


def test_comments_dropped():
    assert extract_text(b"<p>a</p><!-- secret words --><p>b</p>") == "a\nb"


def test_entities_unescaped():
    assert extract_text(b"<p>a &amp; b &#x263a; caf&eacute;</p>") == "a & b ☺ caf\xe9"


def test_nbsp_collapses_to_space():
    assert extract_text(b"<p>a&nbsp;&nbsp;b</p>") == "a b"


def test_block_boundaries_newline():
    h = b"<div>one<span> two</span></div><p>three</p>four<br>five"
    assert extract_text(h) == "one two\nthree\nfour\nfive"


def test_whitespace_runs_collapse():
    assert extract_text(b"<p>  a \t\t b\n\n   c  </p>") == "a b\nc"


def test_attr_with_gt_in_quotes():
    assert extract_text(b'<div data-x="a > b">ok</div>') == "ok"


def test_unclosed_tags():
    assert extract_text(b"<p>one<p>two") == "one\ntwo"


def test_charset_sniff_latin1():
    h = '<html><head><meta charset="iso-8859-1"></head><body><p>caf\xe9</p></body></html>'.encode(
        "iso-8859-1"
    )
    assert sniff_charset(h) == "iso-8859-1"
    assert extract_text(h) == "caf\xe9"


def test_bad_utf8_replaced_deterministically():
    h = b"<p>ok \xff\xfe bytes</p>"
    out = extract_text(h)
    assert out == "ok �� bytes"


def test_empty_body():
    assert extract_text(b"<html><head><title></title></head><body></body></html>") == ""
    assert extract_text(b"") == ""


def test_deterministic():
    h = b"<html><body><p>same input</p></body></html>"
    assert extract_text(h) == extract_text(h)


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="goldens not generated yet")
def test_extract_golden_byte_identity():
    """The frozen conformance check: extractor output must be byte-identical
    per url to the committed golden, forever (SURVEY.md §5.1)."""
    from aarhus_ray import fixtures

    golden = pq.read_table(GOLDEN)
    pages = fixtures.gen_pages(1000, seed=42)
    # recompute text from html for every golden url (first occurrence wins a
    # url collision here; the golden holds the DEDUP winner, so map url→html
    # by (url, max warc_ts, tie: text hash) like the pipeline does)
    import numpy as np

    from aarhus_ray.partition import hash64_column, normalize_url

    urls = np.asarray([normalize_url(u) for u in pages["url"].to_pylist()], dtype=object)
    ts = pages["warc_ts"].cast("int64").to_numpy(zero_copy_only=False)
    texts = pages["text"].to_pylist()
    htmls = pages["html"].to_pylist()
    order = np.lexsort((hash64_column(texts), ts, urls))
    winner_html = {}
    for i in order:  # later (url,ts) overwrites → winner = max ts
        winner_html[urls[i]] = htmls[i]
    for url, want in zip(golden["url"].to_pylist(), golden["text"].to_pylist()):
        got = extract_text(winner_html[url])
        assert got == want, f"extraction drift for {url}"


def test_ws_normalize_matches_regex_reference():
    """_normalize_ws (C-speed str.split construction) must equal the frozen
    two-regex semantics on arbitrary whitespace soup."""
    import random

    from aarhus_ray.extract import _WS_RUN, _WS_WITH_NL, _normalize_ws

    rng = random.Random(7)
    chars = list("ab c\t\n\r\f\v\xa0 xyz  \n\n   ")
    for _ in range(5000):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 50)))
        want = _WS_RUN.sub(" ", _WS_WITH_NL.sub("\n", s)).strip()
        assert _normalize_ws(s) == want, repr(s)


def _slow_extract(html: bytes) -> str:
    from aarhus_ray.extract import _normalize_ws, _slow_parts, decode_html

    try:
        decoded = decode_html(html)
    except Exception:
        decoded = bytes(html).decode("latin-1", errors="replace")
    return _normalize_ws("".join(_slow_parts(decoded)))


def test_fast_path_equals_htmlparser_on_fixture_space():
    """The fast tokenizer must be byte-identical to the frozen HTMLParser
    path across the fixture generator space (different seeds than the
    goldens) — the fast path either agrees exactly or bails."""
    import numpy as np

    from aarhus_ray import fixtures
    from aarhus_ray.extract import extract_text

    for seed in (3, 11, 29):
        rng = np.random.RandomState(seed)
        vocab = [f"w{j}" for j in range(150)]
        for di in range(60):
            toks = [vocab[rng.randint(len(vocab))] for _ in range(rng.randint(5, 120))]
            h, latin1 = fixtures._doc_html(rng, toks, di)
            raw = h.encode("iso-8859-1" if latin1 else "utf-8", errors="replace")
            assert extract_text(raw) == _slow_extract(raw)


def test_fast_path_equals_htmlparser_on_adversarial_constructs():
    from aarhus_ray.extract import extract_text

    adversarial = [
        b"a < b and c > d", b"<p>x &amp; y &#65; &#x42; &unknown; &lt</p>",
        b"<script>if (a<b) { x = '</div>'; }</script>visible",
        b"<SCRIPT>1<2</SCRIPT>after", b"<script>no close ever",
        b"<script></scriptx></script>post", b"<script></script foo></script>post",
        b"<style>p>b{}</style>t", b"<template><p>hid</p><script>h2</script></template>ok",
        b"<!-- c1 --><p>t</p><!-- unterminated", b"<!doctype html><p>x</p>",
        b"<![CDATA[raw]]><p>y</p>", b"<?php echo '>' ?><p>z</p>",
        b"<div data-x='a > b'>edge</div>", b'<div data-x="a > b">edge</div>',
        b"<br/><br /><hr></p ><p  >text", b"</><p>q</p>", b"<3 hearts",
        b"<p\tclass=x\n>multi</p>", b"<p>unclosed", b"", b"plain",
        b"<p>trailing amp &", b"<p>&#xZZ;</p>", b"<meta charset='nope-enc'><p>a</p>",
        b"<p>a</p \t>", b"<a href=plain>t</a>", b"<p/>x<script/>y<template/>z",
        b"<p>a<![if]>b</p>", b"<EM>caps</EM><DIV>D</DIV>",
    ]
    for h in adversarial:
        assert extract_text(h) == _slow_extract(h), h
