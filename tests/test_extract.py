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
