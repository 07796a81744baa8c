"""Property tests for the encoding kernels (SURVEY.md §5.2)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aarhus_ray import codecs


uint64s = st.integers(min_value=0, max_value=2**63 - 1)


@given(st.lists(uint64s, max_size=400))
@settings(max_examples=60, deadline=None)
def test_svb_roundtrip(xs):
    v = np.array(xs, dtype=np.uint64)
    assert np.array_equal(codecs.svb_decode(codecs.svb_encode(v), len(v)), v)


@given(st.lists(uint64s, max_size=400))
@settings(max_examples=60, deadline=None)
def test_varint_roundtrip(xs):
    v = np.array(xs, dtype=np.uint64)
    assert np.array_equal(codecs.varint_decode(codecs.varint_encode(v)), v)


@given(st.lists(uint64s, min_size=1, max_size=400), st.integers(0, 2**40))
@settings(max_examples=60, deadline=None)
def test_delta_roundtrip(xs, base):
    v = np.unique(np.array(xs, dtype=np.uint64))
    v = v[v >= base]
    if len(v) == 0:
        return
    assert np.array_equal(codecs.delta_decode(codecs.delta_encode(v, base), base), v)


@given(
    st.lists(st.integers(0, 2**50), min_size=1, max_size=600),
    st.lists(st.integers(1, 1000), min_size=600, max_size=600),
)
@settings(max_examples=40, deadline=None)
def test_postings_roundtrip(ids, tfs):
    doc_ids = np.unique(np.array(ids, dtype=np.uint64))
    tf = np.array(tfs[: len(doc_ids)], dtype=np.uint64)
    blob, skips = codecs.encode_postings(doc_ids, tf)
    d, t = codecs.decode_postings(blob, skips)
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tf)


def test_skip_entries_shape_and_bounds():
    n = 1000
    rng = np.random.RandomState(7)
    doc_ids = np.cumsum(rng.randint(1, 50, size=n).astype(np.uint64))
    tfs = rng.randint(1, 30, size=n).astype(np.uint64)
    idf = 2.0
    blob, skips_b = codecs.encode_postings(doc_ids, tfs)
    skips = np.frombuffer(skips_b, dtype=codecs.SKIP_DTYPE)
    assert len(skips) == (n + codecs.SKIP_BLOCK - 1) // codecs.SKIP_BLOCK
    assert int(skips[-1]["last_doc_id"]) == int(doc_ids[-1])
    assert int(skips["count"].sum()) == n
    # every block decodes independently given the previous block's last id
    prev = 0
    pos = 0
    for bi, e in enumerate(skips):
        d, t = codecs.decode_block(blob, skips, bi, prev)
        assert np.array_equal(d, doc_ids[pos : pos + int(e["count"])])
        assert np.array_equal(t, tfs[pos : pos + int(e["count"])])
        # block max_tf bounds every tf; derived score bound is monotone in tf
        assert int(e["max_tf"]) == int(np.max(t))
        ub = codecs.tf_upper_bound(t, idf)
        assert float(codecs.tf_upper_bound(int(e["max_tf"]), idf)) >= float(np.max(ub)) - 1e-12
        prev = int(e["last_doc_id"])
        pos += int(e["count"])


def test_svb_sizes():
    # 1-2-4-8 length mapping
    v = np.array([0, 255, 256, 65535, 65536, 2**32 - 1, 2**32], dtype=np.uint64)
    blob = codecs.svb_encode(v)
    n_control = (len(v) + 3) // 4
    assert len(blob) == n_control + 1 + 1 + 2 + 2 + 4 + 4 + 8
