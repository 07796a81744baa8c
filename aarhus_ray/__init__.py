"""aarhus_ray — a Ray-Data-native inverted-index builder + BM25 query engine.

From-scratch rebuild of the capabilities of ``mikedelong/aarhus`` (reference
checkout at /root/reference is empty in this sandbox; the authoritative
contract is /root/repo/BASELINE.json — see SURVEY.md §0). Everything here is
built on public Ray Data / PyArrow APIs only.

Layout
------
- ``schemas``    : declared pyarrow schemas for every logical table (SURVEY §1.1)
- ``extract``    : canonical, frozen HTML→text extractor (stdlib only)
- ``textnorm``   : frozen NFKC+casefold normalizer and regex tokenizer
- ``codecs``     : delta / Stream-VByte / LEB128 varint / block-max skip kernels
- ``bm25``       : Okapi BM25 (k1=1.2, b=0.75, Lucene idf) + brute-force scorer
- ``wand``       : Block-Max WAND top-k over encoded posting lists
- ``partition``  : deterministic url-hash partitioner + doc_id scheme
- ``fixtures``   : deterministic synthetic `pages`/`queries` generator (seed 42)
- ``stages/``    : Ray Data map_batches UDFs (stateless fns + actor-pool classes)
- ``sources/``   : parquet readers, segment writer/reader
- ``pipelines/`` : build_index / query_index end-to-end Dataset pipelines
- ``functions/`` : generic data-processing ops (dedup family, ANN, text stats)
- ``state/``     : manifest / checkpoint / resume

Library code never calls ``ray.init()`` / ``ray.shutdown()`` — sessions are
owned by the driver, ``bench.py``, CLI entry points and the pytest fixture.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
SKIP_BLOCK = 128  # postings per block-max skip block
