"""Deterministic synthetic `pages` + `queries` fixtures (FIXTURES.md F1/F2).

The reference corpus is absent (SURVEY.md §0); this generator + the committed
goldens produced from it ARE the conformance corpus. Everything is a pure
function of (n, seed) — numpy legacy RandomState (stable bit-stream across
numpy versions), no wall clock, no external data.

The html exercises the extractor: nested block/inline tags, <script>/<style>/
<template> bodies, comments, named+numeric entities, attributes containing
'>', unclosed tags, a declared-charset (latin-1) case with non-UTF8 bytes,
whitespace runs, empty bodies. Term stream is Zipfian with a stopword head
(what exercises salted-key skew splitting, SURVEY.md §4.2).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .extract import extract_text
from . import schemas

STOPWORDS = (
    "the a of and to in is for on with as by at from it that this was are be or an".split()
)
VOCAB_SIZE = 10_000
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in microseconds
YEAR_US = 365 * 24 * 3600 * 1_000_000
LANGS = np.array(["en", "es", "de", "da", "zh"])
LANG_P = np.array([0.70, 0.10, 0.08, 0.07, 0.05])


def _vocab() -> list[str]:
    return STOPWORDS + [f"term{i:05d}" for i in range(VOCAB_SIZE)]


def _zipf_tokens(rng: np.random.RandomState, n: int, vocab: list[str]) -> np.ndarray:
    ranks = rng.zipf(1.25, size=n)
    ranks = np.minimum(ranks, len(vocab)) - 1
    return np.asarray(vocab, dtype=object)[ranks]


def _doc_html(rng: np.random.RandomState, tokens: list[str], doc_idx: int) -> tuple[str, bool]:
    """Build one html document; returns (html_str, wants_latin1)."""
    feats = rng.random_sample(8)
    paras: list[str] = []
    title_words = tokens[:4] if tokens else ["untitled"]
    chunk = max(8, int(rng.randint(10, 40)))
    for i in range(0, len(tokens), chunk):
        words = " ".join(tokens[i : i + chunk])
        if feats[0] < 0.3 and i == 0:
            words = f"<b>{words[: len(words) // 2]}</b> {words[len(words) // 2 :]}"
        paras.append(f"<p>{words}</p>")
    body = "\n".join(paras)
    inserts = []
    if feats[1] < 0.35:
        inserts.append("<script type='text/javascript'>var x = 1 < 2; junkword();</script>")
    if feats[2] < 0.25:
        inserts.append("<style>.c { color: red; }</style>")
    if feats[3] < 0.10:
        inserts.append("<template><p>hidden template words</p></template>")
    if feats[4] < 0.30:
        inserts.append("<!-- a comment with words inside -->")
    if feats[5] < 0.25:
        body += "<div>caf&eacute; &amp; tea &#x263a;&nbsp;always</div>"
    if feats[6] < 0.15:
        body += '<div data-x="a > b">attr edge</div><p>unclosed paragraph'
    if feats[7] < 0.10:
        body = "   \t \n\n " + body + "  \n \t  "
    latin1 = doc_idx % 97 == 3  # deterministic ~1% declared-charset docs
    charset = "iso-8859-1" if latin1 else "utf-8"
    accent = " caf\xe9 r\xe9sum\xe9" if latin1 else ""
    html = (
        f'<html><head><meta charset="{charset}"><title>{" ".join(title_words)}</title></head>'
        f"<body>{''.join(inserts)}{body}{accent}</body></html>"
    )
    return html, latin1


def gen_pages(n: int, seed: int = 42, avg_tokens: int = 80, url_offset: int = 0) -> pa.Table:
    """Deterministic pages table (schema PAGES). ~3% duplicate urls with a
    later warc_ts and different html (dedup winner = max warc_ts).
    ``avg_tokens`` scales page size: goldens/tests use the default 80;
    benchmarks use ~400 to approximate real Common-Crawl page weight so the
    build is extraction-compute-bound, not coordination-bound."""
    rng = np.random.RandomState(seed)
    vocab = _vocab()
    n_sites = max(4, n // 50)
    doclens = np.clip(
        np.exp(rng.normal(np.log(float(avg_tokens)), 1.0, size=n)), 20, 25 * avg_tokens
    ).astype(np.int64)
    all_tokens = _zipf_tokens(rng, int(doclens.sum()), vocab)
    offsets = np.concatenate([[0], np.cumsum(doclens)])
    ts = BASE_TS_US + rng.randint(0, YEAR_US, size=n).astype(np.int64)
    langs = LANGS[rng.choice(len(LANGS), size=n, p=LANG_P)]

    urls, tss, htmls, texts, lang_out = [], [], [], [], []
    for i in range(n):
        toks = list(all_tokens[offsets[i] : offsets[i + 1]])
        if i % 211 == 7:  # deterministic ~0.5% empty-body docs
            toks = []
        html, latin1 = _doc_html(rng, toks, i)
        raw = html.encode("iso-8859-1" if latin1 else "utf-8", errors="replace")
        urls.append(f"https://site{(i + url_offset) % n_sites}.example/p/{i + url_offset}")
        tss.append(int(ts[i]))
        htmls.append(raw)
        texts.append(extract_text(raw))
        lang_out.append(str(langs[i]))

    # ~3% recrawled urls: same url, strictly later warc_ts, different html.
    n_dup = max(1, int(0.03 * n)) if n >= 10 else 0
    dup_idx = rng.choice(n, size=n_dup, replace=False) if n_dup else []
    for j, i in enumerate(dup_idx):
        toks = list(_zipf_tokens(rng, int(rng.randint(20, 200)), vocab))
        html, latin1 = _doc_html(rng, toks, n + j)
        raw = html.encode("iso-8859-1" if latin1 else "utf-8", errors="replace")
        urls.append(urls[i])
        tss.append(int(tss[i]) + 1 + int(rng.randint(0, 10_000_000)))
        htmls.append(raw)
        texts.append(extract_text(raw))
        lang_out.append(lang_out[i])

    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang_out, pa.string()),
        }
    )
    schemas.validate(table, schemas.PAGES)
    return table


def gen_queries(n: int, seed: int = 42) -> pa.Table:
    """Deterministic query set (FIXTURES.md F2) with edge cases: OOV terms,
    all-OOV, duplicate terms, heavy+rare mixes, entity/mixed-case text."""
    rng = np.random.RandomState(seed + 1)
    vocab = _vocab()
    texts = []
    for qid in range(n):
        kind = qid % 10
        if kind == 0:
            texts.append(vocab[len(STOPWORDS) + int(rng.randint(5000, VOCAB_SIZE))])  # rare
        elif kind == 1:
            texts.append(STOPWORDS[int(rng.randint(0, len(STOPWORDS)))])  # heavy
        elif kind == 2:  # heavy + rare mix
            texts.append(
                f"{STOPWORDS[int(rng.randint(0, len(STOPWORDS)))]} "
                f"{vocab[len(STOPWORDS) + int(rng.randint(3000, VOCAB_SIZE))]}"
            )
        elif kind == 3:
            texts.append("zzznotinvocab " + str(_zipf_tokens(rng, 1, vocab)[0]))  # OOV + known
        elif kind == 4:
            texts.append("zzznotinvocab qqqalsomissing")  # all-OOV → empty result
        elif kind == 5:
            t = str(_zipf_tokens(rng, 1, vocab)[0])
            texts.append(f"{t} {t} {t}")  # duplicate terms
        elif kind == 6:
            t = _zipf_tokens(rng, 3, vocab)
            texts.append(" ".join(t).upper())  # mixed case
        elif kind == 7:
            t = _zipf_tokens(rng, 2, vocab)
            texts.append(f"{t[0]}&nbsp;{t[1]}")  # entity-bearing (query-side normalize)
        else:
            t = _zipf_tokens(rng, int(rng.randint(1, 6)), vocab)
            texts.append(" ".join(t))
    return pa.table(
        {"query_id": pa.array(range(n), pa.int64()), "text": pa.array(texts, pa.string())}
    )


_PARALLEL_GEN_THRESHOLD = 50_000


def _gen_shard(args) -> str:
    out_dir, i, n_shard, shard_seed, avg_tokens, url_offset = args
    # url_offset keeps urls globally unique across shards (shard-local
    # indices would collide and dedup would silently shrink the corpus)
    table = gen_pages(n_shard, shard_seed, avg_tokens=avg_tokens, url_offset=url_offset)
    path = os.path.join(out_dir, f"part-{i:04d}.parquet")
    pq.write_table(table, path, row_group_size=1024)
    return path


def write_pages_dir(
    out_dir: str, n: int, seed: int = 42, rows_per_file: int = 25_000, avg_tokens: int = 80
) -> str:
    """Write the pages fixture as a directory of parquet shards (multiple
    files → multiple read blocks for Ray; small row groups so
    override_num_blocks can split further). Idempotent: skips if complete.

    Corpora >= 50k pages generate shards in PARALLEL with per-shard derived
    seeds (still fully deterministic for a given (n, seed, avg_tokens) —
    but a different byte stream than the single-pass generator, so
    golden/test corpora below the threshold are unaffected)."""
    marker = f"n={n} seed={seed} avg_tokens={avg_tokens}\n"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        with open(done) as f:
            if f.read() == marker:
                return out_dir
        # parameters changed → regenerate from scratch
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if n >= _PARALLEL_GEN_THRESHOLD:
        # spawn (not fork): callers may hold a live Ray session whose
        # gRPC/background threads make fork-inherited locks deadlock-prone
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        nf = max(1, (n + rows_per_file - 1) // rows_per_file)
        per = (n + nf - 1) // nf
        jobs = [
            (out_dir, i, min(per, n - i * per), seed + 7919 * (i + 1), avg_tokens, i * per)
            for i in range(nf)
            if min(per, n - i * per) > 0
        ]
        with ctx.Pool(min(16, len(jobs))) as pool:
            pool.map(_gen_shard, jobs)
    else:
        table = gen_pages(n, seed, avg_tokens=avg_tokens)
        nf = max(1, (len(table) + rows_per_file - 1) // rows_per_file)
        per = (len(table) + nf - 1) // nf
        for i in range(nf):
            pq.write_table(
                table.slice(i * per, per),
                os.path.join(out_dir, f"part-{i:04d}.parquet"),
                row_group_size=1024,
            )
    with open(done, "w") as f:
        f.write(marker)
    return out_dir
