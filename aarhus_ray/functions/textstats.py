"""Text-analysis operators over ``documents``: term counts, token counts,
language-ID heuristic, quality scoring, document fingerprinting. Each has a
frozen, SQL-mirrorable definition so the DuckDB oracle can replay it
exactly (documents.text is plain lowercase ASCII in the driver corpus)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..textnorm import tokenize_batch

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is")
LANG_MARKERS = (
    ("en", ("the", "and")),
    ("de", ("und", "der", "das")),
    ("es", ("el", "los", "que")),
    ("fr", ("le", "et", "les")),
)


def _docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def term_counts_top50(sf_dir: str) -> pd.DataFrame:
    """Global term frequencies, top 50 by (count DESC, term ASC). Partial
    counts per batch (vectorized np.unique) → small groupby(term) shuffle —
    the pre-aggregated plan; raw (term) rows never shuffle."""
    ds = _docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_batch(batch["text"].to_pylist())
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if t]) if any(toks) else np.empty(0, object)
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        terms, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {"term": pa.array(list(terms), pa.string()), "n": pa.array(counts, pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return (
        agg.sort_values(["n", "term"], ascending=[False, True]).head(50).reset_index(drop=True)
    )


def token_counts(sf_dir: str) -> pd.DataFrame:
    """Per-document token count under the frozen tokenizer."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        toks = tokenize_batch(batch["text"].to_pylist())
        n = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": pa.array(n, pa.int64())})

    out = ds.map_batches(count, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_id(sf_dir: str) -> pd.DataFrame:
    """Heuristic language ID with a FROZEN marker-token rule (first match in
    LANG_MARKERS order wins; else 'unk'). Deliberately simple so the oracle
    can replicate it with list_contains — the point is the Ray plumbing, not
    linguistic accuracy."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def classify(batch: pa.Table) -> pa.Table:
        # vectorized: one pc.is_in over the FLAT token array per language
        # (first match in LANG_MARKERS order wins — scatter per-lang doc
        # hits, assign unassigned docs in order); no per-token Python
        import pyarrow.compute as pc

        from ..textnorm import tokenize_flat

        n = len(batch)
        flat, flat_docs, _ = tokenize_flat(batch["text"], np.arange(n, dtype=np.uint64))
        rows = flat_docs.astype(np.int64)
        preds = np.full(n, "unk", dtype=object)
        assigned = np.zeros(n, dtype=bool)
        for lang, markers in LANG_MARKERS:
            m = pc.is_in(flat, value_set=pa.array(markers, pa.string())).to_numpy(
                zero_copy_only=False
            )
            has = np.zeros(n, dtype=bool)
            has[rows[m]] = True
            sel = has & ~assigned
            preds[sel] = lang
            assigned |= sel
        return pa.table({"doc_id": batch["doc_id"], "pred_lang": pa.array(preds.tolist(), pa.string())})

    out = ds.map_batches(classify, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_scores(sf_dir: str) -> pd.DataFrame:
    """Per-doc quality features: token count, char count, stopword count
    (frozen EN stopword set), distinct-token count. All integers → exact
    oracle comparison."""
    ds = _docs(sf_dir, ["doc_id", "text", "n_chars"])
    stop_arr = pa.array(sorted(STOPWORDS_EN), pa.string())

    def score(batch: pa.Table) -> pa.Table:
        # vectorized over the FLAT token array: stopword hits via one
        # pc.is_in + bincount; distinct tokens via an Arrow group_by over
        # (row, term) pairs — no per-token Python loops
        import pyarrow.compute as pc

        from ..textnorm import tokenize_flat

        n = len(batch)
        flat, flat_docs, n_tok = tokenize_flat(batch["text"], np.arange(n, dtype=np.uint64))
        rows = flat_docs.astype(np.int64)
        sm = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(rows[sm], minlength=n)
        uniq = (
            pa.table({"row": pa.array(rows, pa.int64()), "term": flat})
            .group_by(["row", "term"])
            .aggregate([])
        )
        n_distinct = np.bincount(
            uniq["row"].to_numpy(zero_copy_only=False), minlength=n
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "n_chars": batch["n_chars"],
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def fingerprints(sf_dir: str) -> pd.DataFrame:
    """Per-doc content fingerprint = md5 hex of the raw text bytes (md5 so
    the DuckDB oracle can compute the identical value)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(hs, pa.string())})

    out = ds.map_batches(fp, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_counts(sf_dir: str) -> pd.DataFrame:
    """Row counts per declared lang (simple groupby sanity op)."""
    out = (
        _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


TA_SHARDS = 8  # terms-agg error-bound demo: shard count (doc routing = doc_id % S)
TA_SHARD_SIZE = 3  # per-shard truncation (ES shard_size)


def terms_agg_error_bounds(sf_dir: str) -> pd.DataFrame:
    """ES ``terms`` aggregation WITH its distributed approximation
    contract made exact: each of TA_SHARDS shards (routing = doc_id %
    TA_SHARDS — deterministic, so the whole computation is a pure
    function of the table) returns only its top-TA_SHARD_SIZE langs by
    (count DESC, lang ASC); the coordinator sums the counts it received
    per candidate and reports ``doc_count_error_upper_bound`` = Σ over
    non-reporting shards of that shard's LAST-included count — exactly
    ES's bound (a missing term can hide at most just-below-the-cut in
    each shard that didn't report it). Distributed part: per-batch
    (shard, lang) partials → groupby sum (≤ S×|langs| rows ever
    shuffle); the truncation+merge runs on that aggregate-sized result.
    Output (lang, doc_count, doc_count_error_upper_bound) for the merged
    candidates, sorted by (doc_count DESC, lang ASC) — doc_count is the
    RECEIVED sum, deliberately below the true count when a shard
    truncated the lang away, exactly as ES returns it."""
    ds = _docs(sf_dir, ["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "shard": batch["doc_id"].to_numpy(zero_copy_only=False) % TA_SHARDS,
                "lang": batch["lang"].to_pylist(),
            }
        )
        g = df.groupby(["shard", "lang"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "shard": pa.array(g["shard"].to_numpy(), pa.int64()),
                "lang": pa.array(g["lang"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["shard", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    # coordinator-side truncation + merge on the S×|langs|-sized aggregate
    counts = counts.sort_values(["shard", "n", "lang"], ascending=[True, False, True])
    per_shard = counts.groupby("shard", sort=True)
    reported = per_shard.head(TA_SHARD_SIZE)
    # a shard that returned ALL its terms (≤ shard_size distinct) hides
    # nothing — its error contribution is 0, exactly ES's rule; only a
    # TRUNCATED shard can hide a term just below its last-included count
    cut = {
        int(s): (int(g["n"].head(TA_SHARD_SIZE).iloc[-1]) if len(g) > TA_SHARD_SIZE else 0)
        for s, g in per_shard
    }
    rows = []
    for lang, g in reported.groupby("lang", sort=True):
        got = set(g["shard"].astype(int))
        err = sum(c for s, c in cut.items() if s not in got)
        rows.append((lang, int(g["n"].sum()), int(err)))
    out = pd.DataFrame(rows, columns=["lang", "doc_count", "doc_count_error_upper_bound"])
    return (
        out.sort_values(["doc_count", "lang"], ascending=[False, True]).reset_index(drop=True)
    )


CT_K = 4  # categorize_text signature length (first K distinct non-numeric tokens)


def categorize_text(sf_dir: str) -> pd.DataFrame:
    """ES ``categorize_text`` aggregation in a frozen deterministic
    contract: a doc's CATEGORY is its first CT_K distinct tokens that
    contain no digit, joined by one space (ES's categorizer likewise
    drops numeric tokens — the variable parts of log-like messages — and
    keys on the leading stable tokens; its token-weight clustering is
    replaced by this exact rule so the oracle can replay it). Docs with
    no such token form the '' category. Pre-aggregated plan: per-batch
    (category, n_docs, min_doc_id) partials → small groupby(category)
    shuffle — raw per-doc rows never shuffle, so category cardinality
    (≪ corpus size on boilerplate-heavy web text) bounds the exchange.
    Output (category, n_docs, min_doc_id) sorted by category."""
    from ray.data.aggregate import Min

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks_per_doc = tokenize_batch(batch["text"].to_pylist())
        cats: list[str] = []
        for toks in toks_per_doc:
            sig: list[str] = []
            seen: set[str] = set()
            for tok in toks:
                if tok in seen or any(c.isdigit() for c in tok):
                    continue
                seen.add(tok)
                sig.append(tok)
                if len(sig) == CT_K:
                    break
            cats.append(" ".join(sig))
        df = pd.DataFrame(
            {"category": cats, "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("category", sort=False)["doc_id"].agg(["size", "min"]).reset_index()
        return pa.table(
            {
                "category": pa.array(g["category"], pa.string()),
                "n_docs": pa.array(g["size"].to_numpy(), pa.int64()),
                "min_doc_id": pa.array(g["min"].to_numpy(), pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("category")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Min("min_doc_id", alias_name="min_doc_id"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["min_doc_id"] = out["min_doc_id"].astype("int64")
    return out.sort_values("category").reset_index(drop=True)


_BPE_RE = None


def bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    """BPE-ish pre-tokenizer counts per doc: maximal runs of letters,
    digits, or other-non-space — the GPT-2-style word/number/punctuation
    split, simplified to what RE2 and Python's ASCII ``re`` agree on
    exactly (the driver corpus is ASCII — guarded by
    tests/test_functions.py::test_driver_corpus_is_ascii). Uses lower(),
    not NFKC+casefold, to mirror the SQL oracle's lower(text)."""
    import re

    global _BPE_RE
    if _BPE_RE is None:
        _BPE_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]+", re.ASCII)

    def count(batch: pa.Table) -> pa.Table:
        pat = _BPE_RE
        n = [len(pat.findall(t.lower())) if t else 0 for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_bpe_tokens": pa.array(n, pa.int64())}
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(count, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_WINNOW_CACHE: dict[str, int] = {}


def winnow_fingerprints(sf_dir: str, w: int = 4, shingle_n: int = 3) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS scheme): hash every ``shingle_n``-gram, slide a
    window of ``w`` consecutive shingle hashes, keep each window's minimum;
    the distinct minima are the fingerprint set. Guarantees any shared run
    of >= w+shingle_n-1 tokens yields a shared fingerprint.

    Shingle hashing is md5-prefix (>>1 for int64 safety) so the WHOLE
    pipeline — including the rolling-window minima — replays exactly in
    DuckDB (window min + QUALIFY). Output per doc (with >= w shingles):
    fingerprint count and the smallest fingerprint."""
    import hashlib as _hashlib

    from ..textnorm import tokenize_batch

    def per_batch(batch: pa.Table) -> pa.Table:
        ids_out, nfp_out, minfp_out = [], [], []
        toks = tokenize_batch(batch["text"].to_pylist())
        for did, tk in zip(batch["doc_id"].to_pylist(), toks):
            n_sh = len(tk) - shingle_n + 1
            if n_sh < w:
                continue
            hs = np.empty(n_sh, dtype=np.int64)
            for i in range(n_sh):
                s = " ".join(tk[i : i + shingle_n])
                v = _WINNOW_CACHE.get(s)
                if v is None:
                    v = int(_hashlib.md5(s.encode()).hexdigest()[:16], 16) >> 1
                    _WINNOW_CACHE[s] = v
                hs[i] = v
            minima = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
            ids_out.append(did)
            nfp_out.append(len(np.unique(minima)))
            minfp_out.append(int(minima.min()))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_fp": pa.array(nfp_out, pa.int64()),
                "min_fp": pa.array(minfp_out, pa.int64()),
            }
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(per_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def stratified_sample(sf_dir: str, en_in_10: int = 3, other_in_10: int = 5) -> pd.DataFrame:
    """Deterministic stratified sampling: keep ``en_in_10``/10 of English
    docs and ``other_in_10``/10 of everything else, selected by
    ``doc_id % 10`` — fully reproducible, partition-local (zero shuffle),
    and trivially resumable, which is exactly what a training-data mixture
    pass needs (rate changes re-derive the same membership everywhere).
    Returns (doc_id, lang) of the sample."""
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        mod = pc.subtract(batch["doc_id"], pc.multiply(pc.divide(batch["doc_id"], 10), 10))
        is_en = pc.equal(batch["lang"], "en")
        lim = pc.if_else(is_en, pa.scalar(en_in_10, pa.int64()), pa.scalar(other_in_10, pa.int64()))
        return batch.filter(pc.less(pc.cast(mod, pa.int64()), lim)).select(["doc_id", "lang"])

    out = _docs(sf_dir, ["doc_id", "lang"]).map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# benchmark decontamination (the PaLM/GPT-3 n-gram contamination check)
# ---------------------------------------------------------------------------

# Frozen probe spec: (probe_idx, source doc_id, 1-based token start, length).
# Probes are drawn FROM the corpus deterministically so the check has
# guaranteed positives (the source doc, and its planted clone when the span
# survives truncation) and is exactly replayable in SQL via list_slice.
CONTAM_PROBES = ((0, 8, 4, 5), (1, 10, 11, 5), (2, 25, 2, 5))


def _probe_strings(sf_dir: str) -> list[tuple[int, str]]:
    import pyarrow.parquet as pq

    ids = sorted({src for _, src, _, _ in CONTAM_PROBES})
    t = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", ids)],
    )
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    out = []
    for pidx, src, start, length in CONTAM_PROBES:
        toks = tokenize_batch([texts[src]])[0]
        out.append((pidx, " ".join(toks[start - 1 : start - 1 + length])))
    return out


def contamination_flags(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination over documents (the PaLM/GPT-3-style
    n-gram overlap check every pretraining pipeline runs): flag every
    doc whose token stream CONTAINS any frozen probe n-gram. Probes are
    5-grams lifted deterministically from three corpus docs (CONTAM_
    PROBES), so the planted clones guarantee true positives. The probe
    list is tiny and rides in the task closure (the broadcast-small-side
    pattern); matching is one vectorized Arrow match_substring over the
    space-joined token strings per batch — contains(' p ', ' t1 .. tn ')
    ⟺ n-gram occurrence, the phrase-oracle idiom. Output (doc_id,
    probe_idx) sorted; a doc hit by several probes emits several rows.
    At 10^12 docs this is a pure streaming map — no shuffle at all."""
    import pyarrow.compute as pc

    probes = _probe_strings(sf_dir)

    def flag(batch: pa.Table) -> pa.Table:
        toks_per_doc = tokenize_batch(batch["text"].to_pylist())
        joined = pa.array(
            [" " + " ".join(t) + " " for t in toks_per_doc], pa.string()
        )
        ids = batch["doc_id"]
        out_ids: list[pa.Array] = []
        out_pidx: list[pa.Array] = []
        for pidx, p in probes:
            hit = pc.match_substring(joined, f" {p} ")
            sel = ids.filter(hit)
            out_ids.append(sel)
            out_pidx.append(pa.array([pidx] * len(sel), pa.int64()))
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_ids]
                ) if out_ids else pa.array([], pa.int64()),
                "probe_idx": pa.concat_arrays(out_pidx) if out_pidx else pa.array([], pa.int64()),
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .repartition(16)
        .map_batches(flag, batch_format="pyarrow")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["probe_idx"] = out["probe_idx"].astype("int64")
    return out.sort_values(["doc_id", "probe_idx"]).reset_index(drop=True)


def source_stats(sf_dir: str) -> pd.DataFrame:
    """Per-SOURCE corpus profile (the per-registered-domain accounting a
    CommonCrawl curation run keeps — which hosts dominate the corpus, by
    docs, bytes and tokens): n_docs / sum_chars / max_chars / sum_tokens
    per source. One vectorized partial per (batch, source) — token counts
    fold into per-source sums inside the map task — then a tiny
    groupby(source) shuffle of pre-aggregated rows; at 10^12 docs the
    shuffle volume is O(#distinct hosts), not O(docs)."""
    ds = _docs(sf_dir, ["source", "n_chars", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_batch(batch["text"].to_pylist())
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pylist(),
                "n_chars": batch["n_chars"].to_numpy(),
                "n_tokens": np.fromiter((len(t) for t in toks), np.int64, len(toks)),
            }
        )
        g = df.groupby("source", sort=False).agg(
            n_docs=("source", "size"),
            sum_chars=("n_chars", "sum"),
            max_chars=("n_chars", "max"),
            sum_tokens=("n_tokens", "sum"),
        ).reset_index()
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n_docs": pa.array(g["n_docs"].astype("int64"), pa.int64()),
                "sum_chars": pa.array(g["sum_chars"].astype("int64"), pa.int64()),
                "max_chars": pa.array(g["max_chars"].astype("int64"), pa.int64()),
                "sum_tokens": pa.array(g["sum_tokens"].astype("int64"), pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
            Max("max_chars", alias_name="max_chars"),
            Sum("sum_tokens", alias_name="sum_tokens"),
        )
        .to_pandas()
    )
    for c in ("n_docs", "sum_chars", "max_chars", "sum_tokens"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


# PII patterns (RE2 syntax — the SAME engine Arrow's *_substring_regex
# kernels and DuckDB's regexp_* functions compile, so one pattern string
# is the whole cross-engine contract). Kept deliberately simple: the op
# under test is the vectorized scan/redact plumbing, not regex recall.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\d{3}-\d{3}-\d{4}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# deterministic PII augmentation (the synthetic corpus carries no PII, so
# both engines plant the same strings by the same doc_id rule)
PII_PLANTS = (
    (7, " contact alice@example.com or bob.smith@mail.example.org today"),
    (11, " call 555-123-4567 now"),
    (13, " server 192.168.1.1 and 10.0.0.255 up"),
)


def pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII detection + redaction over documents — the scrub pass every
    public-web training corpus runs before tokenization: per doc, count
    email / phone / IPv4 matches and fingerprint the REDACTED text
    (matches replaced by <EMAIL>/<PHONE>/<IP>, email first so address
    innards can't re-match as phones or IPs). One streaming map, zero
    shuffle; every kernel is a compiled-RE2 Arrow compute call over the
    whole batch (count_substring_regex / replace_substring_regex) — no
    Python row loop anywhere. At 10^12 docs this is the shape you want:
    embarrassingly parallel, text never leaves its map task, output is 3
    int64 counts + a 32-byte fingerprint per doc."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        for mod, plant in PII_PLANTS:
            mask = pa.array(ids % mod == 0)
            text = pc.if_else(
                mask, pc.binary_join_element_wise(text, pa.scalar(plant), pa.scalar("")), text
            )
        n_email = pc.count_substring_regex(text, PII_EMAIL_RE)
        red = pc.replace_substring_regex(text, PII_EMAIL_RE, "<EMAIL>")
        n_phone = pc.count_substring_regex(red, PII_PHONE_RE)
        red = pc.replace_substring_regex(red, PII_PHONE_RE, "<PHONE>")
        n_ip = pc.count_substring_regex(red, PII_IP_RE)
        red = pc.replace_substring_regex(red, PII_IP_RE, "<IP>")
        fp = [hashlib.md5(s.encode()).hexdigest() for s in red.to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_email": pc.cast(n_email, pa.int64()),
                "n_phone": pc.cast(n_phone, pa.int64()),
                "n_ip": pc.cast(n_ip, pa.int64()),
                "red_fp": pa.array(fp, pa.string()),
            }
        )

    out = ds.map_batches(scrub, batch_format="pyarrow").to_pandas()
    for c in ("n_email", "n_phone", "n_ip"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def _repetition_arrays(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Shared vectorized kernel for the Gopher repetition signals: given a
    (doc_id, text) batch returns per-row (n_tokens, n_stopwords,
    n_bigrams, top_bigram_n, dup_trigram_pos) int64 arrays. One flat
    token array, polynomial-fold gram hashes with the row id mixed into
    the key (grams never merge across docs), np.unique +
    bincount/maximum.at folds — no per-token Python. Used by both
    ``repetition_signals`` and ``cleaning.gopher_filter``."""
    import pyarrow.compute as pc

    from .dedup import _SH_A, _SH_B, _mix64, _token_hashes
    from ..textnorm import tokenize_flat

    n = len(batch)
    flat, flat_rows, n_tok = tokenize_flat(batch["text"], np.arange(n, dtype=np.uint64))
    rows = flat_rows.astype(np.int64)
    sm = pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS_EN), pa.string())).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(rows[sm], minlength=n).astype(np.int64)
    th = _token_hashes(flat)  # Arrow array: dictionary-encoded cold path
    n_bigrams = np.zeros(n, np.int64)
    top_bigram = np.zeros(n, np.int64)
    dup_tri = np.zeros(n, np.int64)
    for gram_n, sink in ((2, "bi"), (3, "tri")):
        if len(th) >= gram_n:
            acc = th[: len(th) - gram_n + 1].copy()
            valid = rows[: len(th) - gram_n + 1] == rows[gram_n - 1 :]
            for j in range(1, gram_n):
                acc = acc * _SH_A + th[j : len(th) - gram_n + 1 + j]
            r = rows[: len(th) - gram_n + 1][valid]
            # mix the row id into the key: counts are per (doc, gram)
            keys = _mix64(acc[valid] + (r.astype(np.uint64) + np.uint64(1)) * _SH_B)
            _, inv, cnt = np.unique(keys, return_inverse=True, return_counts=True)
            if sink == "bi":
                n_bigrams = np.bincount(r, minlength=n).astype(np.int64)
                np.maximum.at(top_bigram, r, cnt[inv])
            else:
                dup_mask = cnt[inv] >= 2
                dup_tri = np.bincount(r[dup_mask], minlength=n).astype(np.int64)
    return n_tok.astype(np.int64), n_stop, n_bigrams, top_bigram, dup_tri


def repetition_signals(sf_dir: str) -> pd.DataFrame:
    """Gopher-style INTRA-document repetition signals (Rae et al. 2021's
    repetition filters — the quality rules that catch keyword-stuffed /
    template pages whole-document dedup can't): per doc, the total and
    maximum 2-gram multiplicity and the number of 3-gram positions whose
    gram repeats within the doc. Pure streaming map, zero shuffle, and
    fully vectorized: one flat token array per batch, polynomial-fold
    gram hashes (row id mixed into the key so grams never merge across
    docs), np.unique + bincount/maximum.at for the per-doc folds — no
    per-token Python. The engine counts 64-bit gram hashes where the SQL
    oracle counts gram strings; equal modulo ~1e-13 hash collisions (the
    jaccard-pair contract)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def signals(batch: pa.Table) -> pa.Table:
        _, _, n_bigrams, top_bigram, dup_tri = _repetition_arrays(batch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": pa.array(n_bigrams, pa.int64()),
                "top_bigram_n": pa.array(top_bigram, pa.int64()),
                "dup_trigram_pos": pa.array(dup_tri, pa.int64()),
            }
        )

    out = ds.map_batches(signals, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


LENGTH_BUCKET = 16  # frozen histogram bucket width (tokens)


def length_histogram(sf_dir: str) -> pd.DataFrame:
    """Corpus token-length DISTRIBUTION in fixed LENGTH_BUCKET-token
    buckets, dense skeleton (every bucket up to the observed max emits,
    zeros included) — the length profile a training-mix planner reads
    before choosing packing / truncation lengths. Per-batch partial
    bincounts (one int64 row per occupied bucket per batch) → one tiny
    groupby(bucket) sum; the shuffle is O(#buckets), never O(docs)."""
    ds = _docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        from ..textnorm import tokenize_flat

        _, _, n_tok = tokenize_flat(batch["text"], np.arange(len(batch), dtype=np.uint64))
        b = (n_tok // LENGTH_BUCKET).astype(np.int64)
        cnt = np.bincount(b)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()), "n": pa.array(cnt[nz], pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    hi = int(agg["bucket"].max()) if len(agg) else 0
    dense = pd.DataFrame({"bucket": np.arange(hi + 1, dtype=np.int64)})
    out = dense.merge(agg, on="bucket", how="left").fillna({"n": 0})
    out["lo"] = (out["bucket"] * LENGTH_BUCKET).astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["bucket", "lo", "n"]].sort_values("bucket").reset_index(drop=True)


PACK_SEQ_LEN = 256  # training sequence length (tokens)
PACK_BUCKET = 64    # doc_id-range scan bucket (the two-phase-scan knob)


def pack_sequences(sf_dir: str, seq_len: int = PACK_SEQ_LEN) -> pd.DataFrame:
    """Sequence PACKING PLAN (GPT-style pretraining layout): documents
    concatenated in doc_id order and sliced into fixed seq_len-token
    training sequences; per doc the plan emits its global token offset and
    first/last sequence index — enough for a loader to materialize any
    sequence shard independently (sequence i depends only on docs
    overlapping [i·L, (i+1)·L), which the plan locates WITHOUT touching
    text). The global offset is a PREFIX SUM over doc_id order, run as the
    same two-phase distributed scan as the watermark's prefix max
    (windows._watermark_flags): per-bucket token totals (tiny groupby over
    doc_id // PACK_BUCKET), an O(buckets) driver exclusive scan, per-bucket
    local cumsum + carry-in via map_groups. Zero-token docs occupy no
    sequence and are dropped (frozen). Oracle: SUM(n) OVER (ORDER BY
    doc_id ROWS … 1 PRECEDING) — all integers, exact."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        from ..textnorm import tokenize_flat

        _, _, n_tok = tokenize_flat(batch["text"], np.arange(len(batch), dtype=np.uint64))
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "n_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
                "bucket": pa.array(did // PACK_BUCKET, pa.int64()),
            }
        )

    counted = ds.map_batches(counts, batch_format="pyarrow")
    totals = (
        counted.groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="tot"))
        .to_pandas()
        .sort_values("bucket")
    )
    excl = totals["tot"].cumsum().shift(1, fill_value=0)
    carry = dict(zip(totals["bucket"].astype(int), excl.astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy()
        start = np.int64(carry[int(g["bucket"].iloc[0])]) + np.concatenate(
            ([0], np.cumsum(n[:-1]))
        )
        keep = n > 0
        n, start = n[keep], start[keep]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy()[keep],
                "n_tokens": n,
                "tok_start": start,
                "seq_first": start // seq_len,
                "seq_last": (start + n - 1) // seq_len,
            }
        )

    out = (
        counted.groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _doc_nll_dataset(sf_dir: str) -> "ray.data.Dataset":
    """CCNet-style LM-perplexity quality signal with the corpus ITSELF as
    the language model: per doc, the total negative log-likelihood of its
    tokens under the corpus unigram distribution (CCNet buckets docs into
    head/middle/tail on exactly this kind of score; a KenLM 5-gram is the
    production drop-in, the plumbing is identical). INTEGER-exact across
    engines: per-term l_t = round(ln(count_t)·1000) milli-nats (counts are
    the same integers on both sides, so libm log agrees bitwise) and
    nll_milli = n_tokens·round(ln(total)·1000) − Σ tf·l_t — no
    order-dependent float sum anywhere. Two passes: the term-count groupby
    (vocab-sized, the term_counts_top50 exchange), then the vocab
    broadcast (ray.put sorted arrays, np.searchsorted + bincount per
    batch). At 10^12 tokens the vocab shards by term hash instead and
    doc NLL sums via one groupby(doc) — the same partial-sum shape.
    Zero-token docs are dropped (frozen, the packing rule)."""
    import ray

    from ..textnorm import tokenize_flat

    ds = _docs(sf_dir, ["doc_id", "text"])

    def term_partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = tokenize_flat(batch["text"], np.arange(len(batch), dtype=np.uint64))
        g = pa.table({"tok": flat}).group_by("tok").aggregate([("tok", "count")])
        return g.rename_columns(["tok", "n"])

    vocab = (
        ds.map_batches(term_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("tok")
    )
    total = int(vocab["n"].sum())
    l_tot = np.int64(np.round(np.log(float(total)) * 1000.0))
    terms = pa.array(vocab["tok"].tolist(), pa.string())
    l_term = np.round(np.log(vocab["n"].to_numpy().astype(np.float64)) * 1000.0).astype(
        np.int64
    )
    ref = ray.put((terms, l_term))

    import functools

    def doc_nll(batch: pa.Table, *, vocab_ref) -> pa.Table:
        import ray as _ray

        terms_, l_ = _ray.get(vocab_ref)
        flat, flat_docs, n_tok = tokenize_flat(
            batch["text"], np.arange(len(batch), dtype=np.uint64)
        )
        import pyarrow.compute as pc

        rows = flat_docs.astype(np.int64)
        idx = pc.index_in(flat, value_set=terms_).to_numpy(zero_copy_only=False)
        li = l_[idx.astype(np.int64)]  # every corpus token is in the vocab
        sum_l = np.bincount(rows, weights=li.astype(np.float64), minlength=len(batch))
        # bincount weights are float64 but every addend is an integer
        # < 2^53 — the sum is exact (the repo's integer-cents argument)
        nll = n_tok.astype(np.int64) * l_tot - sum_l.astype(np.int64)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n_tok > 0
        return pa.table(
            {
                "doc_id": pa.array(did[keep], pa.int64()),
                "n_tokens": pa.array(n_tok[keep].astype(np.int64), pa.int64()),
                "nll_milli": pa.array(nll[keep], pa.int64()),
            }
        )

    return ds.map_batches(
        functools.partial(doc_nll, vocab_ref=ref), batch_format="pyarrow"
    )


def unigram_nll(sf_dir: str) -> pd.DataFrame:
    """Driver-facing form of ``_doc_nll_dataset`` (docstring there): the
    full (doc_id, n_tokens, nll_milli) table, id-sorted."""
    out = _doc_nll_dataset(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


CHUNK_W = 120  # chunk width (characters)
CHUNK_S = 90  # chunk stride (characters) -> 30-char overlap


def chunk_overlap(sf_dir: str, w: int = CHUNK_W, s: int = CHUNK_S) -> pd.DataFrame:
    """RAG-style SLIDING-WINDOW CHUNKING: every document split into
    ``w``-char chunks on a ``s``-char stride (chunks overlap by w−s; the
    final chunk may be short; chunk starts are 0, s, 2s, … while
    start < n_chars). The embed-and-retrieve preprocessing step every
    retrieval corpus needs. Chunk text itself never leaves the stage —
    each output row carries (start, length, md5-prefix) so the exchange
    is O(chunks), not O(bytes); a real pipeline would write chunk text
    to partitioned parquet in the same pass. Codepoint semantics on both
    sides (Python str slicing == DuckDB character substring; md5 over
    the UTF-8 bytes). Output (doc_id, chunk_id, start_c, chunk_len,
    chunk_md5)."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        did_o, cid_o, st_o, ln_o, h_o = [], [], [], [], []
        for did, t in zip(dids, texts):
            n = len(t)
            for cid, start in enumerate(range(0, n, s)):
                chunk = t[start : start + w]
                did_o.append(did)
                cid_o.append(cid)
                st_o.append(start)
                ln_o.append(len(chunk))
                h_o.append(hashlib.md5(chunk.encode("utf-8")).hexdigest()[:8])
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(did_o, np.int64), pa.int64()),
                "chunk_id": pa.array(np.asarray(cid_o, np.int64), pa.int64()),
                "start_c": pa.array(np.asarray(st_o, np.int64), pa.int64()),
                "chunk_len": pa.array(np.asarray(ln_o, np.int64), pa.int64()),
                "chunk_md5": pa.array(h_o, pa.string()),
            }
        )

    out = (
        ds.map_batches(per_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    for c in ("doc_id", "chunk_id", "start_c", "chunk_len"):
        out[c] = out[c].astype("int64")
    return out


def ccnet_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet-style HEAD/MIDDLE/TAIL quality bucketing (Wenzek et al.
    2020): split the corpus into terciles of LM negative log-likelihood —
    CCNet keeps 'head' (lowest perplexity) for pretraining. The score is
    the engine's corpus-unigram nll_milli (``_doc_nll_dataset``; a KenLM
    drop-in at production); thresholds are EXACT type-1 lower terciles
    (the values at sorted index floor((n−1)/3) and floor(2(n−1)/3)) and
    the bucket rule is frozen by VALUE — head: nll ≤ t1, middle:
    t1 < nll ≤ t2, tail: nll > t2 — so a row_number SQL replay
    hash-matches.

    The order statistics come from a DISTINCT-VALUE count histogram
    (per-batch (nll, count) partials → one groupby → driver cumsum),
    never a sort of the corpus: driver state is bounded by the number of
    distinct integer scores (≤ value range), the exact-median plan of
    functions/windows.py. Bucket assignment is a second stateless pass
    with the two thresholds broadcast in the closure."""
    import ray
    from ray.data.aggregate import Count

    nll = _doc_nll_dataset(sf_dir)
    hist = (
        nll.map_batches(
            lambda b: pa.table({"nll_milli": b["nll_milli"]})
            .group_by("nll_milli")
            .aggregate([("nll_milli", "count")])
            .rename_columns(["nll_milli", "c"]),
            batch_format="pyarrow",
        )
        .groupby("nll_milli")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("nll_milli")
    )
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum().to_numpy()
    vals = hist["nll_milli"].to_numpy()
    t1 = int(vals[np.searchsorted(cum, (n - 1) // 3 + 1)])
    t2 = int(vals[np.searchsorted(cum, 2 * (n - 1) // 3 + 1)])

    def assign(batch: pa.Table) -> pa.Table:
        v = batch["nll_milli"].to_numpy(zero_copy_only=False)
        bucket = np.where(v <= t1, "head", np.where(v <= t2, "middle", "tail"))
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "nll_milli": pc.cast(batch["nll_milli"], pa.int64()),
                "bucket": pa.array(bucket.tolist(), pa.string()),
            }
        )

    out = (
        nll.map_batches(assign, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "nll_milli"):
        out[c] = out[c].astype("int64")
    return out


VG_BUCKET_US = 60_000_000  # vocab-growth bucket width (fulltext.HIST_BUCKET_US)


def vocab_growth(sf_dir: str, bucket_us: int = VG_BUCKET_US) -> pd.DataFrame:
    """Phrase-vocabulary growth curve (ES cumulative_cardinality pipeline
    agg over a date_histogram): per crawl-time bucket, how many
    NEVER-SEEN-BEFORE word bigrams appear, and the cumulative distinct
    bigram vocabulary so far — the Heaps'-law monitor a streaming webtext
    ingest runs to spot crawler drift. Bigrams, not unigrams: the driver
    corpus draws from a closed 31-word vocabulary, so unigram growth
    saturates in one bucket while the ~900-phrase bigram space keeps
    producing novelty (same reason production dedup shingles words).

    Cumulative distinct-per-bucket is NOT a sum of per-bucket distincts;
    the distributed plan uses the first-occurrence identity
    ``cum_distinct(b) = Σ_{b'<=b} |{g : first_bucket(g) = b'}|``:
      1. per-batch partial: (gram, min bucket) — one lexsort + keep-first
         over the batch's grams; raw gram occurrences never shuffle;
      2. groupby(gram).Min → the gram's global first bucket (the only
         exchange, ≤ |bigram vocab| rows);
      3. per-bucket counts → driver cumsum over the tiny bucket table.
    Timestamps are the synthetic crawl ts docvalue (fulltext.doc_ts_us).
    Output (bucket, new_grams, cum_grams), all int64 — hash-exact."""
    from ray.data.aggregate import Min

    from .fulltext import BASE_TS_US, TS_MOD, TS_MULT

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (BASE_TS_US + (ids * TS_MULT) % TS_MOD) // bucket_us
        toks = tokenize_batch(batch["text"].to_pylist())
        grams, bks = [], []
        for b, ts in zip(bucket, toks):
            if len(ts) >= 2:
                g = np.unique(
                    np.fromiter(
                        (f"{x} {y}" for x, y in zip(ts, ts[1:])),
                        dtype=object,
                        count=len(ts) - 1,
                    )
                )
                grams.append(g)
                bks.append(np.full(len(g), b, dtype=np.int64))
        if not grams:
            return pa.table({"gram": pa.array([], pa.string()), "bucket": pa.array([], pa.int64())})
        flat = np.concatenate(grams)
        fb = np.concatenate(bks)
        # per-batch (gram → min bucket): sort by (gram, bucket), keep firsts
        order = np.lexsort((fb, flat))
        flat, fb = flat[order], fb[order]
        first = np.ones(len(flat), dtype=bool)
        first[1:] = flat[1:] != flat[:-1]
        return pa.table(
            {
                "gram": pa.array(list(flat[first]), pa.string()),
                "bucket": pa.array(fb[first], pa.int64()),
            }
        )

    fb = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Min("bucket", alias_name="bucket"))
        .to_pandas()
    )
    out = (
        fb.groupby("bucket", sort=True).size().rename("new_grams").reset_index()
    )
    out["cum_grams"] = out["new_grams"].cumsum()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def bigram_nll(sf_dir: str) -> pd.DataFrame:
    """Second-order LM quality signal: per doc, the total negative
    log-likelihood of its word bigrams under the corpus bigram MLE,
    P(w2 | w1) = c(w1 w2) / c1(w1) with c1 the left-context total
    (Σ_w2 c(w1 w2)) — the KenLM-2gram drop-in on top of the unigram
    plumbing (``_doc_nll_dataset``), and the signal that separates
    shuffled-word gibberish from fluent text when unigram stats agree.

    INTEGER-exact like the unigram op: per gram
    δ(g) = round(ln(c1(w1))·1000) − round(ln(c2(g))·1000) milli-nats
    (both counts are identical integers in any engine, so libm ln agrees
    bitwise), and nll_milli = Σ δ over the doc's bigram positions — no
    order-dependent float sum. Plan: per-batch bigram counts → one
    bigram-vocab groupby; the (gram, δ) table broadcasts (ray.put) and a
    second stateless pass scores docs via index_in + bincount. Driver
    state is bounded by the bigram vocabulary (shard it by gram hash at
    web scale — the unigram op's note). Docs with < 2 tokens are dropped
    (frozen). Output (doc_id, n_bigrams, nll_milli), all int64."""
    import functools

    import ray

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _doc_grams(texts) -> list[np.ndarray]:
        toks = tokenize_batch(texts)
        return [
            np.fromiter(
                (f"{x} {y}" for x, y in zip(ts, ts[1:])),
                dtype=object,
                count=max(len(ts) - 1, 0),
            )
            for ts in toks
        ]

    def gram_partial(batch: pa.Table) -> pa.Table:
        per_doc = [g for g in _doc_grams(batch["text"].to_pylist()) if len(g)]
        if not per_doc:
            return pa.table({"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        flat = np.concatenate(per_doc)
        grams, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {"gram": pa.array(list(grams), pa.string()), "n": pa.array(counts, pa.int64())}
        )

    vocab = (
        ds.map_batches(gram_partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    vocab["w1"] = vocab["gram"].str.split(" ").str[0]
    c1 = vocab.groupby("w1")["n"].sum()
    l2 = np.round(np.log(vocab["n"].to_numpy().astype(np.float64)) * 1000.0).astype(np.int64)
    l1 = np.round(np.log(c1.loc[vocab["w1"]].to_numpy().astype(np.float64)) * 1000.0).astype(
        np.int64
    )
    vocab = vocab.assign(delta=l1 - l2).sort_values("gram")
    ref = ray.put(
        (pa.array(vocab["gram"].tolist(), pa.string()), vocab["delta"].to_numpy())
    )

    def score(batch: pa.Table, *, gram_ref) -> pa.Table:
        import pyarrow.compute as pc

        import ray as _ray

        grams_, delta_ = _ray.get(gram_ref)
        per_doc = _doc_grams(batch["text"].to_pylist())
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_bg = np.fromiter((len(g) for g in per_doc), dtype=np.int64, count=len(per_doc))
        keep = n_bg > 0
        if not keep.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "nll_milli": pa.array([], pa.int64()),
                }
            )
        flat = np.concatenate([g for g in per_doc if len(g)])
        rows = np.repeat(np.flatnonzero(keep), n_bg[keep])
        idx = pc.index_in(pa.array(list(flat), pa.string()), value_set=grams_).to_numpy(
            zero_copy_only=False
        )
        d = delta_[idx.astype(np.int64)]
        # float64 bincount of integer addends < 2^53 — exact
        nll = np.bincount(rows, weights=d.astype(np.float64), minlength=len(per_doc))
        return pa.table(
            {
                "doc_id": pa.array(did[keep], pa.int64()),
                "n_bigrams": pa.array(n_bg[keep], pa.int64()),
                "nll_milli": pa.array(nll[keep].astype(np.int64), pa.int64()),
            }
        )

    out = (
        ds.map_batches(functools.partial(score, gram_ref=ref), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def nb_lang_classifier(sf_dir: str) -> pd.DataFrame:
    """Distributed Naive Bayes TRAIN + INFER in one pipeline (the
    fasttext-style quality/language classifier slot of a webtext
    pipeline, with multinomial NB as the frozen, replayable model):
    train P(tok | lang) with add-one smoothing on the corpus's own lang
    labels, then score every doc and emit the argmax label plus its
    integer margin. All log-likelihoods follow the unigram-NLL integer
    contract — every ln() argument is an INTEGER (count+1, lang totals,
    doc counts), so l = round(ln(k)·1000) milli-nats agrees bitwise in
    any engine and scores fold in pure int64:

        score(doc, g) = l(docs_g) − l(docs)
                        + Σ_tok l(c(tok,g)+1) − n_tok·l(C_g + V)

    (C_g = token total of lang g, V = global vocab size; unseen
    (tok, g) contribute l(1) = 0). Argmax ties break lang ASC (frozen).
    Plan: one (lang, tok) count groupby — the model is |langs|×|vocab|,
    broadcast via ray.put — then a stateless scoring pass (per-lang
    index_in + bincount). Output (doc_id, pred_lang, margin_milli):
    margin = best − runner-up, the abstention signal a production
    filter thresholds on. Hash-checked against a full SQL replay."""
    import functools

    import ray

    from ..textnorm import tokenize_flat

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def count_partial(batch: pa.Table) -> pa.Table:
        flat, flat_docs, _ = tokenize_flat(batch["text"], np.arange(len(batch), dtype=np.uint64))
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        g = (
            pa.table(
                {
                    "lang": pa.array(list(langs[flat_docs.astype(np.int64)]), pa.string()),
                    "tok": flat,
                }
            )
            .group_by(["lang", "tok"])
            .aggregate([("tok", "count")])
        )
        return g.rename_columns(["lang", "tok", "n"])

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["lang", "tok"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    docs_per_lang = (
        ds.groupby("lang").aggregate(Count(alias_name="n_docs")).to_pandas()
    )
    langs = sorted(docs_per_lang["lang"])
    vocab = sorted(counts["tok"].unique())
    V = len(vocab)
    n_docs_total = int(docs_per_lang["n_docs"].sum())

    def _l(k) -> np.ndarray:
        return np.round(np.log(np.asarray(k, dtype=np.float64)) * 1000.0).astype(np.int64)

    tok_pos = {t: i for i, t in enumerate(vocab)}
    lt = np.zeros((len(langs), V), dtype=np.int64)  # l(c+1) per (lang, tok)
    for li, g in enumerate(langs):
        sub = counts[counts["lang"] == g]
        row = np.zeros(V, dtype=np.int64)
        row[[tok_pos[t] for t in sub["tok"]]] = sub["n"].to_numpy()
        lt[li] = _l(row + 1)
    c_lang = counts.groupby("lang")["n"].sum().reindex(langs).fillna(0).astype(int)
    l_denom = _l(c_lang.to_numpy() + V)                 # per-lang l(C_g + V)
    prior = _l(docs_per_lang.set_index("lang")["n_docs"].reindex(langs).to_numpy()) - _l(
        [n_docs_total]
    )
    vocab_arr = pa.array(vocab, pa.string())
    model_ref = ray.put((vocab_arr, lt, l_denom, prior))

    def score(batch: pa.Table, *, m_ref) -> pa.Table:
        import pyarrow.compute as pc

        import ray as _ray

        vocab_, lt_, l_denom_, prior_ = _ray.get(m_ref)
        flat, flat_docs, n_tok = tokenize_flat(
            batch["text"], np.arange(len(batch), dtype=np.uint64)
        )
        rows = flat_docs.astype(np.int64)
        idx = pc.index_in(flat, value_set=vocab_).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(batch)
        scores = np.zeros((n, lt_.shape[0]), dtype=np.int64)
        for li in range(lt_.shape[0]):
            s = np.bincount(rows, weights=lt_[li][idx].astype(np.float64), minlength=n)
            scores[:, li] = s.astype(np.int64) - n_tok.astype(np.int64) * l_denom_[li] + prior_[li]
        best = np.argmin(-scores, axis=1)  # argmax, first-wins == lang ASC
        order = np.argsort(-scores, axis=1, kind="stable")
        if lt_.shape[0] >= 2:
            margin = (
                scores[np.arange(n), order[:, 0]] - scores[np.arange(n), order[:, 1]]
            )
        else:
            # single-lang corpus: no runner-up column exists; margin 0
            margin = np.zeros(n, dtype=np.int64)
        keep = n_tok > 0  # zero-token docs are dropped (frozen, the NLL rule)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(pa.array(keep)),
                "pred_lang": pa.array(
                    [langs[b] for b, k in zip(best, keep) if k], pa.string()
                ),
                "margin_milli": pa.array(margin[keep], pa.int64()),
            }
        )

    out = (
        ds.map_batches(functools.partial(score, m_ref=model_ref), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["margin_milli"] = out["margin_milli"].astype("int64")
    return out


def term_drift(sf_dir: str) -> pd.DataFrame:
    """Corpus-drift monitor (the ingest-side check a continuously-crawled
    corpus runs: has the term distribution moved between two crawl
    slices?): split docs by doc_id parity (frozen stand-in for
    yesterday/today), and report, per term, the INTEGER-frozen scaled-L1
    drift contribution |c_even·N_odd − c_odd·N_even| (cross-multiplied —
    the exact-integer form of |p − q|·N_even·N_odd, no division
    anywhere), plus totals. Top 10 terms by (drift DESC, term ASC) — the
    'what changed' readout. One (half, term) count groupby is the whole
    exchange. Hash-exact."""
    from ..textnorm import tokenize_flat

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        flat, flat_docs, _ = tokenize_flat(batch["text"], np.arange(len(batch), dtype=np.uint64))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        half = (ids % 2)[flat_docs.astype(np.int64)]
        g = (
            pa.table({"half": pa.array(half, pa.int64()), "tok": flat})
            .group_by(["half", "tok"])
            .aggregate([("tok", "count")])
        )
        return g.rename_columns(["half", "tok", "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["half", "tok"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = counts.pivot_table(index="tok", columns="half", values="n", fill_value=0).astype(int)
    c0 = piv.get(0, pd.Series(0, index=piv.index)).to_numpy()
    c1 = piv.get(1, pd.Series(0, index=piv.index)).to_numpy()
    n0, n1 = int(c0.sum()), int(c1.sum())
    # exact object-int cross-product: c*N overflows int64 once half-token
    # totals pass ~2^63/max(c); the final int64 cast below then raises
    # (OverflowError) instead of silently wrapping like the numpy form did
    drift = np.abs(c0.astype(object) * n1 - c1.astype(object) * n0)
    out = pd.DataFrame({"term": piv.index, "drift": drift, "c_even": c0, "c_odd": c1})
    out = out.sort_values(["drift", "term"], ascending=[False, True]).head(10).reset_index(drop=True)
    for c in ("drift", "c_even", "c_odd"):
        out[c] = out[c].astype("int64")
    return out[["term", "c_even", "c_odd", "drift"]]


BOX_QS = (1, 2, 3)  # quartiles (type-1 lower), plus min/max


def length_boxplot_by_lang(sf_dir: str) -> pd.DataFrame:
    """ES boxplot aggregation, grouped form: per declared lang, the
    five-number summary (min, q1, median, q3, max) of per-doc token
    counts — the per-slice length profile a corpus dashboard renders.
    Quantiles are EXACT type-1 lower order statistics (value at sorted
    index floor((n−1)·p)) computed from a (lang, n_tokens) COUNT
    HISTOGRAM — per-batch partials, one small groupby, driver cumsum per
    lang over distinct values (the events_value_median plan, grouped).
    All int64 → hash-exact; the SQL oracle replays with per-partition
    row_number ranks."""
    from ..textnorm import tokenize_flat

    ds = _docs(sf_dir, ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        _, _, n_tok = tokenize_flat(batch["text"], np.arange(len(batch), dtype=np.uint64))
        df = pd.DataFrame({"lang": batch["lang"].to_pandas(), "n": n_tok.astype(np.int64)})
        g = df.groupby(["lang", "n"], sort=False).size().rename("c")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    rows = []
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("n")
        vals = g["n"].to_numpy(np.int64)
        cum = g["c"].cumsum().to_numpy(np.int64)
        n = int(cum[-1])
        qs = [int(vals[np.searchsorted(cum, (q * (n - 1)) // 4 + 1)]) for q in BOX_QS]
        rows.append((lang, n, int(vals[0]), qs[0], qs[1], qs[2], int(vals[-1])))
    out = pd.DataFrame(
        rows, columns=["lang", "n_docs", "min_t", "q1", "median", "q3", "max_t"]
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


KW_K = 5  # tf-idf keywords per doc


def tfidf_keywords(sf_dir: str, k: int = KW_K) -> pd.DataFrame:
    """Per-doc tf-idf keyword extraction: the top-``k`` terms of every
    document by tf·idf, the classic summarization/tagging primitive.
    INTEGER-exact across engines via the milli-nat idiom (the
    unigram_nll contract): ``idf_milli = round(ln(N)·1000) −
    round(ln(df)·1000)`` (both logs of exact integers, so libm agrees
    bitwise) and ``score_milli = tf · idf_milli`` — no float compare
    anywhere; ties break (score DESC, term ASC), frozen.

    Two passes, both shuffle-native: a distinct-(doc,term) fold →
    vocab-sized ``groupby(tok).Sum`` for df (the term_counts exchange),
    then a broadcast of (terms, df, l_df) (one ``ray.put``; at 10^12
    tokens the vocab shards by term hash and the score/top-k becomes a
    tf⋈df shuffle join + per-doc reducer — same shape, SCALE.md §3) and
    a per-batch Arrow (row,tok) tf fold with a vectorized within-doc
    top-k (sort_by + run-boundary rank, no Python per row). N counts ALL
    corpus docs (zero-token docs emit no keywords but still weigh idf),
    matching the oracle's ``count(*) FROM documents``."""
    import functools

    import ray

    from ..textnorm import tokenize_flat

    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, flat_docs, _ = tokenize_flat(
            batch["text"], np.arange(len(batch), dtype=np.uint64)
        )
        pairs = pa.table(
            {"row": pa.array(flat_docs.astype(np.int64), pa.int64()), "tok": flat}
        ).group_by(["row", "tok"]).aggregate([])
        g = pairs.group_by("tok").aggregate([("tok", "count")])
        return g.rename_columns(["tok", "n"])

    vocab = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("tok")
    )
    l_n = int(np.round(np.log(float(n_docs)) * 1000.0))
    terms = pa.array(vocab["tok"].tolist(), pa.string())
    dfs = vocab["n"].to_numpy().astype(np.int64)
    l_df = np.round(np.log(dfs.astype(np.float64)) * 1000.0).astype(np.int64)
    ref = ray.put((terms, dfs, l_df))

    def doc_topk(batch: pa.Table, *, vocab_ref, l_n: int, k: int) -> pa.Table:
        import ray as _ray

        terms_, dfs_, l_ = _ray.get(vocab_ref)
        flat, flat_docs, _ = tokenize_flat(
            batch["text"], np.arange(len(batch), dtype=np.uint64)
        )
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int32()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "score_milli": pa.array([], pa.int64()),
            }
        )
        if len(flat) == 0:
            return empty
        g = pa.table(
            {"row": pa.array(flat_docs.astype(np.int64), pa.int64()), "tok": flat}
        ).group_by(["row", "tok"]).aggregate([("tok", "count")])
        idx = pc.index_in(g["tok"], value_set=terms_).to_numpy(zero_copy_only=False)
        idx = idx.astype(np.int64)  # every corpus token is in the vocab
        tf = g["tok_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = tf * (l_n - l_[idx])
        s = pa.table(
            {
                "row": g["row"],
                "term": g["tok"],
                "tf": pa.array(tf, pa.int64()),
                "df": pa.array(dfs_[idx], pa.int64()),
                "score_milli": pa.array(score, pa.int64()),
            }
        ).sort_by(
            [("row", "ascending"), ("score_milli", "descending"), ("term", "ascending")]
        )
        rows_s = s["row"].to_numpy(zero_copy_only=False)
        new_run = np.r_[True, rows_s[1:] != rows_s[:-1]]
        starts = np.flatnonzero(new_run)
        grp = np.cumsum(new_run) - 1
        rank = np.arange(len(rows_s), dtype=np.int64) - starts[grp]
        keep = rank < k
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did[rows_s[keep]], pa.int64()),
                "rank": pa.array((rank[keep] + 1).astype(np.int32), pa.int32()),
                "term": s["term"].filter(pa.array(keep)),
                "tf": s["tf"].filter(pa.array(keep)),
                "df": s["df"].filter(pa.array(keep)),
                "score_milli": s["score_milli"].filter(pa.array(keep)),
            }
        )

    out = (
        ds.map_batches(
            functools.partial(doc_topk, vocab_ref=ref, l_n=l_n, k=k),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    return out


COLLOC_MIN_C = 5  # collocations: minimum bigram count
COLLOC_K = 50  # collocations: global top-k


def collocations(sf_dir: str, min_c: int = COLLOC_MIN_C, k: int = COLLOC_K) -> pd.DataFrame:
    """Corpus collocation mining: the global top-``k`` ADJACENT token
    pairs by pointwise mutual information (Church & Hanks 1990), the
    classic multi-word-expression detector. PMI over the bigram table's
    own margins, INTEGER-exact via the milli-nat idiom: ``pmi_milli =
    round(ln c_ab·1000) + round(ln T·1000) − round(ln c_a·1000) −
    round(ln c_b·1000)`` — every log is of an exact integer count, so
    libm agrees bitwise across engines; ties (pmi DESC, a ASC, b ASC).
    Margins count bigram POSITIONS (c_a = Σ_b c_ab), so the whole
    contract derives from one table. ``min_c`` prunes hapax pairs AFTER
    margins (the standard definition).

    Shape: per-batch Arrow (a,b) partial counts off ``tokenize_flat``'s
    within-doc adjacency (the ORDER CONTRACT) → one bigram-vocab-sized
    ``groupby.Sum`` → margins re-folded from the materialized bigram
    Dataset and broadcast (vocab-sized ray.put, the tfidf_keywords
    argument; at 10^12 tokens margins become two more hash-sharded
    groupbys and the scorer a join — same shape) → per-block top-k
    partials and a ≤k·#blocks driver merge (never the full pair table)."""
    import functools

    import ray

    from ..textnorm import tokenize_flat

    ds = _docs(sf_dir, ["doc_id", "text"])

    def bigram_partial(batch: pa.Table) -> pa.Table:
        flat, flat_docs, _ = tokenize_flat(
            batch["text"], np.arange(len(batch), dtype=np.uint64)
        )
        if len(flat) < 2:
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        same = flat_docs[1:] == flat_docs[:-1]
        g = pa.table(
            {
                "a": flat.slice(0, len(flat) - 1).filter(pa.array(same)),
                "b": flat.slice(1).filter(pa.array(same)),
            }
        ).group_by(["a", "b"]).aggregate([("b", "count")])
        return g.rename_columns(["a", "b", "n"])

    bg = (
        ds.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="c"))
        .materialize()
    )

    def margin_partial(col: str):
        def fold(batch: pa.Table) -> pa.Table:
            g = batch.group_by(col).aggregate([("c", "sum")])
            return g.rename_columns([col, "n"])

        return fold

    ma = (
        bg.map_batches(margin_partial("a"), batch_format="pyarrow")
        .groupby("a").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    mb = (
        bg.map_batches(margin_partial("b"), batch_format="pyarrow")
        .groupby("b").aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    total = int(ma["n"].sum())
    l_tot = int(np.round(np.log(float(total)) * 1000.0))

    def _milli_map(df: pd.DataFrame, key: str):
        toks = pa.array(df[key].tolist(), pa.string())
        l = np.round(
            np.log(df["n"].to_numpy().astype(np.float64)) * 1000.0
        ).astype(np.int64)
        return toks, l

    ref = ray.put((_milli_map(ma.sort_values("a"), "a"),
                   _milli_map(mb.sort_values("b"), "b")))

    def score_topk(batch: pa.Table, *, ref, l_tot: int, min_c: int, k: int) -> pa.Table:
        import ray as _ray

        (ta, la), (tb, lb) = _ray.get(ref)
        keep = pc.greater_equal(batch["c"], min_c)
        t = batch.filter(keep)
        if t.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                 "n_pairs": pa.array([], pa.int64()),
                 "pmi_milli": pa.array([], pa.int64())}
            )
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        ia = pc.index_in(t["a"], value_set=ta).to_numpy(zero_copy_only=False).astype(np.int64)
        ib = pc.index_in(t["b"], value_set=tb).to_numpy(zero_copy_only=False).astype(np.int64)
        l_c = np.round(np.log(c.astype(np.float64)) * 1000.0).astype(np.int64)
        pmi = l_c + l_tot - la[ia] - lb[ib]
        out = pa.table(
            {"a": t["a"], "b": t["b"], "n_pairs": pa.array(c, pa.int64()),
             "pmi_milli": pa.array(pmi, pa.int64())}
        ).sort_by([("pmi_milli", "descending"), ("a", "ascending"), ("b", "ascending")])
        return out.slice(0, k)

    parts = bg.map_batches(
        functools.partial(score_topk, ref=ref, l_tot=l_tot, min_c=min_c, k=k),
        batch_format="pyarrow",
    ).to_pandas()
    parts = parts.sort_values(
        ["pmi_milli", "a", "b"], ascending=[False, True, True]
    ).head(k).reset_index(drop=True)
    parts.insert(0, "rank", np.arange(1, len(parts) + 1, dtype=np.int32))
    return parts


def char_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-doc character-level Shannon self-entropy — the cheap binary/
    boilerplate-junk detector (gibberish and base64 blobs sit near
    log|alphabet|, repeated padding near 0) that curation stacks run
    before tokenizing. INTEGER-exact via the milli-nat idiom:
    ``ent_milli_numer = n·round(ln n·1000) − Σ c_i·round(ln c_i·1000)``
    over the doc's own byte counts (every log is of an exact integer, so
    libm agrees bitwise across engines; H in milli-nats = numer / n,
    kept as the exact integer numerator plus n). Embarrassingly
    parallel: one pass, per-doc byte bincounts (texts are ASCII —
    bytes == chars, the module contract), nothing shuffles."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = np.empty(len(ids), np.int64)
        numer = np.empty(len(ids), np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            n = len(b)
            ns[i] = n
            if n == 0:
                numer[i] = 0
                continue
            c = np.bincount(b, minlength=256)
            c = c[c > 0].astype(np.int64)
            l_c = np.round(np.log(c.astype(np.float64)) * 1000.0).astype(np.int64)
            l_n = np.int64(np.round(np.log(float(n)) * 1000.0))
            numer[i] = n * l_n - int((c * l_c).sum())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(ns, pa.int64()),
                "ent_milli_numer": pa.array(numer, pa.int64()),
            }
        )

    out = (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype("int64")


def zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf-law slope of the corpus term-frequency distribution — the
    corpus-health diagnostic paired with vocab_growth's Heaps fit
    (natural text sits near −1; boilerplate-heavy or templated corpora
    flatten it). Least-squares slope of l(freq) on l(rank) in milli-nats
    (ranks frozen by (freq DESC, term ASC)), emitted as the EXACT
    integer regression sums plus numerator/denominator (slope =
    beta_num / beta_den) — division is left to the reader because
    Python floors and DuckDB truncates negative quotients; everything
    emitted is an exact integer, hash-stable.

    Shape: the distributed work is the vocab-sized term-count fold (the
    term_counts exchange); ranking and the integer sums run on that fold
    (driver-side here, a vocab sort + per-block partials at 10^12
    tokens). int64 is ample: x,y ≤ ~15k milli-nats, so even a 10^9-term
    vocab keeps n·Σxy below 2^63."""
    from ..textnorm import tokenize_flat

    ds = _docs(sf_dir, ["text"])

    def term_partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = tokenize_flat(batch["text"], np.arange(len(batch), dtype=np.uint64))
        g = pa.table({"tok": flat}).group_by("tok").aggregate([("tok", "count")])
        return g.rename_columns(["tok", "n"])

    vocab = (
        ds.map_batches(term_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "tok"], ascending=[False, True])
        .reset_index(drop=True)
    )
    c = vocab["n"].to_numpy().astype(np.int64)
    rnk = np.arange(1, len(c) + 1, dtype=np.int64)
    x = np.round(np.log(rnk.astype(np.float64)) * 1000.0).astype(np.int64)
    y = np.round(np.log(c.astype(np.float64)) * 1000.0).astype(np.int64)
    n = len(c)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    return pd.DataFrame(
        {
            "n_terms": [n],
            "sum_x": [sx],
            "sum_y": [sy],
            "sum_xy": [sxy],
            "sum_xx": [sxx],
            "beta_num": [n * sxy - sx * sy],
            "beta_den": [n * sxx - sx * sx],
        }
    ).astype("int64")
