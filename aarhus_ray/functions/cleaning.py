"""End-to-end training-data corpus cleaning — the composition pipeline a
100TB pretraining-data run would use, built from the engine's own stages:

    documents → lang filter → quality floor (token count)
              → near-dup removal (MinHash+LSH candidates, exact-Jaccard
                verified, drop the higher doc_id of each verified pair)
              → partitioned parquet corpus (resumable output layout)

Every rule is deterministic and SQL-expressible, so the whole composition
is oracle-hash-checked end to end (corpus_clean in __ray_entry__). The
near-dup stage REUSES minhash_lsh_pairs — restricting its (corpus-wide)
verified pairs to the qualified subset equals computing pairs among
qualified docs, since a pair qualifies iff both ends do.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from ..textnorm import tokenize_flat
from .dedup import _docs, minhash_lsh_pairs

CLEAN_OUT_ROOT = "/tmp/aarhus_clean"


def corpus_clean(
    sf_dir: str,
    min_tokens: int = 10,
    langs: tuple[str, ...] = ("en",),
    out_dir: str | None = None,
) -> pd.DataFrame:
    """Returns the surviving doc_ids (sorted) and writes the cleaned corpus
    as lang-partitioned parquet under ``out_dir`` (default a per-corpus dir
    below /tmp/aarhus_clean) — one directory per partition value, so a
    failed downstream run can resume per partition."""
    import numpy as np
    import pyarrow.compute as pc

    lang_set = pa.array(sorted(langs), pa.string())

    def qualify(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch["lang"], value_set=lang_set))
        if len(batch) == 0:
            return batch.select(["doc_id", "lang", "text"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        _, _, counts = tokenize_flat(batch["text"], ids)
        keep = counts >= min_tokens
        return batch.filter(pa.array(keep)).select(["doc_id", "lang", "text"])

    # the qualify map runs twice (pair-adjacent probe + final write) and
    # recomputes rather than materializing — text-bearing intermediates
    # should stream, not pin the object store (recompute-vs-materialize,
    # SCALE.md). Nothing corpus-sized ever reaches the driver: the only
    # driver-resident state is the verified near-dup pair list (small by
    # LSH construction) and the drop set derived from it.
    # near-dup edges over the corpus; winner = min doc_id (pairs are
    # emitted doc_a < doc_b, so doc_b drops). A pair drops doc_b only if
    # BOTH ends qualify — restricting corpus-wide pairs to the qualified
    # subset equals computing pairs among qualified docs (see module doc).
    pairs = minhash_lsh_pairs(sf_dir)
    pair_ids = sorted(
        {int(a) for a in pairs["doc_a"]} | {int(b) for b in pairs["doc_b"]}
    )
    pair_arr = pa.array(pair_ids, pa.int64())

    def probe_pair_members(batch: pa.Table) -> pa.Table:
        # prune to pair-adjacent rows FIRST, then qualify — the probe scan
        # tokenizes only candidate-pair members, not the corpus
        return qualify(batch.filter(pc.is_in(batch["doc_id"], value_set=pair_arr)))

    qualified_pair_ids = set()
    if pair_ids:
        qualified_pair_ids = set(
            _docs(sf_dir, ["doc_id", "lang", "text"])
            .map_batches(probe_pair_members, batch_format="pyarrow")
            .select_columns(["doc_id"])
            .to_pandas()["doc_id"]
            .astype("int64")
            .tolist()
        )
    drop = {
        int(b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])
        if int(a) in qualified_pair_ids and int(b) in qualified_pair_ids
    }

    out_dir = out_dir or os.path.join(
        CLEAN_OUT_ROOT, os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    drop_arr = pa.array(sorted(drop), pa.int64())

    def qualify_and_drop(batch: pa.Table) -> pa.Table:
        batch = qualify(batch)
        return batch.filter(pc.invert(pc.is_in(batch["doc_id"], value_set=drop_arr)))

    _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        qualify_and_drop, batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["lang"])
    # the PRODUCT is the partitioned parquet corpus above; the returned id
    # list exists for the correctness harness (oracle hash). It is read back
    # from the written output — verifying the sink — via a pruned
    # single-column scan. At 10^12 docs you would return the output path +
    # survivor count instead of materializing ids.
    import ray.data

    survivors = (
        ray.data.read_parquet(out_dir, columns=["doc_id"])
        .to_pandas()["doc_id"]
        .astype("int64")
        .sort_values()
        .reset_index(drop=True)
    )
    return pd.DataFrame({"doc_id": survivors})


SOURCE_CAP_K = 10  # frozen cap: keep at most K docs per source


def source_cap(sf_dir: str, k: int = SOURCE_CAP_K) -> pd.DataFrame:
    """Per-domain QUOTA (the RefinedWeb / CCNet per-registered-domain cap —
    no single host may dominate the training mix): keep at most ``k`` docs
    per source, preferring longer docs (n_chars DESC, doc_id ASC — ties
    frozen by id). Two-phase distributed top-k, the same shape as the
    engine's per-batch score partials:

      phase 1 (map): each batch keeps its own per-source top-k — a batch
        can contribute at most k rows per source, so phase 2's groups are
        bounded by k × #blocks regardless of how hot a host is;
      phase 2 (reduce): groupby(source).map_groups merges the partials and
        re-takes the top-k.

    Only (doc_id, source, n_chars) triples ever move — never text. The
    skew story is exactly the hot-domain story: a host with 10^9 docs
    still ships ≤ k rows per map task into its reducer."""
    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def per_batch_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        kept = (
            df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .groupby("source", sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(kept.reset_index(drop=True), preserve_index=False)

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )

    out = (
        ds.map_batches(per_batch_topk, batch_format="pyarrow")
        .groupby("source")
        .map_groups(merge_topk, batch_format="pandas")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)[["doc_id", "source", "n_chars"]]


# frozen training-mix targets: quota per lang out of MIX_BUDGET docs
MIX_BUDGET = 200
MIX_WEIGHTS = (("en", 0.40), ("de", 0.15), ("es", 0.15), ("fr", 0.15), ("zh", 0.15))


def mixture_resample(sf_dir: str) -> pd.DataFrame:
    """Training-MIX rebalancing (the DoReMi / data-mixture step: resample
    the corpus so each language holds its target share regardless of crawl
    skew): per lang keep quota_l = floor(MIX_BUDGET × w_l) docs, chosen by
    a reproducible coordination-free hash order (md5 of the doc_id string
    — every shard agrees on the ranking without communication, the
    random_score idiom; a lang with fewer docs than quota keeps all).
    Same two-phase distributed top-k as ``source_cap``: per-batch
    head(quota) partials bound each reducer at quota × #blocks, so a
    10^12-doc head language still ships only its quota per map task."""
    import hashlib

    quotas = {lang: int(MIX_BUDGET * w) for lang, w in MIX_WEIGHTS}
    ds = _docs(sf_dir, ["doc_id", "lang"])

    def rkey_topq(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["rkey"] = [
            hashlib.md5(str(int(d)).encode()).hexdigest() for d in df["doc_id"]
        ]
        kept = (
            df.sort_values(["rkey", "doc_id"])
            .groupby("lang", sort=False)
            .head(max(quotas.values()))
        )
        kept = kept[kept["lang"].isin(quotas)]
        return pa.Table.from_pandas(kept.reset_index(drop=True), preserve_index=False)

    def merge_topq(g: pd.DataFrame) -> pd.DataFrame:
        q = quotas.get(str(g["lang"].iloc[0]), 0)
        return g.sort_values(["rkey", "doc_id"]).head(q).reset_index(drop=True)

    out = (
        ds.map_batches(rkey_topq, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(merge_topq, batch_format="pandas")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "lang"]].sort_values("doc_id").reset_index(drop=True)


# frozen Gopher-filter thresholds (integer-exact comparisons only, so the
# rule boundary is a pure function both engines replay bit-identically)
GOPHER_MIN_TOKENS = 10
GOPHER_MAX_TOKENS = 5000
GOPHER_TOP_BIGRAM_X = 5    # drop if top_bigram_n * 5 > n_bigrams  (>20%)
GOPHER_DUP_TRIGRAM_X = 4   # drop if dup_trigram_pos * 4 > n_trigrams (>25%)
GOPHER_MIN_STOPWORDS = 2   # en docs need >= 2 stopword hits


def gopher_filter(sf_dir: str) -> pd.DataFrame:
    """The composite Gopher QUALITY FILTER (Rae et al. 2021 §A1.1, the
    rule set C4/MassiveText-style curation applies before dedup): per doc
    a keep flag and the FIRST failing rule, evaluated in frozen order —

        too_short           n_tokens < 10
        too_long            n_tokens > 5000
        bigram_repetition   top 2-gram multiplicity > 20% of all 2-grams
        trigram_repetition  repeated-3-gram positions > 25% of 3-grams
        few_stopwords       lang = 'en' with < 2 stopword hits

    All comparisons are integer cross-multiplications (never a float
    ratio), so the decision boundary replays exactly in SQL. One
    streaming map sharing ``textstats._repetition_arrays`` with
    repetition_signals — the signals are computed once per batch, zero
    shuffle, nothing corpus-sized leaves the map."""
    from .textstats import _repetition_arrays

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def apply_rules(batch: pa.Table) -> pa.Table:
        n_tok, n_stop, n_bigrams, top_bigram, dup_tri = _repetition_arrays(batch)
        lang_en = np.asarray(
            [lang == "en" for lang in batch["lang"].to_pylist()], dtype=bool
        )
        n_tri = np.maximum(n_tok - 2, 0)
        reasons = np.full(len(n_tok), "", dtype=object)
        for name, failed in (
            ("too_short", n_tok < GOPHER_MIN_TOKENS),
            ("too_long", n_tok > GOPHER_MAX_TOKENS),
            ("bigram_repetition", top_bigram * GOPHER_TOP_BIGRAM_X > n_bigrams),
            ("trigram_repetition", dup_tri * GOPHER_DUP_TRIGRAM_X > n_tri),
            ("few_stopwords", lang_en & (n_stop < GOPHER_MIN_STOPWORDS)),
        ):
            reasons[(reasons == "") & failed] = name
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "keep": pa.array(reasons == "", pa.bool_()),
                "reason": pa.array(reasons.tolist(), pa.string()),
            }
        )

    out = ds.map_batches(apply_rules, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DSIR_B = 1024  # hashed-feature buckets
DSIR_TARGET_SOURCES = ("src0", "src1", "src2")
DSIR_K = 100


def dsir_weights(sf_dir: str) -> pd.DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    rank raw documents by the log importance ratio of a TARGET domain
    over the raw corpus under hashed unigram features. The production
    recipe for 'make CommonCrawl look like Wikipedia': estimate smoothed
    bucket distributions p(target) and q(raw) over md5-hashed token
    buckets, weight each doc by Σ_tokens [ln p(bkt) − ln q(bkt)], keep
    the top of the ranking (the real pipeline then Gumbel-resamples; the
    deterministic top-k is the oracle-checkable core).

    INTEGER-exact across engines, the unigram_nll idiom: per-bucket
    delta = lm(t_b+1) − lm(T+B) − lm(r_b+1) + lm(R+B) in milli-nats
    (lm(x) = round(1000·ln(x)); counts are identical integers on both
    sides, so libm agrees bitwise), doc weight = Σ delta[bucket(tok)] —
    an integer dot product, no order-dependent float sum.

    Two distributed passes: (1) per-batch partial (bucket, raw_c, tgt_c)
    counts — at most B=1024 rows per batch regardless of corpus size —
    folded to one 2·B-int driver table and broadcast as the delta array;
    (2) per-doc weight via np.bincount over flat token buckets + partial
    top-k per batch, tiny driver merge. Both passes stream; nothing
    driver-side grows with the corpus."""
    import hashlib

    import ray
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    tgt_set = set(DSIR_TARGET_SOURCES)

    def _buckets_of(flat: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(unique-token bucket ids, inverse index per flat token)."""
        uniq = pc.unique(flat)
        bkt_u = np.array(
            [
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % DSIR_B
                for t in uniq.to_pylist()
            ],
            dtype=np.int64,
        )
        inv = pc.index_in(flat, value_set=uniq).to_numpy(zero_copy_only=False)
        return bkt_u, inv.astype(np.int64)

    def count_partial(batch: pa.Table) -> pa.Table:
        flat, flat_docs, _ = tokenize_flat(
            batch["text"], np.arange(len(batch), dtype=np.uint64)
        )
        bkt_u, inv = _buckets_of(flat)
        bkt = bkt_u[inv]
        raw_c = np.bincount(bkt, minlength=DSIR_B)
        is_tgt = np.array(
            [s in tgt_set for s in batch["source"].to_pylist()], dtype=bool
        )
        tgt_mask = is_tgt[flat_docs.astype(np.int64)]
        tgt_c = np.bincount(bkt[tgt_mask], minlength=DSIR_B)
        return pa.table(
            {
                "bkt": pa.array(np.arange(DSIR_B), pa.int64()),
                "raw_c": pa.array(raw_c.astype(np.int64), pa.int64()),
                "tgt_c": pa.array(tgt_c.astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("bkt", as_index=False)
        .sum()
        .sort_values("bkt")
    )
    raw_c = np.zeros(DSIR_B, np.int64)
    tgt_c = np.zeros(DSIR_B, np.int64)
    raw_c[parts["bkt"].to_numpy()] = parts["raw_c"].to_numpy()
    tgt_c[parts["bkt"].to_numpy()] = parts["tgt_c"].to_numpy()
    lm = lambda x: np.round(np.log(x.astype(np.float64)) * 1000.0).astype(np.int64)
    lm1 = lambda x: np.int64(np.round(np.log(float(x)) * 1000.0))
    delta = (
        lm(tgt_c + 1)
        - lm1(int(tgt_c.sum()) + DSIR_B)
        - lm(raw_c + 1)
        + lm1(int(raw_c.sum()) + DSIR_B)
    )
    delta_ref = ray.put(delta)

    import functools

    def doc_weight(batch: pa.Table, *, ref) -> pa.Table:
        import ray as _ray

        d = _ray.get(ref)
        flat, flat_docs, n_tok = tokenize_flat(
            batch["text"], np.arange(len(batch), dtype=np.uint64)
        )
        bkt_u, inv = _buckets_of(flat)
        w = np.bincount(
            flat_docs.astype(np.int64),
            weights=d[bkt_u[inv]].astype(np.float64),
            minlength=len(batch),
        ).astype(np.int64)  # integer addends < 2^53 — exact
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n_tok > 0
        did, w = did[keep], w[keep]
        order = np.lexsort((did, -w))[:DSIR_K]  # partial top-k
        return pa.table(
            {
                "doc_id": pa.array(did[order], pa.int64()),
                "weight_milli": pa.array(w[order], pa.int64()),
            }
        )

    out = (
        ds.map_batches(functools.partial(doc_weight, ref=delta_ref), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["weight_milli", "doc_id"], ascending=[False, True])
        .head(DSIR_K)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    for c in ("doc_id", "weight_milli", "rank"):
        out[c] = out[c].astype("int64")
    return out[["rank", "doc_id", "weight_milli"]]


LR_B = 1024       # hashed feature buckets (shared shape with DSIR)
LR_ITERS = 8      # full-batch GD rounds
LR_RATE = 2.0     # learning rate (full-batch, normalized features)


def _lr_features(batch: pa.Table):
    """Hashed-unigram mean-bag featurization of a batch: returns
    (bkt_per_token int64[], flat_docs int64[], inv_len float64[] per doc,
    y float64[] per doc, doc_ids int64[]). Empty docs get inv_len 0 (all-
    zero feature row; only the bias moves them)."""
    import hashlib

    import pyarrow.compute as pc

    tgt = set(DSIR_TARGET_SOURCES)
    flat, flat_docs, counts = tokenize_flat(
        batch["text"], np.arange(len(batch), dtype=np.uint64)
    )
    uniq = pc.unique(flat)
    bkt_u = np.array(
        [
            int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % LR_B
            for t in uniq.to_pylist()
        ],
        dtype=np.int64,
    )
    inv = pc.index_in(flat, value_set=uniq).to_numpy(zero_copy_only=False)
    bkt = bkt_u[inv.astype(np.int64)]
    inv_len = np.zeros(len(batch), np.float64)
    nz = counts > 0
    inv_len[nz] = 1.0 / counts[nz]
    y = np.array([1.0 if s in tgt else 0.0 for s in batch["source"].to_pylist()])
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return bkt, flat_docs.astype(np.int64), inv_len, y, doc_ids


def target_classifier_logreg(sf_dir: str) -> pd.DataFrame:
    """Distributed training of a fastText-shaped quality classifier —
    the 'train a linear model to recognize target-domain text' step of
    the CCNet / GPT-3 / LLaMA data pipelines (their fasttext/logistic
    filters), as full-batch gradient descent over hashed-unigram
    mean-bag features (LR_B buckets + bias), label = source ∈
    DSIR_TARGET_SOURCES (the same target framing dsir_weights ranks by).

    Each of LR_ITERS rounds is ONE streaming map_batches pass: a batch
    emits its partial gradient (np.bincount scatter over token buckets —
    B+3 rows regardless of batch size), the driver folds and takes a GD
    step, and the new weight vector broadcasts via ray.put. Driver state
    is model-sized (B+1 floats), never data-sized — the kmeans /
    label_centroids fold shape, here with a nonlinear loss so each round
    genuinely needs the previous round's model (iterative ≠ SQL →
    rows-only at the driver; pinned by tests/test_functions.py::
    test_logreg_matches_sequential_replay at float64 tolerance).

    Output: one row per source — (source, n_docs, n_pred_target,
    n_correct) confusion counts of the trained model, plus the per-iter
    losses as (source='_loss_iterK', n_docs=iter, n_pred_target=0,
    n_correct=round(1e6·loss)) audit rows. Honesty note: the synthetic
    corpus's source labels carry no text signal (verified: lang labels
    are equally unlearnable at n=500), so the trained model converges to
    the class-prior optimum — loss drops 0.693 → ~0.423 ≈ the prior
    entropy H(0.15), majority-class predictions. The capability pinned
    here is the distributed trainer (gradient fold correctness, loss
    monotonicity, model broadcast), not a benchmark accuracy. At 10^12 docs each round is
    a single corpus scan (the floor for any full-batch method); the
    documented swap for fewer passes is local-SGD/parameter averaging,
    which trades determinism — this engine freezes the deterministic
    form."""
    import functools

    import ray

    ds = _docs(sf_dir, ["doc_id", "text", "source"]).materialize()

    def grad_task(batch: pa.Table, w_ref) -> pa.Table:
        w = ray.get(w_ref)
        bkt, fdocs, inv_len, y, _ = _lr_features(batch)
        contrib = w[bkt] * inv_len[fdocs]
        z = np.bincount(fdocs, weights=contrib, minlength=len(y)) + w[LR_B]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        gw = np.bincount(bkt, weights=(err * inv_len)[fdocs], minlength=LR_B)
        eps = 1e-12
        loss = -np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
        return pa.table(
            {
                "i": pa.array(
                    np.concatenate([np.arange(LR_B), [LR_B, LR_B + 1, LR_B + 2]]),
                    pa.int64(),
                ),
                "g": pa.array(
                    np.concatenate([gw, [err.sum(), loss, float(len(y))]]),
                    pa.float64(),
                ),
            }
        )

    w = np.zeros(LR_B + 1, np.float64)
    losses = []
    for _ in range(LR_ITERS):
        w_ref = ray.put(w)
        parts = (
            ds.map_batches(
                functools.partial(grad_task, w_ref=w_ref), batch_format="pyarrow"
            )
            .to_pandas()
            .groupby("i")["g"]
            .sum()
        )
        g = parts.reindex(range(LR_B + 3), fill_value=0.0).to_numpy()
        n = g[LR_B + 2]
        losses.append(g[LR_B + 1] / n)
        w = w - LR_RATE * (g[: LR_B + 1] / n)

    w_ref = ray.put(w)

    def eval_task(batch: pa.Table, w_ref) -> pa.Table:
        w = ray.get(w_ref)
        bkt, fdocs, inv_len, y, _ = _lr_features(batch)
        contrib = w[bkt] * inv_len[fdocs]
        z = np.bincount(fdocs, weights=contrib, minlength=len(y)) + w[LR_B]
        pred = (z > 0).astype(np.int64)
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": pa.array(np.ones(len(y), np.int64), pa.int64()),
                "n_pred_target": pa.array(pred, pa.int64()),
                "n_correct": pa.array(
                    (pred == y.astype(np.int64)).astype(np.int64), pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(functools.partial(eval_task, w_ref=w_ref), batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_pred_target", alias_name="n_pred_target"),
            Sum("n_correct", alias_name="n_correct"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "n_pred_target", "n_correct"):
        out[c] = out[c].astype("int64")
    audit = pd.DataFrame(
        {
            "source": [f"_loss_iter{i}" for i in range(LR_ITERS)],
            "n_docs": np.arange(LR_ITERS, dtype=np.int64),
            "n_pred_target": np.zeros(LR_ITERS, dtype=np.int64),
            "n_correct": np.round(np.array(losses) * 1e6).astype(np.int64),
        }
    )
    return pd.concat([audit, out], ignore_index=True)


def curation_pipeline(sf_dir: str) -> pd.DataFrame:
    """END-TO-END CURATION COMPOSITION — the pipeline a pretraining-data
    user actually runs, as one query: keep exactly the docs that
    (1) pass the Gopher composite quality filter, (2) survive connected-
    component near-dup dedup, and (3) land in the CCNet 'head'
    perplexity tercile. Each stage is the existing distributed operator
    (this function adds NO new semantics — it is the composition
    contract); the id-set intersection is driver-side because stage
    outputs are id-sized, not corpus-sized. The oracle is literally the
    INTERSECT of the three stage oracles, so any drift in any stage
    breaks this query too — the strongest cross-stage consistency check
    in the suite. Output (doc_id) sorted, the curated keep-list a real
    run would hand to pack_sequences."""
    from ..functions.dedup import dedup_survivors_cc
    from ..functions.textstats import ccnet_buckets

    gf = gopher_filter(sf_dir)
    keep_q = set(gf.loc[gf["keep"], "doc_id"].astype(int))
    keep_d = set(dedup_survivors_cc(sf_dir)["doc_id"].astype(int))
    cb = ccnet_buckets(sf_dir)
    keep_h = set(cb.loc[cb["bucket"] == "head", "doc_id"].astype(int))
    ids = sorted(keep_q & keep_d & keep_h)
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})


# frozen split quotas out of 100 md5 buckets: train <90, valid <95, test rest
SPLIT_BOUNDS = (("train", 0, 90), ("valid", 90, 95), ("test", 95, 100))


def _split_bucket(doc_ids) -> np.ndarray:
    """md5(doc_id)%100 — the reproducible-md5 idiom (same as the watermark
    arrival clock / simhash token hash) chosen over blake2b deliberately so
    the whole split assignment replays exactly in DuckDB SQL
    (md5 + hex-prefix cast). One md5 per row; the split stage runs once
    per corpus version, not per epoch, so this is not a hot path."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 for i in doc_ids),
        dtype=np.int64,
        count=len(doc_ids),
    )


def train_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/valid/test split — the corpus-versioning step a
    training pipeline runs before packing: each doc lands in a split by
    md5(doc_id)%100 (content-independent, so re-crawls and re-filters never
    migrate a doc across splits — the leakage guard), quotas 90/5/5.

    Output is the split MANIFEST (per split: doc count, char volume,
    doc_id range) — mergeable per-batch partials folded on the driver
    (3 rows per block; model-sized, never corpus-sized). The per-doc
    assignment itself needs no shuffle at any scale: it is a pure map,
    and a real run would write docs partitioned by split exactly like
    corpus_clean's lang-partitioned sink."""
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        chars = batch["n_chars"].to_numpy()
        b = _split_bucket(ids)
        rows = []
        for name, lo, hi in SPLIT_BOUNDS:
            m = (b >= lo) & (b < hi)
            if not m.any():
                continue
            rows.append(
                {
                    "split": name,
                    "n_docs": int(m.sum()),
                    "sum_chars": int(chars[m].sum()),
                    "min_doc_id": int(ids[m].min()),
                    "max_doc_id": int(ids[m].max()),
                }
            )
        return pa.Table.from_pylist(rows)

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    out = (
        parts.groupby("split", sort=False)
        .agg(
            n_docs=("n_docs", "sum"),
            sum_chars=("sum_chars", "sum"),
            min_doc_id=("min_doc_id", "min"),
            max_doc_id=("max_doc_id", "max"),
        )
        .reset_index()
        .sort_values("split")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "sum_chars", "min_doc_id", "max_doc_id"):
        out[c] = out[c].astype("int64")
    return out[["split", "n_docs", "sum_chars", "min_doc_id", "max_doc_id"]]


EPOCH_SHUFFLE_SEED = 17
EPOCH_SHUFFLE_K = 20


def epoch_shuffle_head(sf_dir: str, seed: int = EPOCH_SHUFFLE_SEED, k: int = EPOCH_SHUFFLE_K) -> pd.DataFrame:
    """Deterministic EPOCH SHUFFLE order (the trainer's data-order contract:
    every rerun of epoch ``seed`` must visit docs in the same pseudo-random
    order, with no driver-held permutation): each doc's position key is
    md5('seed:doc_id') — shuffle-as-sort, so the order exists without ever
    materializing a permutation anywhere. Returns the first ``k`` docs of
    the epoch (what the trainer's first batches read), rank-stamped.

    Distribution: per-block top-k partials (each block ships ≤ k rows) +
    one k×#blocks driver merge — identical shape to the engine's top-k
    scoring partials, O(k) driver state at any corpus size. Keys are
    64-bit-collision-free in practice but ties break on doc_id anyway
    (frozen total order)."""
    import hashlib

    ds = _docs(sf_dir, ["doc_id"])

    def key_of(ids) -> np.ndarray:
        return np.fromiter(
            (
                int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )

    def per_block_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keys = key_of(ids)
        order = np.lexsort((ids, keys))[:k]
        return pa.Table.from_pydict(
            {"doc_id": ids[order], "shuffle_key": keys[order]}
        )

    parts = ds.map_batches(per_block_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["shuffle_key", "doc_id"]).head(k).reset_index(drop=True)
    parts.insert(0, "rank", np.arange(1, len(parts) + 1, dtype=np.int64))
    parts["doc_id"] = parts["doc_id"].astype("int64")
    parts["shuffle_key"] = parts["shuffle_key"].astype("int64")
    return parts[["rank", "doc_id", "shuffle_key"]]
