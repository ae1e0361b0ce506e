"""Text-analysis operators for training-data pipelines.

Beyond the reference's own operator set (SURVEY.md §2 covers ALCO's),
these are the text ops a large-scale training-data pipeline needs:
token stats, quality scoring, language ID, document fingerprinting.
All vectorized (pyarrow.compute / numpy / pandas-hash) map_batches
bodies; langid is a stateful actor-pool class (profiles built once per
actor).

Determinism: all hashing uses ``pandas.util.hash_array`` (SipHash with
a fixed key) — stable across runs, processes and partitionings, unlike
Python's seeded ``hash``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .parse import TOKENIZE_SPLIT, tokenize

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def token_stats(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """(id, n_tokens, n_uniq_tokens) per document."""
    toks = tokenize(batch[text_col], batch.num_rows)
    n = pc.cast(pc.list_value_length(toks), pa.int64())
    # distinct count per list: flatten -> (parent, token) -> local groupby
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    t = pa.table({"p": parents, "tok": flat})
    uniq = (t.group_by(["p", "tok"]).aggregate([])
            .group_by(["p"]).aggregate([([], "count_all")]))
    counts = np.zeros(batch.num_rows, dtype=np.int64)
    counts[uniq["p"].to_numpy()] = uniq["count_all"].to_numpy()
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": n,
        "n_uniq_tokens": pa.array(counts, pa.int64()),
    })


def token_explode(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """(id, token) — one row per token occurrence (P4 flattened)."""
    toks = tokenize(batch[text_col], batch.num_rows)
    parents = pc.list_parent_indices(toks)
    ids = pc.take(batch[id_col].combine_chunks()
                  if isinstance(batch[id_col], pa.ChunkedArray)
                  else batch[id_col], parents)
    return pa.table({id_col: ids, "token": pc.list_flatten(toks)})


def quality_score(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Integer-exact quality features per document.

    All outputs are int64 so distributed and oracle results compare
    bit-for-bit (no float-sum order effects): character length, token
    count, stopword count, alphabetic character count, and
    ``alpha_ratio_millis`` = floor(1000 * alpha_chars / max(1, chars)).
    """
    text = batch[text_col]
    toks = tokenize(text, batch.num_rows)
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())

    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS)))
    stops = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(stops, parents.to_numpy(zero_copy_only=False),
              is_stop.to_numpy(zero_copy_only=False).astype(np.int64))

    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(text, "[a-zA-Z]"), pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    ratio = pc.divide(pc.multiply(n_alpha, pa.scalar(1000, pa.int64())), denom)
    return pa.table({
        id_col: batch[id_col],
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_stopwords": pa.array(stops, pa.int64()),
        "n_alpha": n_alpha,
        "alpha_ratio_millis": ratio,
    })


def hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash per token (vectorized SipHash)."""
    return pd.util.hash_array(tokens.astype(object), categorize=False)


def fingerprint(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Rolling polynomial fingerprint of the token stream -> int64.

    fp(doc) = sum_i h(tok_i) * B^(n-1-i)  (mod 2^64), B odd constant.
    Order-sensitive (unlike a bag-of-tokens hash) and mergeable by
    blocks if ever needed.  Returned as int64 (reinterpreted bits) so
    it round-trips Parquet/SQL engines without unsigned-type trouble.
    """
    toks = tokenize(batch[text_col], batch.num_rows)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    offsets = np.asarray(toks.offsets).astype(np.int64)
    h = hash_tokens(flat) if len(flat) else np.zeros(0, np.uint64)

    # Horner vectorized: fp = sum h_i * B^(L-1-i) over each segment,
    # via a precomputed power table + one segmented reduceat.
    B = np.uint64(0x100000001B3)  # FNV prime, odd
    lens = np.diff(offsets)
    max_len = int(lens.max()) if len(lens) else 0
    with np.errstate(over="ignore"):
        powtab = np.ones(max_len + 1, dtype=np.uint64)
        for k in range(1, max_len + 1):
            powtab[k] = powtab[k - 1] * B
        if len(flat):
            pos = np.arange(len(flat), dtype=np.int64)
            seg_end = np.repeat(offsets[1:], lens)
            exp = seg_end - 1 - pos
            contrib = h * powtab[exp]
            # reduceat over NON-empty segment starts only: empty
            # segments contribute no flat elements, so consecutive
            # non-empty starts are contiguous element ranges.  (Feeding
            # empty/clamped starts to reduceat shifts the previous
            # segment's end and silently corrupts its fingerprint.)
            out = np.zeros(batch.num_rows, dtype=np.uint64)
            nonempty = lens > 0
            out[nonempty] = np.add.reduceat(contrib,
                                            offsets[:-1][nonempty])
        else:
            out = np.zeros(batch.num_rows, dtype=np.uint64)
    return pa.table({id_col: batch[id_col],
                     "fingerprint": pa.array(out.view(np.int64), pa.int64())})


# Character-trigram profiles per language, built deterministically from
# tiny embedded seed text.  This is a heuristic n-gram language ID
# (stub-grade: real pipelines plug a model here); the Ray plumbing —
# stateful actor pool, vectorized scoring — is the real part.
_LANG_SEEDS = {
    "en": "the quick brown fox jumps over the lazy dog and this is a test of english text",
    "de": "der schnelle braune fuchs springt über den faulen hund und dies ist ein deutscher text",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et ceci est un texte francais",
    "es": "el rapido zorro marron salta sobre el perro perezoso y este es un texto en espanol",
    "ru": "быстрая коричневая лиса прыгает через ленивую собаку и это русский текст",
    "zh": "敏捷的棕色狐狸跳过懒狗这是一个中文文本测试",
}


class LangId:
    """Actor-pool language-ID stage: profiles built once per actor in
    ``__init__`` (the model-load analog), scored per batch."""

    def __init__(self, langs: dict[str, str] | None = None):
        seeds = langs or _LANG_SEEDS
        self.profiles: dict[str, set[str]] = {}
        for lang, seed in seeds.items():
            s = seed.lower()
            self.profiles[lang] = {s[i:i + 3] for i in range(len(s) - 2)}
        self.langs = sorted(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds, scores = [], []
        for t in texts:
            s = (t or "").lower()
            grams = {s[i:i + 3] for i in range(len(s) - 2)}
            best, best_score = self.langs[0], -1
            for lang in self.langs:
                sc = len(grams & self.profiles[lang])
                if sc > best_score:
                    best, best_score = lang, sc
            preds.append(best)
            scores.append(best_score)
        return pa.table({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(preds, pa.string()),
            "score": pa.array(scores, pa.int64()),
        })
