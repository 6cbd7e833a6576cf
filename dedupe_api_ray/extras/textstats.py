"""Text-analysis operators for large-scale training-data pipelines
(driver-brief additions beyond the reference's own operator set):
language-ID (n-gram heuristic), quality scoring, token counting,
document fingerprinting (rolling hash).

All are stateless vectorized ``map_batches`` stages over a ``text``
column; tokenization uses the engine-wide ASCII ``[\\w']+`` tokenizer
so the DuckDB oracle can reproduce the SQL-expressible ones
(token/char counts, ratios) exactly.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedupe_api_ray.functions.text import TOKEN_RE

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "que"},
}

# tiny per-language character-trigram profiles (hand-pinned heuristic;
# deterministic, no external model — the stub-quality langid the brief
# asks for, marked as heuristic in its queries() entry)
_LANG_TRIGRAMS = {
    "en": {"the", "ing", "and", "ion", "ent", "her", "for", "tha"},
    "de": {"der", "ein", "sch", "ich", "nde", "die", "und", "cht"},
    "fr": {"les", "ent", "que", "our", "ait", "ion", "eur", "ais"},
    "es": {"que", "los", "ent", "ado", "con", "cio", "las", "una"},
}


def round6(x: float) -> float:
    """Round half away from zero at 6 dp — matches SQL ROUND (DuckDB),
    unlike Python/numpy banker's rounding; keeps engine and oracle
    value-hashes identical on exact .5 ulp cases."""
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens via the engine tokenizer.  SQL oracle:
    len(regexp_extract_all(text, TOKEN_PATTERN_SQL))."""
    texts = batch[text_col].to_pylist()
    counts = [len(TOKEN_RE.findall(t)) if t else 0 for t in texts]
    return batch.append_column("n_tokens", pa.array(counts, pa.int64()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: n_tokens, mean token length, stopword ratio
    (en), alpha ratio.  Ratios rounded to 6 dp for oracle-stable
    hashing."""
    texts = batch[text_col].to_pylist()
    n_tok, mean_len, stop_ratio, alpha_ratio = [], [], [], []
    en_stop = _STOPWORDS["en"]
    for t in texts:
        toks = TOKEN_RE.findall(t.lower()) if t else []
        n = len(toks)
        n_tok.append(n)
        mean_len.append(round6(sum(map(len, toks)) / n) if n else 0.0)
        stop_ratio.append(round6(sum(1 for w in toks if w in en_stop) / n)
                          if n else 0.0)
        # ASCII letters only, pinned to the oracle's '[^A-Za-z]' class
        # (Python isalpha is Unicode and diverges on non-ASCII text)
        n_alpha = sum(1 for c in (t or "")
                      if "a" <= c <= "z" or "A" <= c <= "Z")
        alpha_ratio.append(round6(n_alpha / len(t)) if t else 0.0)
    return batch.append_column("n_tokens", pa.array(n_tok, pa.int64())) \
        .append_column("mean_token_len", pa.array(mean_len, pa.float64())) \
        .append_column("stopword_ratio", pa.array(stop_ratio, pa.float64())) \
        .append_column("alpha_ratio", pa.array(alpha_ratio, pa.float64()))


class LangId:
    """Actor-pool language-ID stage: trigram-profile vote + stopword
    tie-break.  State (profiles) built once per actor."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_TRIGRAMS.items()}
        self.stop = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def predict(self, text: str | None) -> str:
        if not text:
            return "und"
        t = text.lower()
        toks = TOKEN_RE.findall(t)
        scores = {}
        tris = {t[i:i + 3] for i in range(len(t) - 2)}
        for lang, prof in self.profiles.items():
            s = len(tris & prof)
            s += 2 * sum(1 for w in toks[:50] if w in self.stop[lang])
            scores[lang] = s
        best = max(sorted(scores), key=lambda k: scores[k])
        return best if scores[best] > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch["text"].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      window: int = 16) -> pa.Table:
    """Document fingerprint: min rolling (Karp-Rabin) hash over char
    windows — a winnowing-style content fingerprint usable for
    shift-robust near-dup keys."""
    base = np.uint64(1000003)
    mod_mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    out = []
    for t in batch[text_col].to_pylist():
        if not t or len(t) < window:
            out.append(0)
            continue
        codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        n = len(codes)
        # rolling hash via prefix powers (vectorized)
        pows = np.empty(window, dtype=np.uint64)
        pows[0] = 1
        for i in range(1, window):
            pows[i] = (pows[i - 1] * base) & mod_mask
        win = np.lib.stride_tricks.sliding_window_view(codes, window)
        h = (win * pows[::-1]).sum(axis=1, dtype=np.uint64)
        out.append(int(h.min() & np.uint64(0x7FFFFFFFFFFFFFFF)))
    return batch.append_column("fingerprint", pa.array(out, pa.int64()))


def repetition_stats_batch(batch: pa.Table,
                           text_col: str = "text") -> pa.Table:
    """Intra-document repetition heuristics (Gopher-style quality
    filters, Rae et al. 2021): ``top_token_ratio`` — the share of the
    single most frequent token — and ``dup_bigram_fraction`` — the
    share of bigram OCCURRENCES whose bigram repeats within the doc.
    High values mark boilerplate/keyword-stuffed pages that
    document-level dedup misses.  One row per input doc with >= 1
    token (matching the SQL oracle's unnest semantics); ratios rounded
    half-away at 6 dp."""
    ids_in = batch.column_names[0]  # caller selects (id, text)
    out_id, n_tok, top_r, dup_b = [], [], [], []
    for did, t in zip(batch[ids_in].to_pylist(),
                      batch[text_col].to_pylist()):
        toks = TOKEN_RE.findall(t.lower()) if t else []
        n = len(toks)
        if n == 0:
            continue
        arr = np.asarray(toks, dtype=object)
        _, cnt = np.unique(arr, return_counts=True)
        out_id.append(did)
        n_tok.append(n)
        top_r.append(round6(int(cnt.max()) / n))
        if n < 2:
            dup_b.append(0.0)
            continue
        big = np.asarray([f"{a} {b}" for a, b in zip(toks, toks[1:])],
                         dtype=object)
        _, bc = np.unique(big, return_counts=True)
        dup_b.append(round6(int(bc[bc > 1].sum()) / (n - 1)))
    return pa.table({ids_in: pa.array(out_id, pa.int64()),
                     "n_tokens": pa.array(n_tok, pa.int64()),
                     "top_token_ratio": pa.array(top_r, pa.float64()),
                     "dup_bigram_fraction": pa.array(dup_b, pa.float64())})


def add_text_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(lambda t: quality_score_batch(t, text_col),
                          batch_format="pyarrow")
