"""Text-analysis operators: language-ID, quality scoring, token stats,
document fingerprinting.  Pure-arithmetic heuristics chosen so the
DuckDB oracle computes bit-identical values (integer counts, division
of exact ints, polynomial hashes in int64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Marker-word lists per language (counted as ' word ' substring
# occurrences over ' ' || text || ' ').  Deliberately simple — the
# operator under test is the distributed argmax scoring, not NLP.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "row"),
    "de": ("der", "die", "und", "wert"),
    "es": ("el", "la", "valor", "fila"),
    "fr": ("le", "la", "valeur", "ligne"),
    "zh": ("biao", "lie", "zhi", "hang"),
}
LANG_ORDER = tuple(sorted(LANG_MARKERS))  # deterministic tie-break order

FP_MOD = 2147483647
FP_BASE = 31


def count_occurrences(hay: str, needle: str) -> int:
    """Non-overlapping substring count (== DuckDB length/replace trick)."""
    return hay.count(needle)


class LangId:
    """Predicted language = argmax over marker-set hit counts; ties and
    zero-hits -> 'und'.  Vectorized per batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        scores = np.zeros((n, len(LANG_ORDER)), dtype=np.int64)
        for i, t in enumerate(texts):
            padded = " " + t + " "
            for j, lang in enumerate(LANG_ORDER):
                scores[i, j] = sum(
                    count_occurrences(padded, " " + m + " ")
                    for m in LANG_MARKERS[lang]
                )
        best = scores.argmax(axis=1)
        best_v = scores.max(axis=1)
        # tie -> first in LANG_ORDER wins (argmax), but all-zero -> 'und'
        pred = np.array(
            [LANG_ORDER[b] if v > 0 else "und" for b, v in zip(best, best_v)],
            dtype=object,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(pred, type=pa.string()),
                "score": pa.array(best_v),
            }
        )


def langid_sql() -> str:
    score_exprs = []
    for lang in LANG_ORDER:
        parts = " + ".join(
            f"CAST((length(p) - length(replace(p, ' {m} ', ''))) // {len(m) + 2} AS BIGINT)"
            for m in LANG_MARKERS[lang]
        )
        score_exprs.append(f"({parts}) AS s_{lang}")
    score_sel = ", ".join(score_exprs)
    greatest = "greatest(" + ", ".join(f"s_{l}" for l in LANG_ORDER) + ")"
    # argmax with first-in-LANG_ORDER tie-break == CASE scanning in order
    case = " ".join(f"WHEN s_{l} = g THEN '{l}'" for l in LANG_ORDER)
    return (
        "WITH p AS MATERIALIZED (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),"
        f" s AS MATERIALIZED (SELECT doc_id, {score_sel} FROM p),"
        f" g AS MATERIALIZED (SELECT doc_id, *, {greatest} AS g FROM s)"
        f" SELECT doc_id, CASE WHEN g = 0 THEN 'und' {case} END AS pred_lang,"
        " g AS score FROM g"
    )


class QualityScorer:
    """Per-doc quality features: token count, mean token length,
    alpha-char ratio, stopword ratio.  All ratios are divisions of
    exact integers (bit-identical in SQL)."""

    STOPWORDS = ("the", "a", "and", "of")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tok = np.empty(len(texts), dtype=np.int64)
        n_alpha = np.empty(len(texts), dtype=np.int64)
        n_chars = np.empty(len(texts), dtype=np.int64)
        n_stop = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = t.split()
            n_tok[i] = len(toks)
            n_chars[i] = len(t)
            n_alpha[i] = sum(1 for c in t if ("a" <= c <= "z") or ("A" <= c <= "Z"))
            padded = " " + t + " "
            n_stop[i] = sum(padded.count(f" {w} ") for w in self.STOPWORDS)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "alpha_ratio": pa.array(n_alpha.astype(np.float64) / n_chars),
                "stop_ratio": pa.array(n_stop.astype(np.float64) / n_tok),
            }
        )


def quality_sql() -> str:
    stop = " + ".join(
        f"CAST((length(p) - length(replace(p, ' {w} ', ''))) // {len(w) + 2} AS BIGINT)"
        for w in QualityScorer.STOPWORDS
    )
    return (
        "WITH p AS MATERIALIZED (SELECT doc_id, text, ' ' || text || ' ' AS p FROM documents)"
        " SELECT doc_id,"
        " CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,"
        " CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)"
        "   / CAST(length(text) AS BIGINT) AS alpha_ratio,"
        f" CAST(({stop}) AS BIGINT)"
        "   / CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)"
        "   AS stop_ratio"
        " FROM p"
    )


class Fingerprinter:
    """Rolling polynomial hash of the raw text, h = fold(h*31 + code)
    mod (2^31 - 1), seeded with the first char code (matches DuckDB
    list_reduce).  Vectorized across the batch by iterating char
    positions (max_len passes over an int32 matrix)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        out = np.zeros(n, dtype=np.int64)
        if n:
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            mx = int(lens.max())
            codes = np.zeros((n, mx), dtype=np.int64)
            for i, t in enumerate(texts):
                codes[i, : len(t)] = np.frombuffer(
                    t.encode("latin-1", "replace"), dtype=np.uint8
                )
            h = codes[:, 0].copy()
            for j in range(1, mx):
                active = j < lens
                h = np.where(active, (h * FP_BASE + codes[:, j]) % FP_MOD, h)
            out = h
        return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(out)})


def fingerprint_sql() -> str:
    return (
        "SELECT doc_id,"
        " list_reduce([CAST(ascii(substr(text, i, 1)) AS BIGINT)"
        "   for i in generate_series(1, length(text))],"
        f"  (h, c) -> (h * {FP_BASE} + c) % {FP_MOD}) AS fp"
        " FROM documents"
    )
