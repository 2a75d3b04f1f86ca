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
        # Empty / whitespace-only docs: define both ratios as 0.0 (the
        # SQL oracle mirrors this with CASE guards) instead of 0/0.
        alpha = np.where(
            n_chars > 0, n_alpha / np.maximum(n_chars, 1).astype(np.float64), 0.0
        )
        stop = np.where(
            n_tok > 0, n_stop / np.maximum(n_tok, 1).astype(np.float64), 0.0
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "alpha_ratio": pa.array(alpha),
                "stop_ratio": pa.array(stop),
            }
        )


def quality_sql() -> str:
    stop = " + ".join(
        f"CAST((length(p) - length(replace(p, ' {w} ', ''))) // {len(w) + 2} AS BIGINT)"
        for w in QualityScorer.STOPWORDS
    )
    # Whitespace-only text: Python str.split() yields 0 tokens while
    # regexp_split_to_array yields [''] (1) — guard with CASE so both
    # sides agree (n_tokens 0, ratios 0.0).
    ntok = (
        "CASE WHEN trim(text) = '' THEN 0"
        " ELSE CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"
    )
    return (
        "WITH p AS MATERIALIZED (SELECT doc_id, text, ' ' || text || ' ' AS p FROM documents),"
        f" q AS MATERIALIZED (SELECT doc_id, text, p, {ntok} AS n_tokens FROM p)"
        " SELECT doc_id, n_tokens,"
        " CASE WHEN length(text) = 0 THEN 0.0"
        "   ELSE CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)"
        "   / CAST(length(text) AS BIGINT) END AS alpha_ratio,"
        " CASE WHEN n_tokens = 0 THEN 0.0"
        f"   ELSE CAST(({stop}) AS BIGINT) / n_tokens END AS stop_ratio"
        " FROM q"
    )


class Fingerprinter:
    """Rolling polynomial hash of the raw text, h = fold(h*31 + code)
    mod (2^31 - 1), seeded with the first char code (matches DuckDB
    list_reduce).  Vectorized across the batch by iterating char
    positions (max_len passes over an int64 matrix).  Codes are full
    Unicode code points (utf-32 decode, == DuckDB ascii(substr(...)))
    so non-Latin-1 text fingerprints identically on both sides."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        out = np.zeros(n, dtype=np.int64)
        if n:
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            mx = max(int(lens.max()), 1)  # empty docs fingerprint to 0
            codes = np.zeros((n, mx), dtype=np.int64)
            for i, t in enumerate(texts):
                codes[i, : len(t)] = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
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
        " CASE WHEN length(text) = 0 THEN 0 ELSE"
        " list_reduce([CAST(ascii(substr(text, i, 1)) AS BIGINT)"
        "   for i in generate_series(1, length(text))],"
        f"  (h, c) -> (h * {FP_BASE} + c) % {FP_MOD}) END AS fp"
        " FROM documents"
    )


# ---------------------------------------------------------------------------
# PII redaction (engine-only LLM-pipeline operator, round 3).
# Both Arrow and DuckDB bind RE2, so leftmost-first global replace is
# bit-identical between pc.replace_substring_regex and
# regexp_replace(..., 'g') — the whole scrub is oracle-verifiable.
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1 [0-9]{3} [0-9]{3} [0-9]{4}"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# fixed scrub order: emails first (they contain dots/digits), then
# phones, then IPs — the SQL oracle mirrors the same chain
PII_CHAIN = [(PII_EMAIL, "[EMAIL]"), (PII_PHONE, "[PHONE]"), (PII_IP, "[IP]")]


def pii_counts(arr: "pa.Array"):
    """(n_email, n_phone, n_ip) int64 numpy arrays, counted on the
    ORIGINAL text (the three patterns are mutually non-overlapping)."""
    import pyarrow.compute as pc

    return tuple(
        pc.count_substring_regex(arr, pat).to_numpy(zero_copy_only=False)
        .astype(np.int64)
        for pat, _ in PII_CHAIN
    )


def pii_redact(arr: "pa.Array") -> "pa.Array":
    """Scrub all three PII classes with typed placeholder tokens."""
    import pyarrow.compute as pc

    for pat, tok in PII_CHAIN:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=tok)
    return arr
