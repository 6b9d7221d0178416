"""Text-analysis operators over the documents table — all native column
math except the rolling-hash fingerprint (vectorized numpy).

- token_stats: whitespace tokenization + length/stopword/quality features.
  Kept to exact-SQL-expressible primitives so the DuckDB oracle can verify
  value-for-value.
- lang_id: character n-gram heuristic language guesser (no external model;
  scored against the fixture's lang column in pytest).
- fingerprint: Karp-Rabin rolling hash over codepoints (winnowing-style
  document fingerprint), Arrow-vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_STOP = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars2, stop_ratio_micro, quality_bucket).

    quality_bucket: 'short' (<16 tokens), 'stopheavy' (stop ratio > 0.3),
    else 'ok' — a deterministic, SQL-checkable quality score. Ratios are
    reported in integer micro-units so the DuckDB oracle hash matches
    bit-for-bit.
    """
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(_STOP)))
    ratio = n_stop / n_tok
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars2"),
        F.round(ratio * 1e6).cast("long").alias("stop_ratio_micro"),
        F.when(n_tok < 16, "short")
        .when(ratio > 0.3, "stopheavy")
        .otherwise("ok")
        .alias("quality_bucket"),
    )


#: language -> characteristic character trigrams (hand-picked, public
#: knowledge; fixture langs: en de fr es zh)
_LANG_MARKERS = {
    "zh": None,  # CJK codepoint test instead of trigram
    "de": [" der ", " und ", " die ", "sch", "ein"],
    "fr": [" le ", " la ", " les ", " des ", " est "],
    "es": [" el ", " los ", " las ", " que ", "ción"],
    "en": [" the ", " and ", " of ", " is ", " to "],
}


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: CJK-codepoint share for zh, else argmax of
    marker-trigram counts. Score ties resolve to the lexicographically LAST
    language code (F.greatest over (score, lang) structs; the DuckDB oracle
    orders by `l DESC` to match). Output: (doc_id, lang_pred)."""
    t = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        if markers is None:
            continue
        cnt = sum(
            (F.length(t) - F.length(F.replace(t, F.lit(m), F.lit("")))) / len(m) for m in markers
        )
        scores.append(F.struct(cnt.cast("double").alias("s"), F.lit(lang).alias("l")))
    best = F.greatest(*scores)
    has_cjk = F.col("text").rlike("[\\u4e00-\\u9fff]")
    return docs.select(
        "doc_id",
        F.when(has_cjk, F.lit("zh")).otherwise(best.getField("l")).alias("lang_pred"),
    )


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """BPE-ish token estimate: words split on whitespace AND punctuation,
    long words counted as ceil(len/4) subword tokens (the usual ~4 chars
    per BPE token heuristic). Output: (doc_id, n_words, n_bpe_est)."""
    words = F.split(F.col("text"), "[\\s\\p{Punct}]+")
    words = F.filter(words, lambda w: w != "")
    n_words = F.size(words)
    bpe = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        bpe.alias("n_bpe_est"),
    )


def fingerprint(docs: DataFrame, window: int = 8, prime: int = 1_000_003) -> DataFrame:
    """Karp-Rabin rolling hash fingerprint: min rolling hash over all
    length-`window` codepoint windows (a 1-fingerprint winnowing). Output:
    (doc_id, fp bigint). Arrow-vectorized numpy, no per-row Python loops
    over characters."""

    @pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        base = np.int64(131)
        mod = np.int64((1 << 31) - 1)
        out = np.zeros(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            if len(cps) < window:
                cps = np.pad(cps, (0, window - len(cps)))
            m = len(cps) - window + 1
            # Horner evaluation vectorized across ALL window positions at
            # once: `window` iterations, each a full-array op (no per-window
            # Python). int64-safe: h < 2^31, h*131 + cp < 2^39.
            h = np.zeros(m, dtype=np.int64)
            for j in range(window):
                h = (h * base + cps[j : j + m]) % mod
            out[i] = int(h.min()) % prime
        return pd.Series(out)

    return docs.select("doc_id", fp(F.col("text")).alias("fp"))
