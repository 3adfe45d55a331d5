"""Text-analysis suite over ``documents`` — language ID, quality scoring,
token counting, fingerprinting (north-star scope, SURVEY §2.7).

Every metric is a pure Column expression (functions/text.py) mirrored in
DuckDB SQL, so the whole suite is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readwise_vector_db_spark.functions import text as T
from readwise_vector_db_spark.registry import register
from readwise_vector_db_spark.sources.tables import load_table

_TOKS = "string_split_regex(text, '\\s+')"
_TOKS_LOWER = "string_split_regex(lower(text), '\\s+')"
_SW_LIST = "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS) + "]"


def _marker_list(lang: str) -> str:
    return "[" + ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang]) + "]"


_PUNCT_N = "length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))"
_SW_RATIO = (
    f"CAST(len(list_filter({_TOKS_LOWER}, t -> list_contains({_SW_LIST}, t))) AS DOUBLE)"
    f" / len({_TOKS})"
)


@register(
    "text_stats",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_measured,
           len({_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]')) AS n_tokens_re,
           ROUND(CAST(list_aggregate(list_transform({_TOKS}, t -> length(t)), 'sum') AS DOUBLE)
                 / len({_TOKS}), 6) AS avg_token_len,
           ROUND(CAST(({_PUNCT_N}) AS DOUBLE) / length(text), 6) AS punct_ratio,
           ROUND({_SW_RATIO}, 6) AS stopword_ratio,
           ROUND(
             (CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN {_SW_RATIO} >= 0.05 AND {_SW_RATIO} <= 0.6 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN CAST(({_PUNCT_N}) AS DOUBLE) / length(text) <= 0.1
                     THEN 0.2 ELSE 0.0 END), 6) AS quality
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/length/quality metrics — one narrow projection,
    no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        T.n_tokens_ws("text").alias("n_tokens"),
        T.n_tokens_re("text").alias("n_tokens_re"),
        F.round(T.avg_token_len("text"), 6).alias("avg_token_len"),
        F.round(T.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(T.quality_score("text"), 6).alias("quality"),
    )


_LANG_SCORES = {
    lang: f"len(list_filter({_TOKS_LOWER}, t -> list_contains({_marker_list(lang)}, t)))"
    for lang in T.LANG_MARKERS
}
_MAX_SCORE = "greatest(" + ", ".join(f"s_{lang}" for lang in T.LANG_MARKERS) + ")"
_PRED_CASE = (
    "CASE WHEN " + _MAX_SCORE + " = 0 THEN 'und' "
    + " ".join(f"WHEN s_{lang} = {_MAX_SCORE} THEN '{lang}'" for lang in T.LANG_MARKERS)
    + " END"
)


@register(
    "lang_id",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {", ".join(f"{expr} AS s_{lang}" for lang, expr in _LANG_SCORES.items())}
        FROM documents
    )
    SELECT doc_id, lang, {_PRED_CASE} AS lang_pred FROM scored
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID next to the fixture's labeled lang column.
    (The synthetic corpus is English-ish for every label, so the value is
    parity/determinism, not accuracy.)"""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return docs.select("doc_id", "lang", T.lang_id("text").alias("lang_pred"))


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return docs.select("doc_id", T.fingerprint_md5("text").alias("fp"))


@register(
    "doc_fingerprint_rolling",
    f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(
                   CAST(0 AS BIGINT),
                   list_transform(
                       string_split_regex(lower(text), '\\s+'),
                       t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))),
               (a, b) -> (a * {T.ROLL_B} + b) % {T.ROLL_P}) AS roll_fp
    FROM documents
    """,
)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling (Rabin-Karp) token-stream fingerprint — the incrementally
    maintainable variant of doc_fingerprint."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return docs.select("doc_id", T.rolling_fingerprint("text").alias("roll_fp"))
