"""Text inventory queries — wordcount family + LLM-pipeline text analysis.

All run over the driver's `documents` table; oracle fragments come from the
same module as the Spark builders so tokenization can't drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.rounding import duck_fround
from ..functions.text_metrics import (
    BPE_ISH,
    LANG_MARKERS,
    STOPWORDS,
    duck_tokens,
    fingerprint,
    grep_count,
    lang_id,
    quality_score,
    token_count,
    word_counts,
    word_length_stats,
)
from ..session import table as T
from .registry import register

_TOKS = duck_tokens("text")


@register(
    "word_count",
    oracle=f"""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest({_TOKS}) AS word FROM documents)
        GROUP BY word
    """,
    ref="MR-EX/WordCount.java + TokenCounterMapper — explode(split)+groupBy.count",
)
def word_count(spark, sf_dir):
    return word_counts(T(spark, sf_dir, "documents"))


@register(
    "word_stats",
    oracle=f"""
        SELECT count(*) AS n_words,
               {duck_fround('avg(length(word))', 4)} AS mean_len,
               {duck_fround('median(length(word))', 4)} AS median_len,
               round(stddev_pop(length(word)), 4) AS stddev_len,
               min(length(word)) AS min_len,
               max(length(word)) AS max_len
        FROM (SELECT unnest({_TOKS}) AS word FROM documents)
    """,
    ref="WordMean.java:54-81, WordMedian.java:154-158 (even-count midpoint), WordStandardDeviation.java:137-169",
)
def word_stats(spark, sf_dir):
    return word_length_stats(T(spark, sf_dir, "documents"))


@register(
    "grep_regex_count",
    oracle="""
        SELECT match, count(*) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '(s[a-z]+)', 1)) AS match
              FROM documents)
        GROUP BY match
        ORDER BY cnt DESC, match
    """,
    ref="MR-EX/Grep.java:55-70 + RegexMapper.java:36-49 — regex-count then sort desc",
)
def grep_regex_count(spark, sf_dir):
    return grep_count(T(spark, sf_dir, "documents"), r"(s[a-z]+)", 1)


@register(
    "doc_token_count",
    oracle=f"""
        SELECT doc_id,
               len({_TOKS}) AS n_ws_tokens,
               len(regexp_extract_all(lower(text), '{BPE_ISH}', 0)) AS n_bpe_tokens
        FROM documents
    """,
    ref="token counting (whitespace + BPE-ish regex) — LLM-pipeline op",
)
def doc_token_count(spark, sf_dir):
    return token_count(T(spark, sf_dir, "documents"))


_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


_PUNCT = "(length(lt) - length(regexp_replace(lt, '[^a-z0-9\\s]', '', 'g')))"
_PR = f"{_PUNCT} / greatest(non_ws, 1)"
_SR = f"len(list_filter(toks, x -> x IN ({_SW}))) / greatest(len(toks), 1)"
_SCORE = f"least(len(toks) / 100.0, 1.0) * (1 - {_PR}) * (0.5 + {_SR})"


@register(
    "doc_quality",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lower(text) AS lt, {_TOKS.replace('text', 'text')} AS toks,
                   length(regexp_replace(lower(text), '\\s+', '', 'g')) AS non_ws
            FROM documents
        )
        SELECT doc_id,
               length(lt) AS n_chars,
               len(toks) AS n_tokens,
               {duck_fround(_PR, 4)} AS punct_ratio,
               {duck_fround(_SR, 4)} AS stopword_ratio,
               {duck_fround(_SCORE, 4)} AS quality
        FROM t
    """,
    ref="quality scoring (length/punct/stopword ratios) — LLM-pipeline op",
)
def doc_quality(spark, sf_dir):
    return quality_score(T(spark, sf_dir, "documents"))


_LANG_SCORES = ",\n               ".join(
    f"CAST((length(p) - length(replace(p, '{m}', ''))) / {len(m)} AS BIGINT) AS score_{k}"
    for k, m in LANG_MARKERS.items()
)


@register(
    "doc_lang_id",
    oracle=f"""
        WITH padded AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
        s AS (
            SELECT doc_id,
               {_LANG_SCORES}
            FROM padded
        )
        SELECT doc_id, score_en, score_fr, score_de, score_es,
               CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es THEN 'en'
                    WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
                    WHEN score_de >= score_es THEN 'de'
                    ELSE 'es' END AS lang_pred
        FROM s
    """,
    ref="language-ID n-gram-marker heuristic — LLM-pipeline op",
)
def doc_lang_id(spark, sf_dir):
    return lang_id(T(spark, sf_dir, "documents"))


_LANG_PRED = """
        CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es THEN 'en'
             WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
             WHEN score_de >= score_es THEN 'de'
             ELSE 'es' END
"""


@register(
    "lang_id_confusion",
    oracle=f"""
        WITH padded AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents),
        s AS (SELECT doc_id, lang, {_LANG_SCORES} FROM padded)
        SELECT lang AS gold, {_LANG_PRED} AS pred, count(*) AS n
        FROM s GROUP BY 1, 2
    """,
    ref="language-ID evaluation: confusion matrix of the heuristic against the gold lang "
    "column — the eval op a training-data pipeline runs on every classifier stage",
)
def lang_id_confusion(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    pred = lang_id(d).select("doc_id", "lang_pred")
    return (
        d.select("doc_id", F.col("lang").alias("gold"))
        .join(pred, "doc_id")
        .groupBy("gold", F.col("lang_pred").alias("pred"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "doc_top_bigrams",
    oracle=f"""
        SELECT bigram, count(*) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
            FROM (SELECT {_TOKS} AS toks FROM documents)
            WHERE len(toks) >= 2
        )
        GROUP BY bigram
        HAVING count(*) >= 10
    """,
    ref="word-bigram frequency (n-gram table over the corpus; the shingle machinery at n=2 "
    "without the per-doc distinct) — LLM-pipeline text analysis",
)
def doc_top_bigrams(spark, sf_dir):
    from ..functions.text_metrics import tokens

    d = T(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat(
            F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + 1)
        ),
    )
    return (
        d.select(toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 10)
    )


@register(
    "doc_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    """,
    ref="document fingerprinting (normalized md5) — LLM-pipeline op",
)
def doc_fingerprint(spark, sf_dir):
    return fingerprint(T(spark, sf_dir, "documents"))
