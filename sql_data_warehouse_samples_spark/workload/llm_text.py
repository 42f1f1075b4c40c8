"""Text-analysis + dedup workload over the documents table.

Driver-mandated LLM-pipeline surface (BASELINE.json north_star): token
counting, quality scoring, language-ID, fingerprinting, exact and near
dedup.  Implementations live in ``operators.text`` / ``operators.dedup``;
these queries bind them to the documents table with DuckDB oracles where
SQL-expressible (MinHash/SimHash banding is not reasonably SQL-expressible —
those get rows-only checks plus planted-duplicate unit tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import sampling as S_ops
from ..operators import text as T
from ..operators.sampling import split_sql as _split_sql
from . import query
from ._util import tbl

# ---------------------------------------------------------------------------
# t01 — token counting (whitespace + BPE-ish regex pieces).
# ---------------------------------------------------------------------------


@query(
    "t01_token_stats",
    oracle=r"""
SELECT
  doc_id,
  LENGTH(text) AS n_chars,
  LEN(string_split_regex(TRIM(text), '\s+')) AS n_tokens,
  LEN(list_distinct(string_split_regex(TRIM(text), '\s+'))) AS n_distinct_tokens,
  LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_word_pieces
FROM documents
""",
)
def t01_token_stats(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        T.token_count("text").alias("n_tokens"),
        T.distinct_token_count("text").alias("n_distinct_tokens"),
        T.word_token_count("text").alias("n_word_pieces"),
    )


# ---------------------------------------------------------------------------
# t02 — quality scoring (lexical diversity / length / stopword signal).
# ---------------------------------------------------------------------------

_SW = "'" + "','".join(T.DEFAULT_STOPWORDS) + "'"


@query(
    "t02_quality_score",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id, text, string_split_regex(TRIM(text), '\s+') AS toks
  FROM documents
)
SELECT
  doc_id,
  ROUND(LEN(list_distinct(toks)) / NULLIF(CAST(LEN(toks) AS DOUBLE), 0), 6) AS distinct_ratio,
  ROUND(LEN(list_filter(toks, t -> list_contains([{_SW}], t)))
        / NULLIF(CAST(LEN(toks) AS DOUBLE), 0), 6) AS sw_ratio,
  ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9_\s]', '', 'g')))
        / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0), 6) AS punct_ratio,
  ROUND(0.5 * (LEN(list_distinct(toks)) / NULLIF(CAST(LEN(toks) AS DOUBLE), 0))
      + 0.3 * LEAST(CAST(LEN(toks) AS DOUBLE) / 100.0, 1.0)
      + 0.2 * (1.0 - LEN(list_filter(toks, t -> list_contains([{_SW}], t)))
                     / NULLIF(CAST(LEN(toks) AS DOUBLE), 0)), 6) AS quality_score
FROM tok
""",
)
def t02_quality_score(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    n = T.token_count("text").cast("double")
    distinct_ratio = T.distinct_token_count("text") / F.nullif(n, F.lit(0.0))
    sw_ratio = T.stopword_count("text") / F.nullif(n, F.lit(0.0))
    c = F.col("text")
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^A-Za-z0-9_\s]", ""))
    return d.select(
        "doc_id",
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(sw_ratio, 6).alias("sw_ratio"),
        F.round(n_punct / F.nullif(F.length(c).cast("double"), F.lit(0.0)), 6).alias(
            "punct_ratio"
        ),
        T.quality_score("text").alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# t03 — language identification (marker-word profile heuristic).
# ---------------------------------------------------------------------------


def _marker_sql(lang: str) -> str:
    words = "'" + "','".join(T.LANGUAGE_PROFILES[lang]) + "'"
    return (
        rf"LEN(list_filter(string_split_regex(TRIM(text), '\s+'),"
        rf" t -> list_contains([{words}], t)))"
    )


@query(
    "t03_language_id",
    oracle=rf"""
WITH hits AS (
  SELECT doc_id, lang,
         {_marker_sql('en')} AS h_en,
         {_marker_sql('fr')} AS h_fr,
         {_marker_sql('de')} AS h_de,
         {_marker_sql('es')} AS h_es,
         {_marker_sql('zh')} AS h_zh
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN GREATEST(h_en, h_fr, h_de, h_es, h_zh) <= 0 THEN 'und'
            WHEN h_en = GREATEST(h_en, h_fr, h_de, h_es, h_zh) THEN 'en'
            WHEN h_fr = GREATEST(h_en, h_fr, h_de, h_es, h_zh) THEN 'fr'
            WHEN h_de = GREATEST(h_en, h_fr, h_de, h_es, h_zh) THEN 'de'
            WHEN h_es = GREATEST(h_en, h_fr, h_de, h_es, h_zh) THEN 'es'
            ELSE 'zh' END AS predicted_lang
FROM hits
""",
)
def t03_language_id(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", T.language_id("text").alias("predicted_lang"))


# ---------------------------------------------------------------------------
# t04 — document fingerprinting (normalized-content + token-bag md5).
# ---------------------------------------------------------------------------


@query(
    "t04_fingerprints",
    oracle=r"""
SELECT
  doc_id,
  SUBSTRING(md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')), 1, 16) AS content_fp,
  SUBSTRING(md5(array_to_string(list_sort(list_distinct(
      string_split_regex(TRIM(text), '\s+'))), ' ')), 1, 16) AS bag_fp
FROM documents
""",
)
def t04_fingerprints(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.content_fingerprint("text").alias("content_fp"),
        T.bag_fingerprint("text").alias("bag_fp"),
    )


# ---------------------------------------------------------------------------
# d01 — exact dedup via content-hash groupBy (hash-partitioned, skew-free).
# ---------------------------------------------------------------------------


@query(
    "d01_dedup_exact",
    oracle=r"""
SELECT md5(regexp_replace(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS content_hash,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keep_id
FROM documents
GROUP BY 1
""",
)
def d01_dedup_exact(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    deduped = D.exact_dedup(d, "text", "doc_id")
    return deduped.groupBy("content_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_id"),
    )


# ---------------------------------------------------------------------------
# d02 — n-gram (token-set) Jaccard similarity pairs on a bounded slice
# (the exact verifier used downstream of LSH candidates).
# ---------------------------------------------------------------------------


@query(
    "d02_ngram_jaccard_pairs",
    oracle=r"""
WITH docs AS (
  SELECT doc_id, list_distinct(string_split_regex(TRIM(text), '\s+')) AS toks
  FROM documents WHERE doc_id < 40
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(LEN(list_intersect(a.toks, b.toks))
             / NULLIF(CAST(LEN(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 0),
             6) AS jaccard_sim
FROM docs a JOIN docs b ON a.doc_id < b.doc_id
WHERE LEN(list_intersect(a.toks, b.toks))
      / NULLIF(CAST(LEN(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 0) >= 0.6
""",
)
def d02_ngram_jaccard_pairs(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    toks = d.select(
        "doc_id", F.array_distinct(T.tokens("text")).alias("toks")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks"))).cast("double")
    raw_sim = inter / F.nullif(union, F.lit(0.0))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            raw_sim.alias("raw_sim"),
        )
        .filter(F.col("raw_sim") >= 0.6)
        .select("id_a", "id_b", F.round("raw_sim", 6).alias("jaccard_sim"))
    )


# ---------------------------------------------------------------------------
# d03/d04 — MinHash-LSH and SimHash near-dedup (banding is not reasonably
# SQL-expressible → rows-only driver check; planted-duplicate recall tests
# live in tests/test_operators.py).
# ---------------------------------------------------------------------------


@query("d03_minhash_lsh_pairs")
def d03_minhash_lsh_pairs(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(d, "text", "doc_id", threshold=0.5)


@query("d04_simhash_pairs")
def d04_simhash_pairs(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return D.simhash_dedup_pairs(d, "text", "doc_id", max_hamming=8)


# ---------------------------------------------------------------------------
# d05 — embedding-cosine near-dup: exact all-pairs baseline (oracle-checked);
# the LSH-blocked scale path of the same operator is covered by recall tests
# in tests/test_operators.py.
# ---------------------------------------------------------------------------

_D05_DOT = (
    "list_sum(list_transform(list_zip(a.embedding, b.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_D05_NA = "sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
_D05_NB = "sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"


@query(
    "d05_embedding_neardup",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_D05_DOT} / NULLIF({_D05_NA} * {_D05_NB}, 0), 6) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND({_D05_DOT} / NULLIF({_D05_NA} * {_D05_NB}, 0), 6) >= 0.4
""",
)
def d05_embedding_neardup(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs(e, "vec_id", "embedding", threshold=0.4)


# ---------------------------------------------------------------------------
# d06 — deterministic train/val/test split (operators/sampling.py): keyed
# md5-hash assignment, map-only, stable under repartitioning, bit-identical
# across engines (the oracle computes the same hex-threshold CASE).
# ---------------------------------------------------------------------------

_D06_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@query(
    "d06_train_test_split",
    oracle=f"""
SELECT {_split_sql('doc_id', _D06_WEIGHTS, seed='corpus-v1')} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id
FROM documents
GROUP BY 1
""",
)
def d06_train_test_split(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    return (
        S_ops.train_test_split(d, "doc_id", _D06_WEIGHTS, seed="corpus-v1")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )
