"""Trained character-n-gram language identification.

The t03 marker-word heuristic covers the mandate's baseline; real
pipelines train profiles (Cavnar & Trenkle 1994 "N-Gram-Based Text
Categorization", the fastText/langdetect lineage): per language, the
top-k most frequent character n-grams from labeled text, then score an
unlabeled document by how much of its n-gram mass the profile covers.

Scale shape:

* TRAIN — one explode→groupBy(lang, gram) aggregate with map-side
  combine (uniform hash key), a per-lang rank window over the gram
  table (lang-partitioned, never global), and a driver collect bounded
  by #languages × top_k rows (control-plane, like broadcast centroids).
* CLASSIFY — map-only: each language's profile becomes a literal
  gram→weight MAP in the plan; a document's score per language is a
  fold over its gram array (`aggregate` + `element_at`), and the argmax
  is a `greatest` over structs.  No join, no shuffle — the 100 TB side
  never exchanges.

Scoring is EXACT-integer: weight(gram) = the training count, score =
Σ_gram count_doc(gram) · weight(gram) over profile grams.  Integer sums
are order-independent, so a SQL oracle reproduces the classification
bit-for-bit (ties broken by language name ascending).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """All overlapping character n-grams of the column (empty array for
    texts shorter than n) — pure JVM higher-order functions."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(
        F.length(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - n + 1),
            lambda i: F.substring(c, i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_char_ngram_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 200,
) -> dict[str, dict[str, int]]:
    """Per-language {gram: count} profiles — the top_k most frequent
    char n-grams per language (ties broken by gram ascending, so the
    profile set is deterministic/engine-portable)."""
    from pyspark.sql import Window

    grams = docs.select(
        F.col(lang_col).alias("__lang"),
        F.explode(char_ngrams(text_col, n)).alias("__g"),
    )
    counted = grams.groupBy("__lang", "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy("__lang").orderBy(F.desc("__c"), F.asc("__g"))
    top = (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_k)
        .collect()
    )
    profiles: dict[str, dict[str, int]] = {}
    for r in top:
        profiles.setdefault(r["__lang"], {})[r["__g"]] = int(r["__c"])
    return profiles


def classify_language(
    docs: DataFrame,
    profiles: dict[str, dict[str, int]],
    text_col: str = "text",
    n: int = 3,
    out_col: str = "pred_lang",
    score_col: str = "lang_score",
) -> DataFrame:
    """Map-only classification against trained profiles: adds
    (pred_lang, lang_score) — argmax over Σ count_doc(gram)·weight(gram),
    ties broken by language ascending; documents matching NO profile
    gram get pred_lang NULL and score 0."""
    if not profiles:
        raise ValueError("profiles is empty — train first")
    langs = sorted(profiles)
    grams = F.array_sort(char_ngrams(text_col, n))
    with_g = docs.withColumn("__grams", grams)
    score_cols = []
    for lang in langs:
        prof = profiles[lang]
        entries = ", ".join(
            f"({_sql_str(g)}, {w}L)" for g, w in sorted(prof.items())
        )
        m = F.expr(f"map_from_entries(array({entries}))")
        score = F.aggregate(
            F.col("__grams"),
            F.lit(0).cast("long"),
            lambda acc, g: acc + F.coalesce(m[g], F.lit(0).cast("long")),
        )
        score_cols.append(score.alias(f"__s_{lang}"))
    scored = with_g.select("*", *score_cols)
    # argmax via greatest-over-structs: (score, reversed-lang) so equal
    # scores pick the ASCENDING language name deterministically
    best = F.greatest(
        *[
            F.struct(
                F.col(f"__s_{lang}").alias("s"),
                F.lit(len(langs) - i).alias("ord"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    ) if len(langs) > 1 else F.struct(
        F.col(f"__s_{langs[0]}").alias("s"),
        F.lit(1).alias("ord"),
        F.lit(langs[0]).alias("lang"),
    )
    return (
        scored.withColumn("__best", best)
        .withColumn(
            out_col,
            F.when(F.col("__best.s") > 0, F.col("__best.lang")),
        )
        .withColumn(score_col, F.col("__best.s"))
        .drop("__grams", "__best", *[f"__s_{lang}" for lang in langs])
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
