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

    # explode the POSITION sequence first, then substring as a plain
    # codegen'd projection — the transform()-HOF array build is
    # interpreted per gram (the repo's known HOF pitfall) and measured
    # ~2x slower on the t21 train pass
    grams = (
        docs.select(
            F.col(lang_col).alias("__lang"), F.col(text_col).alias("__txt")
        )
        .filter(F.length("__txt") >= n)
        .select(
            "__lang",
            "__txt",
            F.explode(
                F.sequence(F.lit(1), F.length("__txt") - n + 1)
            ).alias("__i"),
        )
        .select(
            "__lang",
            F.substring(F.col("__txt"), F.col("__i"), F.lit(n)).alias("__g"),
        )
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
    impl: str = "arrow",
) -> DataFrame:
    """Map-only classification against trained profiles: adds
    (pred_lang, lang_score) — argmax over Σ count_doc(gram)·weight(gram),
    ties broken by language ascending; documents matching NO profile
    gram get pred_lang NULL and score 0.

    Two value-identical impls (parity-locked,
    test_langid_impl_parity), BOTH exchange-free on the corpus side:

    * ``arrow`` (default) — a scalar pandas_udf over the TEXT COLUMN
      only: just ``text_col`` crosses into Python (Arrow batches) and
      just the (pred_lang, score) struct crosses back; every other
      column stays in the JVM row.  The profile dict rides the task
      closure (#langs × top_k entries, centroid-broadcast class).
      Spark never codegens HOF lambdas, so the JVM fold is interpreted
      per gram occurrence — measured ~5x slower at sf0.1.
    * ``fold`` — pure-JVM ``aggregate`` over the gram array with ONE
      combined gram→weight-vector literal map, for pipelines that must
      stay Python-free.
    """
    if not profiles:
        raise ValueError("profiles is empty — train first")
    if impl not in ("arrow", "fold"):
        raise ValueError(f"impl must be 'arrow' or 'fold', got {impl!r}")
    langs, union = _build_union(profiles)
    nl = len(langs)

    if impl == "arrow":
        # scalar pandas_udf over the TEXT COLUMN ONLY (guide §4.2 "pass
        # only the columns the function needs"): the former mapInPandas
        # form Arrow-serialized EVERY column of ``docs`` into Python and
        # back per batch — here only ``text_col`` crosses into Python and
        # only the (pred_lang, score) struct crosses back; the other
        # columns never leave the JVM row.
        import pandas as pd

        def _score(texts):
            preds, scores = [], []
            for t in texts:
                lang, s = _best_lang(t, n, langs, union)
                preds.append(lang)
                scores.append(s)
            return pd.DataFrame({out_col: preds, score_col: scores})

        # real class objects, not strings: the module's postponed
        # annotations (`from __future__ import annotations`) would
        # stringify inline hints and pandas_udf's eval-type inference
        # rejects string hints.  Pinned assumption (PySpark 4.x,
        # verified on 4.1): pandas_udf infers SCALAR eval type from
        # __annotations__ via typing.get_type_hints — if the signature
        # of _score changes, update this dict in lockstep.
        _score.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
        score = F.pandas_udf(f"`{out_col}` string, `{score_col}` long")(
            _score
        )

        with_s = docs.withColumn("__ls", score(F.col(text_col)))
        return with_s.select(
            *docs.columns,
            F.col("__ls")[out_col].alias(out_col),
            F.col("__ls")[score_col].alias(score_col),
        )

    # pure-JVM fold path
    with_g = docs.withColumn("__grams", char_ngrams(text_col, n))
    entries = ", ".join(
        f"({_sql_str(g)}, array({', '.join(str(w) + 'L' for w in ws)}))"
        for g, ws in sorted(union.items())
    )
    m = F.expr(f"map_from_entries(array({entries}))")
    zero = F.array_repeat(F.lit(0).cast("long"), nl)
    scores_vec = F.aggregate(
        F.col("__grams"),
        zero,
        lambda acc, g: F.zip_with(
            acc, F.coalesce(m[g], zero), lambda a, b: a + b
        ),
    )
    # argmax via greatest-over-structs: (score, reversed-ord) so equal
    # scores pick the ASCENDING language name deterministically
    structs = [
        F.struct(
            F.element_at("__sv", i + 1).alias("s"),
            F.lit(nl - i).alias("ord"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.greatest(*structs) if nl > 1 else structs[0]
    return (
        with_g.withColumn("__sv", scores_vec)
        .withColumn("__best", best)
        .withColumn(
            out_col,
            F.when(F.col("__best.s") > 0, F.col("__best.lang")),
        )
        .withColumn(score_col, F.col("__best.s"))
        .drop("__grams", "__sv", "__best")
    )


def _build_union(
    profiles: dict[str, dict[str, int]]
) -> tuple[list[str], dict[str, list[int]]]:
    """ONE combined gram -> per-language weight vector (grams shared
    across languages collapse into one entry) — shared by the single-
    order arrow scorer and the fused back-off cascade."""
    langs = sorted(profiles)
    nl = len(langs)
    union: dict[str, list[int]] = {}
    for i, lang in enumerate(langs):
        for g, w in profiles[lang].items():
            union.setdefault(g, [0] * nl)[i] = int(w)
    return langs, union


def _best_lang(
    t: str | None, n: int, langs: list[str], union: dict[str, list[int]]
) -> tuple[str | None, int]:
    """(lang, score) argmax for one text at one order — the parity-
    critical scoring loop (strict > on the score, so ties keep the
    smaller index = ascending language name).  Shared by both arrow
    paths so they cannot drift."""
    nl = len(langs)
    svec = [0] * nl
    if t is not None and len(t) >= n:
        get = union.get
        for j in range(len(t) - n + 1):
            ws = get(t[j : j + n])
            if ws is not None:
                for i in range(nl):
                    svec[i] += ws[i]
    bi = 0
    for i in range(1, nl):
        if svec[i] > svec[bi]:
            bi = i
    if nl and svec[bi] > 0:
        return langs[bi], svec[bi]
    return None, 0


def classify_language_backoff(
    docs: DataFrame,
    profiles_by_n: dict[int, dict[str, dict[str, int]]],
    text_col: str = "text",
    out_col: str = "pred_lang",
    score_col: str = "lang_score",
    order_col: str = "ngram_order",
    impl: str = "arrow",
) -> DataFrame:
    """Multi-order classification with BACK-OFF (Cavnar & Trenkle train
    profiles at several n; real language-ID backs shorter contexts off
    when the longer ones have no evidence — fastText's char-ngram range):
    score against the LARGEST-n profiles first; documents with zero
    evidence there (score 0 — e.g. texts shorter than n, or matching no
    top-k gram) fall back to the next smaller n, and so on.

    ``profiles_by_n``: {n: profiles} as returned by
    ``train_char_ngram_profiles(docs, n=n)`` per order — train each order
    with one gram aggregate; profiles stay #langs × top_k (control-plane).

    Adds (out_col, score_col, order_col): the prediction, its
    exact-integer score at the DECIDING order, and that order (NULL when
    no order matched).  Zero corpus-side exchanges either way; exact-
    integer scoring keeps the whole cascade SQL-reproducible.

    ``impl="arrow"`` (default) runs the WHOLE cascade in ONE mapInPandas
    pass — each text is sliced once per order, and shorter orders are
    only scored when the longer ones had zero evidence, so the common
    case pays a single profile lookup pass.  ``impl="fold"`` composes the
    parity-locked pure-JVM single-order scorer per order (Python-free
    pipelines; value-identical, parity-tested)."""
    if not profiles_by_n:
        raise ValueError("profiles_by_n is empty — train first")
    for n, profs in profiles_by_n.items():
        if not profs:  # uniform driver-side error for BOTH impls (the
            # fused path would otherwise fail inside an executor)
            raise ValueError(f"profiles for n={n} are empty — train first")
    if impl not in ("arrow", "fold"):
        raise ValueError(f"impl must be 'arrow' or 'fold', got {impl!r}")
    ns = sorted(profiles_by_n, reverse=True)

    if impl == "arrow":
        return _classify_backoff_arrow(
            docs, profiles_by_n, ns, text_col, out_col, score_col, order_col
        )

    out = docs
    tmp: list[tuple[int, str, str]] = []
    for n in ns:
        pc, sc = f"__bo_p{n}", f"__bo_s{n}"
        out = classify_language(
            out, profiles_by_n[n], text_col=text_col, n=n,
            out_col=pc, score_col=sc, impl=impl,
        )
        tmp.append((n, pc, sc))
    pred = F.coalesce(*[F.col(pc) for _, pc, _ in tmp])
    score = F.lit(0).cast("long")
    order = F.lit(None).cast("int")
    for n, pc, sc in reversed(tmp):  # largest n wins the when-chain
        score = F.when(F.col(pc).isNotNull(), F.col(sc)).otherwise(score)
        order = F.when(F.col(pc).isNotNull(), F.lit(n)).otherwise(order)
    out = (
        out.withColumn(out_col, pred)
        .withColumn(score_col, score)
        .withColumn(order_col, order)
    )
    for _, pc, sc in tmp:
        out = out.drop(pc, sc)
    return out


def _classify_backoff_arrow(
    docs: DataFrame,
    profiles_by_n: dict[int, dict[str, dict[str, int]]],
    ns: list[int],
    text_col: str,
    out_col: str,
    score_col: str,
    order_col: str,
) -> DataFrame:
    """One fused mapInPandas pass for the whole back-off cascade — the
    per-order unions ride the task closure together; a row falls through
    to the next order only on zero evidence (same semantics as the
    composed form, parity-tested)."""
    from collections.abc import Iterator

    unions = [(n, *_build_union(profiles_by_n[n])) for n in ns]

    def score(batches: Iterator) -> Iterator:
        for pdf in batches:
            preds, scores, orders = [], [], []
            for t in pdf[text_col]:
                pred, sc, od = None, 0, None
                for n, langs, union in unions:  # longest order first
                    lang, s = _best_lang(t, n, langs, union)
                    if lang is not None:
                        pred, sc, od = lang, s, n
                        break  # evidence found — no back-off
                preds.append(pred)
                scores.append(sc)
                orders.append(od)
            pdf = pdf.copy()
            pdf[out_col] = preds
            pdf[score_col] = scores
            pdf[order_col] = pd_arr(orders)
            yield pdf

    def pd_arr(vals):
        import pandas as pd

        return pd.array(vals, dtype="Int32")  # nullable int32

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + f", `{out_col}` string, `{score_col}` long, `{order_col}` int"
    return docs.mapInPandas(score, out_schema)


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
