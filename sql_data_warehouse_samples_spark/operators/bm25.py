"""BM25 full-text relevance search over a document corpus.

The lexical counterpart to ``operators/similarity.py``'s embedding search:
rank documents against free-text queries with Okapi BM25 (Robertson &
Walker, TREC-3; the default scorer in Lucene/Elasticsearch) — no model, no
index build, one scan.

    score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
                              (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

Scale shape (designed for a 100 TB corpus and a query TABLE, not an
inverted index or a per-query loop):

1. ``bm25_topk_batch`` scores EVERY query in one corpus pass: the
   (query_id, term) list is broadcast, the corpus-side hits join it once,
   and ranking is per query — a DPR-style mining run over millions of
   training queries costs one scan, not |Q| scans.
2. Tokens are FILTERED TO THE BATCH'S TERM VOCABULARY *inside the
   projection*, before any explode/shuffle — the exploded frame carries
   only matching (doc, term) hits, a vanishing fraction of the corpus, so
   the ``groupBy(doc, term)`` exchange is tiny regardless of corpus size.
3. The compact (id, dl, hits) projection is localCheckpoint-ed, so the
   corpus text is scanned EXACTLY ONCE even though both the corpus
   constants (N, avgdl) and the tf aggregation consume it
   (plan-locked by tests/test_plans.py).
4. Corpus constants are ONE scalar aggregate over the checkpoint, attached
   by the 1-row broadcast cross-join idiom (J9, workload/relational.py
   q14); per-term document frequencies ride back on a broadcast join
   (≤ |vocabulary| rows).
5. Per-query top-k is TWO-PHASE: a window salted by the physical partition
   id takes a local top-k first, so the per-query rank window never sees a
   query's full hit set — a stopword-heavy query (hits ~ corpus) cannot
   funnel the corpus through one reducer.  The single-query form instead
   uses ``orderBy(...).limit(k)`` — Spark's TakeOrdered, per-partition
   heaps + driver merge, never a global sort.

Repeated-query workloads that want a persisted inverted index should CTAS
the exploded (term, doc, tf) frame bucketed by term (pkg/catalog.py J14
machinery); this operator is the scan-time path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: Above this many distinct terms in one batch, the literal-array token
#: prefilter stops being codegen-friendly (array_contains is O(|vocab|)
#: per token) and the corpus side switches to an explode + broadcast
#: semi-join on the term — still map-side (no corpus shuffle), but the
#: corpus-constants aggregate then needs its own scan unless ``consts``
#: is supplied.  Callers with very large query sets should batch them.
DEFAULT_MAX_LITERAL_TERMS = 4096


def query_terms(query: str) -> list[str]:
    """Whitespace tokenization of the query, deduplicated, order-stable —
    mirrors the corpus-side tokenizer (operators/text.py tokens)."""
    seen: dict[str, None] = {}
    for t in re.split(r"\s+", query.strip()):
        if t:
            seen.setdefault(t, None)
    return list(seen)


def _terms_frame(
    queries: DataFrame, query_id_col: str, query_col: str
) -> DataFrame:
    """(query_id, term) pairs — per-query deduplicated, mirroring
    ``query_terms``.  ``query_id`` must be unique per query row."""
    arr = F.array_distinct(
        F.filter(
            F.split(F.trim(F.col(query_col)), r"\s+"), lambda t: t != ""
        )
    )
    return queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.explode(arr).alias("term"),
    )


def _hits_base(
    docs: DataFrame, vocab: list[str], id_col: str, text_col: str
) -> DataFrame:
    """The ONE corpus projection both stats branches read: (id, dl,
    __hits) with tokens pre-filtered to the batch vocabulary — exactly one
    documents scan (plan-locked), no shuffle."""
    term_arr = F.array(*[F.lit(t) for t in vocab])
    toks = tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        # keep ONLY vocabulary-term occurrences — the explode downstream
        # fans out a handful of hits per doc, not the corpus token stream
        F.filter(toks, lambda t: F.array_contains(term_arr, t)).alias(
            "__hits"
        ),
    )


def _score_expr(k1: float, b: float):
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    return idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )


def _bm25_scores(
    docs: DataFrame,
    qterms: DataFrame,
    vocab: list[str],
    id_col: str,
    text_col: str,
    k1: float,
    b: float,
    consts: tuple[int, float] | None,
    max_literal_terms: int,
) -> DataFrame:
    """(query_id, id, bm25) for every (query, doc) pair with ≥1 term hit.

    Small vocabularies take the literal-prefilter path: the compact
    (id, dl, hits) projection is checkpointed and BOTH the corpus
    constants and the tf aggregate read it — one documents scan total.
    Past ``max_literal_terms`` the corpus side switches to a full token
    explode + broadcast semi-join (map-side filter, still no corpus
    shuffle); supply precomputed ``consts = (n_docs, avgdl)`` there to
    keep the single-scan property (they are query-independent corpus
    stats a production pipeline computes once).
    """
    spark = docs.sparkSession
    if len(vocab) <= max_literal_terms:
        base = _hits_base(docs, vocab, id_col, text_col).localCheckpoint(
            eager=True
        )
        consts_df = (
            spark.createDataFrame(
                [(int(consts[0]), float(consts[1]))], "n_docs: long, avgdl: double"
            )
            if consts is not None
            else base.agg(
                F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
            )
        )
        hits = (
            base.filter(F.size("__hits") > 0)
            .select(id_col, "dl", F.explode("__hits").alias("term"))
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    else:
        toks = tokens(text_col)
        vocab_df = F.broadcast(
            spark.createDataFrame([(t,) for t in vocab], "term: string")
        )
        tok_rows = docs.select(
            F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term")
        )
        # map-side broadcast filter: the shuffle below still carries hits
        # only — the token stream never crosses an exchange
        hits = (
            tok_rows.join(vocab_df, "term")
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        consts_df = (
            spark.createDataFrame(
                [(int(consts[0]), float(consts[1]))], "n_docs: long, avgdl: double"
            )
            if consts is not None
            else docs.select(F.size(toks).alias("dl")).agg(
                F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
            )
        )
    # per-term document frequency: ≤ |vocab| rows, broadcast back
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    return (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts_df))
        .withColumn("__s", _score_expr(k1, b))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("__s"), 6).alias("bm25"))
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ONE ``query`` by BM25, deterministically
    ordered by ``(score DESC, id)`` with the score rounded to 6 places so
    the ordering is reproducible across engines (float-sum ties can't
    flip).  Thin wrapper over the batched scorer with a single-row query
    table; the final top-k stays ``orderBy(...).limit(k)`` (TakeOrdered —
    per-partition heaps, no per-query window) because one query has no
    partitioning key to rank within."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no terms")
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        [(0, t) for t in terms], "query_id: long, term: string"
    )
    scored = _bm25_scores(
        docs, qterms, terms, id_col, text_col, k1, b,
        consts=None, max_literal_terms=DEFAULT_MAX_LITERAL_TERMS,
    )
    return (
        scored.drop("query_id")
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    consts: tuple[int, float] | None = None,
    max_literal_terms: int = DEFAULT_MAX_LITERAL_TERMS,
) -> DataFrame:
    """Top-``k`` documents per query for a query TABLE — ONE corpus pass
    for ALL queries (the DPR-scale mining shape: a million-query training
    run is one scan, never a Python loop of scans).

    ``queries``: (query_id, query text) rows, ``query_id`` unique.
    Output: (query_id, id, bm25, lex_rank) with ``lex_rank`` ∈ 1..k the
    per-query rank by (bm25 DESC, id).

    Scale notes: the (query_id, term) list is broadcast (bounded by the
    query batch, not the corpus); tf/df aggregates are shared across
    queries — a term's hits are scored once per query CONTAINING it, so
    the scoring fan-out is hits × queries-per-term, shuffled on
    (query_id, doc).  The per-query top-k is two-phase: a partition-local
    rank (window salted with spark_partition_id) cuts each query to
    k·n_partitions rows before the per-query window, so one hot query
    cannot funnel its full hit set through a single reducer.
    ``consts=(n_docs, avgdl)``: optional precomputed corpus constants —
    query-independent, compute once per corpus snapshot and reuse across
    batches (required to keep one-scan behavior past
    ``max_literal_terms``)."""
    from pyspark.sql import Window

    qterms = _terms_frame(queries, query_id_col, query_col)
    vocab = sorted({r[0] for r in qterms.select("term").distinct().collect()})
    if not vocab:
        raise ValueError("no query has any terms")
    scored = _bm25_scores(
        docs, qterms, vocab, id_col, text_col, k1, b, consts,
        max_literal_terms,
    )
    order = [F.desc("bm25"), F.asc(id_col)]
    local = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(*order)
    per_query = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= k)
        .drop("__lr")
        .withColumn("lex_rank", F.row_number().over(per_query))
        .filter(F.col("lex_rank") <= k)
    )
