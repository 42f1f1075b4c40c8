"""BM25 full-text relevance search over a document corpus.

The lexical counterpart to ``operators/similarity.py``'s embedding search:
rank documents against a free-text query with Okapi BM25 (Robertson &
Walker, TREC-3; the default scorer in Lucene/Elasticsearch) — no model, no
index build, one scan.

    score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
                              (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

Scale shape (designed for a 100 TB corpus, not an inverted index):

1. Tokens are FILTERED TO THE QUERY TERMS *inside the projection*, before
   any explode/shuffle — the exploded frame carries only matching
   (doc, term) hits, a vanishing fraction of the corpus, so the
   ``groupBy(doc, term)`` exchange is tiny regardless of corpus size.
2. Corpus constants (N, avgdl) are ONE scalar aggregate, attached by the
   1-row broadcast cross-join idiom (J9, workload/relational.py q14).
3. Per-term document frequencies aggregate the already-tiny hits frame and
   ride back on a broadcast join (≤ |query terms| rows).
4. Top-k is ``orderBy(...).limit(k)`` — Spark's TakeOrdered, per-partition
   heaps + driver merge of k·p rows, never a global sort.

Repeated-query workloads that want a persisted inverted index should CTAS
the exploded (term, doc, tf) frame bucketed by term (pkg/catalog.py J14
machinery); this operator is the scan-time path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def query_terms(query: str) -> list[str]:
    """Whitespace tokenization of the query, deduplicated, order-stable —
    mirrors the corpus-side tokenizer (operators/text.py tokens)."""
    seen: dict[str, None] = {}
    for t in re.split(r"\s+", query.strip()):
        if t:
            seen.setdefault(t, None)
    return list(seen)


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25, deterministically ordered
    by ``(score DESC, id)`` with the score rounded to 6 places so the
    ordering is reproducible across engines (float-sum ties can't flip)."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no terms")
    term_arr = F.array(*[F.lit(t) for t in terms])

    toks = tokens(text_col)
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        # keep ONLY query-term occurrences — the explode below fans out a
        # handful of hits per doc, not the corpus token stream
        F.filter(toks, lambda t: F.array_contains(term_arr, t)).alias("__hits"),
    )

    # corpus constants: one scalar aggregate, broadcast to every row
    consts = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    hits = (
        base.filter(F.size("__hits") > 0)
        .select(id_col, "dl", F.explode("__hits").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # per-term document frequency: ≤ |terms| rows, broadcast back
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))

    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
            ),
        )
        .withColumn(
            "__s",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)
