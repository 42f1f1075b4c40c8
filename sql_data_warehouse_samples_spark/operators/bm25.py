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
    return _score_hits(hits, qterms, dfreq, consts_df, k1, b, id_col)


def _score_hits(
    hits: DataFrame,
    qterms: DataFrame,
    dfreq: DataFrame,
    consts_df: DataFrame,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """(query_id, id, bm25) from a (id, dl, term, tf) hits frame — shared
    by the scan-time scorer and the persisted-index search path."""
    return (
        hits.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts_df))
        .withColumn("__s", _score_expr(k1, b))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("__s"), 6).alias("bm25"))
    )


def _rank_per_query(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Two-phase per-query top-k (see ``bm25_topk_batch``): a window
    salted by the physical partition id takes a local top-k first, so the
    per-query rank window never sees a query's full hit set."""
    from pyspark.sql import Window

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
    qterms = _terms_frame(queries, query_id_col, query_col)
    vocab = sorted({r[0] for r in qterms.select("term").distinct().collect()})
    if not vocab:
        raise ValueError("no query has any terms")
    scored = _bm25_scores(
        docs, qterms, vocab, id_col, text_col, k1, b, consts,
        max_literal_terms,
    )
    return _rank_per_query(scored, k, id_col)


class Bm25Index:
    """Persisted term-bucketed inverted index — the repeated-query BM25
    path the scan-time scorer's docstring points at (the IvfIndex pattern
    applied to lexical search).

    Layout under ``path``:

    * ``postings/`` — (id, dl, term, tf) parquet PARTITIONED BY ``__tb``
      (= pmod(xxhash64(term), n_buckets)): a query touches only its
      terms' buckets, so the reader opens ~|query vocab|/n_buckets of the
      index instead of scanning the corpus — the CTAS-the-exploded-frame
      design from the scan-time docstring, directory-partitioned so
      partition PRUNING needs no metastore;
    * ``dfreq/``   — (term, df_t) under the same bucketing;
    * ``doclens/`` — (id, dl) for EVERY document (docs with no tokens
      included), so corpus constants survive deletion propagation;
    * ``_BM25_META.json`` — n_docs, avgdl, n_buckets, column names.

    BM25 parameters (k1, b) stay QUERY-time arguments — the index stores
    raw tf/dl/df only, so one build serves any parameterization.  Search
    results are value-identical to ``bm25_topk_batch`` over the source
    corpus (test-locked), because both feed the same scoring tail with
    the same (hits, df, consts) inputs.
    """

    def __init__(self, spark, path: str):
        import json
        import os

        self.spark = spark
        self.path = path
        with open(os.path.join(path, "_BM25_META.json")) as f:
            m = json.load(f)
        self.n_docs = int(m["n_docs"])
        self.avgdl = float(m["avgdl"])
        self.n_buckets = int(m["n_buckets"])
        self.id_col = m["id_col"]

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = 32,
    ) -> "Bm25Index":
        """One corpus pass builds the postings (explode → (id, term) tf
        aggregate — the only corpus-sized shuffle), plus the bucketed df
        table and the doclens/constants sidecars (a second, cheap
        column-pruned pass).  At 100 TB: build once, then every query
        batch reads ~|vocab|/n_buckets of the index and nothing else."""
        import json
        import os

        spark = docs.sparkSession
        toks = tokens(text_col)
        base = docs.select(
            F.col(id_col), F.size(toks).alias("dl"), toks.alias("__toks")
        )
        posts = (
            base.select(id_col, "dl", F.explode("__toks").alias("term"))
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("__tb", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
        )
        posts.write.mode("overwrite").partitionBy("__tb").parquet(
            os.path.join(path, "postings")
        )
        # df per term, bucketed identically — derived from the PERSISTED
        # postings (index-sized read, not a third corpus pass)
        stored = spark.read.parquet(os.path.join(path, "postings"))
        stored.groupBy("term", "__tb").agg(
            F.count(F.lit(1)).alias("df_t")
        ).write.mode("overwrite").partitionBy("__tb").parquet(
            os.path.join(path, "dfreq")
        )
        lens = docs.select(F.col(id_col), F.size(toks).alias("dl"))
        lens.write.mode("overwrite").parquet(os.path.join(path, "doclens"))
        stats = spark.read.parquet(os.path.join(path, "doclens")).agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a")
        ).collect()[0]
        with open(os.path.join(path, "_BM25_META.json"), "w") as f:
            json.dump(
                {
                    "n_docs": int(stats.n),
                    "avgdl": float(stats.a) if stats.a is not None else 0.0,
                    "n_buckets": n_buckets,
                    "id_col": id_col,
                },
                f,
            )
        return cls(spark, path)

    def _buckets_for(self, vocab: list[str]) -> list[int]:
        """Bucket ids for the query vocabulary — computed with the SAME
        engine hash that bucketed the index (one vocab-sized local job)."""
        vdf = self.spark.createDataFrame([(t,) for t in vocab], "term: string")
        rows = vdf.select(
            F.pmod(F.xxhash64("term"), F.lit(self.n_buckets)).alias("b")
        ).distinct().collect()
        return sorted(int(r.b) for r in rows)

    def topk_batch(
        self,
        queries: DataFrame,
        k: int = 10,
        query_id_col: str = "query_id",
        query_col: str = "query",
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """Top-``k`` per query — partition-pruned: only the query terms'
        buckets of postings/dfreq are read (plan-locked); the corpus is
        never touched.  Output matches ``bm25_topk_batch`` exactly."""
        import os

        qterms = _terms_frame(queries, query_id_col, query_col)
        vocab = sorted(
            {r[0] for r in qterms.select("term").distinct().collect()}
        )
        if not vocab:
            raise ValueError("no query has any terms")
        buckets = self._buckets_for(vocab)
        term_in = F.col("term").isin(vocab)
        tb_in = F.col("__tb").isin(buckets)
        hits = (
            self.spark.read.parquet(os.path.join(self.path, "postings"))
            .filter(tb_in & term_in)
            .drop("__tb")
        )
        dfreq = (
            self.spark.read.parquet(os.path.join(self.path, "dfreq"))
            .filter(tb_in & term_in)
            .drop("__tb")
        )
        consts_df = self.spark.createDataFrame(
            [(self.n_docs, self.avgdl)], "n_docs: long, avgdl: double"
        )
        scored = _score_hits(
            hits, qterms, dfreq, consts_df, k1, b, self.id_col
        )
        return _rank_per_query(scored, k, self.id_col)

    def topk(self, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75) -> DataFrame:
        """Single-query convenience over ``topk_batch`` (drops query_id)."""
        q = self.spark.createDataFrame(
            [(0, query)], "query_id: long, query: string"
        )
        return (
            self.topk_batch(q, k=k, k1=k1, b=b)
            .drop("query_id", "lex_rank")
        )

    def forget(self, doc_ids: DataFrame, id_col: str | None = None) -> int:
        """Deletion propagation (the L-g1 contract, extended to the
        lexical index like IvfIndex.forget): purge the documents' postings
        and doclens, recompute df and the corpus constants from the
        remaining index — O(index), never O(corpus text).  A purged doc's
        terms hash across ~all buckets, so this is a full-index rewrite
        (staged + verified swap per table); batch forget requests at
        compaction cadence.  Returns postings rows remaining."""
        import json
        import os

        from .dirswap import swap_in

        idc = id_col or self.id_col
        purge = F.broadcast(
            doc_ids.select(F.col(idc).alias(self.id_col)).distinct()
        )
        posts_p = os.path.join(self.path, "postings")
        lens_p = os.path.join(self.path, "doclens")
        pre_posts = self.spark.read.parquet(posts_p)
        sch_posts = pre_posts.schema  # explicit schema: forgetting every
        # doc leaves an empty (schemaless) directory readable only this way
        kept = pre_posts.join(purge, self.id_col, "left_anti")
        stage = posts_p + "__forget"
        kept.write.mode("overwrite").partitionBy("__tb").parquet(stage)
        swap_in(posts_p, stage, verify=lambda p: True)
        pre_lens = self.spark.read.parquet(lens_p)
        sch_lens = pre_lens.schema
        kept_lens = pre_lens.join(purge, self.id_col, "left_anti")
        stage_l = lens_p + "__forget"
        kept_lens.write.mode("overwrite").parquet(stage_l)
        swap_in(lens_p, stage_l, verify=lambda p: True)
        # df + constants recomputed from the remaining index
        stored = self.spark.read.schema(sch_posts).parquet(posts_p)
        dfreq_p = os.path.join(self.path, "dfreq")
        stage_d = dfreq_p + "__forget"
        stored.groupBy("term", "__tb").agg(
            F.count(F.lit(1)).alias("df_t")
        ).write.mode("overwrite").partitionBy("__tb").parquet(stage_d)
        swap_in(dfreq_p, stage_d, verify=lambda p: True)
        stats = self.spark.read.schema(sch_lens).parquet(lens_p).agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a")
        ).collect()[0]
        self.n_docs = int(stats.n)
        self.avgdl = float(stats.a) if stats.a is not None else 0.0
        with open(os.path.join(self.path, "_BM25_META.json"), "w") as f:
            json.dump(
                {
                    "n_docs": self.n_docs,
                    "avgdl": self.avgdl,
                    "n_buckets": self.n_buckets,
                    "id_col": self.id_col,
                },
                f,
            )
        return stored.count()
