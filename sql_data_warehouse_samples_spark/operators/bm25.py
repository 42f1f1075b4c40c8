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

Repeated-query workloads use the persisted, incrementally-ingestible
``Bm25Index`` below (term-bucketed postings, partition-pruned searches);
``bm25_topk``/``bm25_topk_batch`` are the scan-time path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._frames import small_df

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


def _require_integral_id(df: DataFrame, col: str, what: str) -> None:
    """Refuse non-integral id columns BEFORE the long cast: a string id
    would cast to NULL silently, collapsing every query into one NULL
    group and producing wrong per-query results with no error.  Plan-time
    check — zero runtime cost."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    dt = df.schema[col].dataType
    if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"{what} column {col!r} must be an integral type (got "
            f"{dt.simpleString()}); a silent cast to long would NULL out "
            "non-numeric ids and merge their rows into one group — map "
            "string ids to a dense integer key first"
        )


def _terms_frame(
    queries: DataFrame, query_id_col: str, query_col: str
) -> DataFrame:
    """(query_id, term) pairs — per-query deduplicated, mirroring
    ``query_terms``.  ``query_id`` must be unique per query row."""
    _require_integral_id(queries, query_id_col, "query_id")
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
    stats a production pipeline computes once — see
    ``bm25_corpus_consts`` / ``refresh_bm25_consts`` for the persisted
    snapshot surface).

    The eager localCheckpoint is a deliberate trade, twice over: (a) it
    runs the corpus projection as a job AT CALL TIME, so merely
    constructing the scorer pays the scan even if the result frame is
    never consumed — callers treat a call as starting the mining run;
    (b) checkpoint blocks have NO lineage recovery — losing an executor
    mid-run fails the job, which must be re-run from the call (same
    caveat as the ledgers' localCheckpoint sites; acceptable for batch
    mining, re-run on failure).  The lazy alternative would silently
    re-plan the corpus scan once per consumer, the exact double-scan this
    function exists to prevent.
    """
    spark = docs.sparkSession
    if len(vocab) <= max_literal_terms:
        base = _hits_base(docs, vocab, id_col, text_col).localCheckpoint(
            eager=True
        )
        consts_df = (
            small_df(
                spark,
                [(int(consts[0]), float(consts[1]))],
                "n_docs: long, avgdl: double",
                ["n_docs", "avgdl"],
            )
            if consts is not None
            else base.agg(
                F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
            )
        )
        # per-(doc, term) tf via explode + groupBy — the r12 map-side
        # distinct×filter HOF (O(|hits|²) interpreted per-element CPU
        # per doc) measured SLOWER on every consumer despite removing
        # this exchange, which carries only map-side-combined partial
        # counts of the hits stream (vocabulary occurrences, a vanishing
        # fraction of the corpus).  Reverted per the r12 verdict; r13
        # interleaved A/B (scripts/bm25_tf_ab.py, /tmp/bm25_tf_ab.json):
        # s07 0.744/0.821 vs 0.851/0.859, s11 1.195 vs 1.274, s12 1.753
        # vs 1.833 (min/med), s13 within noise.
        hits = (
            base.filter(F.size("__hits") > 0)
            .select(id_col, "dl", F.explode("__hits").alias("term"))
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    else:
        toks = tokens(text_col)
        vocab_df = F.broadcast(
            small_df(spark, [(t,) for t in vocab], "term: string", ["term"])
        )
        tok_rows = docs.select(
            F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term")
        )
        # map-side broadcast filter: the shuffle below still carries hits
        # only — the token stream never crosses an exchange.  Checkpoint
        # the (hits-sized) aggregate: BOTH the df derivation and the
        # scoring tail consume it, and without the checkpoint each would
        # re-plan (and re-scan) the corpus — with precomputed ``consts``
        # this branch is then exactly ONE documents scan (plan-locked)
        hits = (
            tok_rows.join(vocab_df, "term")
            .groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .localCheckpoint(eager=True)
        )
        consts_df = (
            small_df(
                spark,
                [(int(consts[0]), float(consts[1]))],
                "n_docs: long, avgdl: double",
                ["n_docs", "avgdl"],
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


def _rank_per_query(
    scored: DataFrame, k: int, id_col: str, ordered: bool = True
) -> DataFrame:
    """Two-phase per-query top-k (see ``bm25_topk_batch``): a window
    salted by the physical partition id takes a local top-k first, so the
    per-query rank window never sees a query's full hit set.

    ``ordered=False`` skips the presentation sort — for internal callers
    (the mining pipeline) that immediately join/filter the ranked frame
    and re-order at their own tail, the global sort here is pure waste:
    an extra range-partitioning exchange plus its sampling job per
    action (r12 job-trace), discarded by the very next operator."""
    from pyspark.sql import Window

    order = [F.desc("bm25"), F.asc(id_col)]
    local = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(*order)
    per_query = Window.partitionBy("query_id").orderBy(*order)
    ranked = (
        scored.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= k)
        .drop("__lr")
        .withColumn("lex_rank", F.row_number().over(per_query))
        .filter(F.col("lex_rank") <= k)
    )
    if not ordered:
        return ranked
    # deterministic presentation order (k·|Q| rows — a cheap sort):
    # callers iterating the result see ranked negatives per query,
    # the documented contract of the single-query forms
    return ranked.orderBy("query_id", "lex_rank")


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
    qterms = small_df(
        spark, [(0, t) for t in terms], "query_id: long, term: string",
        ["query_id", "term"],
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
    ordered: bool = True,
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
    ``max_literal_terms``).  ``ordered=False`` skips the presentation
    sort (see ``_rank_per_query``) for pipeline consumers that re-order
    downstream; rows and ranks are identical either way."""
    if queries.isLocal():
        # literal/local query table (the common mining entry: a driver-held
        # batch of training queries): derive the (query_id, term) pairs
        # driver-side — ``collect()`` on a LocalRelation runs no Spark job,
        # where the general path below pays a distinct+collect round trip
        # just to learn the vocabulary.  ``query_terms`` mirrors
        # ``_terms_frame`` exactly (split on \s+, drop empties, per-query
        # first-occurrence dedup), so the pairs are identical.
        _require_integral_id(queries, query_id_col, "queries query_id")
        spark = queries.sparkSession
        pairs = [
            (int(r[0]), t)
            for r in queries.select(
                F.col(query_id_col).cast("long"), F.col(query_col)
            ).collect()
            for t in query_terms(r[1] or "")
        ]
        qterms = small_df(
            spark, pairs, "query_id: long, term: string", ["query_id", "term"]
        )
        vocab = sorted({t for _, t in pairs})
    else:
        qterms = _terms_frame(queries, query_id_col, query_col)
        vocab = sorted(
            {r[0] for r in qterms.select("term").distinct().collect()}
        )
    if not vocab:
        raise ValueError("no query has any terms")
    scored = _bm25_scores(
        docs, qterms, vocab, id_col, text_col, k1, b, consts,
        max_literal_terms,
    )
    return _rank_per_query(scored, k, id_col, ordered=ordered)


def refresh_bm25_consts(
    docs: DataFrame, path: str, text_col: str = "text"
) -> tuple[int, float]:
    """Maintenance op: settle the scan-time scorer's corpus-constants
    snapshot — ONE scalar-aggregate pass over the corpus computes
    (n_docs, avgdl) and pins them in ``<path>/_BM25_CONSTS.json``
    (written atomically: tmp + rename, so a crashed refresh never leaves
    a torn snapshot).  Run it beside the admission ledger's compaction
    cadence: the constants are query-independent corpus stats, so every
    ``bm25_topk_batch`` call between refreshes reuses them via
    ``consts=bm25_corpus_consts(path)`` — which is what keeps the
    >``max_literal_terms`` path at exactly ONE documents scan instead of
    a second constants pass (pkg docstring point 4; plan-locked in
    tests/test_plans.py).  This is the multi-batch twin of Bm25Index's
    ``_BM25_META.json`` sidecar (the single-index form).

    Drift contract: admissions between refreshes shift (n_docs, avgdl)
    slightly; BM25 degrades gracefully under stale constants (they scale
    idf and the length norm smoothly), so refresh at maintenance cadence,
    not per batch.  Returns the settled (n_docs, avgdl)."""
    import os

    from .dirswap import atomic_json_write, fs_mkdirs

    spark = docs.sparkSession
    row = docs.select(F.size(tokens(text_col)).alias("dl")).agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a")
    ).collect()[0]
    n_docs = int(row.n)
    avgdl = float(row.a) if row.a is not None else 0.0
    fs_mkdirs(path, spark)
    atomic_json_write(
        os.path.join(path, "_BM25_CONSTS.json"),
        {"n_docs": n_docs, "avgdl": avgdl},
        spark,
    )
    return n_docs, avgdl


def bm25_corpus_consts(path: str) -> tuple[int, float]:
    """Load the persisted (n_docs, avgdl) snapshot ``refresh_bm25_consts``
    settled — the value callers hand to ``bm25_topk_batch(consts=...)``."""
    import json
    import os

    from .dirswap import fs_read_bytes

    m = json.loads(fs_read_bytes(os.path.join(path, "_BM25_CONSTS.json")))
    return int(m["n_docs"]), float(m["avgdl"])


class Bm25Index:
    """Persisted term-bucketed inverted index — the repeated-query BM25
    path the scan-time scorer's docstring points at (the IvfIndex pattern
    applied to lexical search).

    Layout under ``path``:

    * ``postings/`` — (id, dl, term, tf) parquet PARTITIONED BY
      ``(__tb, __bk)``: ``__tb = pmod(xxhash64(term), n_buckets)`` gives
      term locality — a query touches only its terms' buckets, so the
      reader opens ~|query vocab|/n_buckets of the index instead of
      scanning the corpus (directory-partitioned, so partition PRUNING
      needs no metastore); ``__bk`` is the ingest-batch key, so
      incremental ``ingest`` batches land as their own subpartitions and
      a keyed replay dynamic-overwrites ONLY its own (the ledger
      idempotency pattern);
    * ``doclens/`` — (id, dl) for EVERY document (docs with no tokens
      included), partitioned by ``__bk``, so the corpus constants survive
      both incremental ingest and deletion propagation;
    * ``_BM25_META.json`` — n_docs, avgdl, n_buckets, column names.

    There is deliberately NO materialized df table: document frequency is
    derived at query time from the SAME pruned postings the scorer reads
    (exact — bucketing is by term, so a term's postings are complete in
    its bucket), which keeps incremental ingest and forget() free of df
    maintenance.  BM25 parameters (k1, b) stay QUERY-time arguments — the
    index stores raw tf/dl only, so one build serves any
    parameterization.  Search results are value-identical to
    ``bm25_topk_batch`` over the source corpus (test-locked), because
    both feed the same scoring tail with the same (hits, df, consts).

    Document ids must be unique across the whole index (the admission
    pipeline upstream guarantees exactly that for a training corpus).
    """

    _BASE_KEY = "base"

    def _posts_schema(self) -> str:
        return (
            f"`{self.id_col}` {self.id_type}, dl int, term string, "
            "tf long, __tb int, __bk string"
        )

    def _lens_schema(self) -> str:
        return f"`{self.id_col}` {self.id_type}, dl int, __bk string"

    def __init__(self, spark, path: str):
        import json
        import os

        from .dirswap import fs_read_bytes, require_swap_capable

        self.spark = spark
        # the maintenance surface (meta sidecar reads, dirswap staged
        # swaps, u<N> counters, tombstone/keyed-batch dir checks) is
        # scheme-dispatched — local paths and atomic-rename stores
        # (hdfs/abfs/...) run the staged-swap protocol; object stores run
        # the pointer-file generations protocol (reads and in-place
        # writes resolve through dirswap.read_path, rewrites publish via
        # a _CURRENT pointer); only unknown schemes are refused
        self.path = require_swap_capable(path)
        m = json.loads(
            fs_read_bytes(os.path.join(path, "_BM25_META.json"), spark)
        )
        self.n_docs = int(m["n_docs"])
        self.avgdl = float(m["avgdl"])
        self.n_buckets = int(m["n_buckets"])
        self.id_col = m["id_col"]
        self.id_type = m.get("id_type", "bigint")

    # -- construction / maintenance ------------------------------------

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = 32,
    ) -> "Bm25Index":
        """ONE corpus pass builds the index: the postings aggregate
        (explode → (id, term) tf — the only corpus-sized shuffle) is
        checkpointed and the doclens table derives from it (every doc
        has ≥1 token under the whitespace tokenizer, so distinct (id, dl)
        covers the corpus).  At 100 TB: build once, then every query
        batch reads ~|vocab|/n_buckets of the index and nothing else."""
        from .dirswap import require_swap_capable

        spark = docs.sparkSession
        path = require_swap_capable(path)  # same scheme contract as __init__
        cls._write_batch(
            docs, path, id_col, text_col, n_buckets, cls._BASE_KEY,
            overwrite=True,
        )
        idx = cls.__new__(cls)
        idx.spark, idx.path = spark, path
        idx.n_buckets, idx.id_col = n_buckets, id_col
        idx.id_type = docs.schema[id_col].dataType.simpleString()
        idx._refresh_consts()
        return idx

    @staticmethod
    def _write_batch(
        docs: DataFrame,
        path: str,
        id_col: str,
        text_col: str,
        n_buckets: int,
        key: str,
        overwrite: bool,
        postings: DataFrame | None = None,
    ) -> None:
        """Write one batch's postings + doclens.  ``postings``: an
        already-MATERIALIZED (id, dl, term, tf) frame to reuse (the keyed
        ingest guard computes it anyway); when None it is computed and
        checkpointed here — either way the batch text is tokenized
        exactly once, and doclens derives from the postings (the
        whitespace tokenizer yields ≥1 token for every non-null text, and
        ``_batch_postings`` emits a (term '', dl NULL) sentinel row for
        NULL text, so distinct (id, dl) covers every doc)."""
        import os

        if postings is None:
            postings = _batch_postings(docs, id_col, text_col).localCheckpoint(
                eager=True
            )
        posts = (
            postings
            .withColumn("__tb", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
            .withColumn("__bk", F.lit(key))
        )
        # full build: static overwrite replaces the whole table; batch
        # ingest: DYNAMIC overwrite touches only the batch's own
        # (__tb, __bk=key) partitions — a keyed replay converges
        ovm = "static" if overwrite else "dynamic"
        from .dirswap import read_path

        # in-place batch writes land in the CURRENT generation (dirswap)
        posts.write.mode("overwrite").option(
            "partitionOverwriteMode", ovm
        ).partitionBy("__tb", "__bk").parquet(
            read_path(os.path.join(path, "postings"))
        )
        lens = (
            postings.select(id_col, "dl")
            .distinct()
            .withColumn("__bk", F.lit(key))
        )
        lens.write.mode("overwrite").option(
            "partitionOverwriteMode", ovm
        ).partitionBy("__bk").parquet(
            read_path(os.path.join(path, "doclens"))
        )

    def _refresh_consts(self) -> None:
        """Recompute (n_docs, avgdl) from the doclens table and pin them in
        the meta sidecar — idempotent, so ingest replays converge."""
        import os

        from .dirswap import read_path

        stats = self.spark.read.schema(self._lens_schema()).parquet(
            read_path(os.path.join(self.path, "doclens"), self.spark)
        ).agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a")).collect()[0]
        self.n_docs = int(stats.n)
        self.avgdl = float(stats.a) if stats.a is not None else 0.0
        from .dirswap import atomic_json_write

        # atomic: this runs after EVERY ingest/forget and every reopen
        # parses it — a crash mid-write must not tear the sidecar
        atomic_json_write(
            os.path.join(self.path, "_BM25_META.json"),
            {
                "n_docs": self.n_docs,
                "avgdl": self.avgdl,
                "n_buckets": self.n_buckets,
                "id_col": self.id_col,
                "id_type": self.id_type,
            },
            self.spark,
        )

    def ingest(
        self,
        batch: DataFrame,
        text_col: str = "text",
        idempotency_key: str | None = None,
    ) -> None:
        """Incrementally index a new document batch — the step that lets
        the index ride the admission pipeline (dedup-admit, then index the
        survivors) without a full rebuild.  Cost: one BATCH-sized pass;
        the existing index is not rewritten (new files land inside the
        term buckets as a ``__bk`` subpartition).

        ``idempotency_key`` makes the ingest REPLAYABLE: the batch lands
        in ``__bk=<key>`` partitions via dynamic overwrite (a replay
        rewrites only its own), and re-USING a key for a different batch
        is refused by comparing the stored POSTINGS under the key against
        the batch's postings — full (id, term, tf) content, so different
        text with the same ids/token counts is still caught, and a crash
        between the postings and doclens writes leaves evidence the guard
        sees (the ledger key-reuse contract: an overwrite with different
        content would silently corrupt term statistics — dynamic
        overwrite would leave the old content's other term buckets live).
        Stored ⊆ batch is legal (a crashed partial write; the replay
        completes it); stored rows ABSENT from the batch are refused.
        Without a key the batch is appended (caller owns at-most-once).
        Corpus constants are re-settled from doclens afterwards, which is
        idempotent under replay."""
        import os

        # keyed partitions are "k-<key>": never collides with the build's
        # "base" partition or the un-keyed "u<N>" counters
        key = (
            "k-" + _safe_index_key(idempotency_key)
            if idempotency_key is not None
            else None
        )
        from .dirswap import read_path

        if key is None:
            _warn_unkeyed_into_keyed_index(
                self.path,
                read_path(os.path.join(self.path, "postings"), self.spark),
                "__tb=",
            )
        bposts = None
        if key is not None:
            bposts = _batch_postings(batch, self.id_col, text_col)
            # drop documents forget() tombstoned UNDER THIS KEY: a replay
            # after a deletion would otherwise read the purge as a
            # crashed partial write (stored ⊂ batch) and resurrect the
            # forgotten docs.  Key-scoped, so a later re-admission of the
            # same id under a NEW key stays legal.
            dead = _tombstoned_ids(
                self.spark, os.path.join(self.path, "tombstones"), key,
                self.id_col,
            )
            if dead is not None:
                bposts = bposts.join(F.broadcast(dead), self.id_col, "left_anti")
            # materialize the batch postings ONCE: the guard and the
            # write both consume them (batch-sized)
            bposts = bposts.localCheckpoint(eager=True)
            posts_p = read_path(
                os.path.join(self.path, "postings"), self.spark
            )
            stored = (
                self.spark.read.schema(self._posts_schema()).parquet(posts_p)
                .filter(F.col("__bk") == key)
                .select(self.id_col, "dl", "term", "tf")
            )
            if stored.exceptAll(bposts).limit(1).count():
                raise ValueError(
                    f"idempotency_key {idempotency_key!r} was previously "
                    "used for a different batch (stored postings are not "
                    "a subset of this batch's); replaying it would "
                    "overwrite unrelated index state — use a run-scoped key"
                )
        self._write_batch(
            batch, self.path, self.id_col, text_col, self.n_buckets,
            key if key is not None else _unkeyed_batch_name(self.path),
            overwrite=False,
            postings=bposts,
        )
        self._refresh_consts()

    def forget(self, doc_ids: DataFrame, id_col: str | None = None) -> int:
        """Deletion propagation (the L-g1 contract, extended to the
        lexical index like IvfIndex.forget): purge the documents' postings
        and doclens and re-settle the corpus constants — O(index), never
        O(corpus text); df needs no maintenance (derived at query time).
        A purged doc's terms hash across ~all buckets, so this is a
        full-index rewrite (staged + verified swap per table); batch
        forget requests at compaction cadence.  Cross-table crash
        contract (postings and doclens are SEPARATE swap surfaces, so
        their two commits cannot be atomic together the way the IVF
        quantizer+lists are): a crash between them leaves purged docs
        already unservable (no postings) with doclens/meta counting them
        for one more window — the constants drift smoothly (the
        documented stale-statistics class, never wrong results) and
        RE-RUNNING the same forget converges (both rewrites and the
        constants refresh are idempotent).  Returns postings rows
        remaining."""
        import os

        from .dirswap import read_path, stage_path, swap_in

        idc = id_col or self.id_col
        purge = F.broadcast(
            doc_ids.select(F.col(idc).alias(self.id_col)).distinct()
        )
        posts_p = os.path.join(self.path, "postings")
        lens_p = os.path.join(self.path, "doclens")
        pre_posts = self.spark.read.schema(self._posts_schema()).parquet(
            read_path(posts_p, self.spark)
        )
        # tombstone the purged (id, batch) pairs BEFORE the rewrite: the
        # record a later keyed ingest REPLAY checks, so a crash-replay of
        # the purged batch cannot resurrect forgotten documents (the
        # stored-subset guard alone reads the purge as a crashed partial
        # write and re-ingests).  Deletion-batch-bounded; an all-miss
        # purge writes nothing (a data-less parquet dir would break the
        # replay-side read).
        pairs = (
            pre_posts.join(purge, self.id_col, "semi")
            .select(self.id_col, "__bk")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if not pairs.isEmpty():
            _merge_tombstones(os.path.join(self.path, "tombstones"), pairs)
        kept = pre_posts.join(purge, self.id_col, "left_anti")
        stage = stage_path(posts_p, "forget", self.spark)
        kept.write.mode("overwrite").partitionBy("__tb", "__bk").parquet(stage)
        # REAL verify (the ledger/IVF pattern): an unreadable staged tree
        # must raise so swap_in keeps the live index, never promote junk
        swap_in(
            posts_p,
            stage,
            verify=lambda p: self.spark.read.schema(self._posts_schema())
            .parquet(p)
            .first(),
        )
        pre_lens = self.spark.read.schema(self._lens_schema()).parquet(
            read_path(lens_p, self.spark)
        )
        kept_lens = pre_lens.join(purge, self.id_col, "left_anti")
        stage_l = stage_path(lens_p, "forget", self.spark)
        kept_lens.write.mode("overwrite").partitionBy("__bk").parquet(stage_l)
        swap_in(
            lens_p,
            stage_l,
            verify=lambda p: self.spark.read.schema(self._lens_schema())
            .parquet(p)
            .first(),
        )
        self._refresh_consts()
        return (
            self.spark.read.schema(self._posts_schema())
            .parquet(read_path(posts_p, self.spark))  # re-resolve post-swap
            .count()
        )

    def prune_tombstones(
        self, settled_keys=(), include_unreplayable: bool = False
    ) -> int:
        """Tombstone retention (see module-level ``prune_tombstones``):
        drop forget-tombstones for batch keys that can never replay.
        Run at maintenance cadence beside compaction."""
        import os

        return prune_tombstones(
            self.spark,
            os.path.join(self.path, "tombstones"),
            settled_keys,
            include_unreplayable=include_unreplayable,
        )

    def compact(
        self, settled_keys=(), include_unkeyed: bool = True
    ) -> int:
        """Fold batch subpartitions into the ``base`` partition — the
        small-file maintenance a long-running incremental ingest needs:
        every micro-batch leaves one file per touched (term-bucket,
        batch) pair, so after thousands of batches a bucket read opens
        thousands of small files.  Folds the build's ``base``, the
        un-keyed ``u<N>`` appends (``include_unkeyed`` — they have no
        replay contract to preserve) and any SETTLED keyed batches;
        LIVE keyed batches keep their ``__bk`` so their replay guard
        keeps working.  The settled contract is ``prune_tombstones``'s:
        fold only keys that provably cannot replay — a replay of a
        folded key reads empty stored state and would re-ingest
        (double count).  Full staged + verified rewrite of both tables,
        ~one file per surviving partition (same cost class as
        ``forget``; batch at maintenance cadence — see
        ``maintenance.corpus_maintenance_window``).  Search results are
        value-identical before/after (df/tf/doclens don't depend on
        which batch a posting landed in).  Returns postings rows."""
        import os

        from .dirswap import read_path, stage_path, swap_in

        if isinstance(settled_keys, str):
            raise TypeError(
                "settled_keys must be an iterable of keys, not a single "
                f"string ({settled_keys!r}); wrap it in a list"
            )
        dead = ["k-" + _safe_index_key(k) for k in settled_keys]
        fold = F.col("__bk") == self._BASE_KEY
        if include_unkeyed:
            fold = fold | F.col("__bk").rlike(r"^u[0-9]+$")
        if dead:
            fold = fold | F.col("__bk").isin(dead)
        folded = F.when(fold, F.lit(self._BASE_KEY)).otherwise(
            F.col("__bk")
        )
        posts_p = os.path.join(self.path, "postings")
        lens_p = os.path.join(self.path, "doclens")
        posts = (
            self.spark.read.schema(self._posts_schema())
            .parquet(read_path(posts_p, self.spark))
            .withColumn("__bk", folded)
            # one task -> one file per surviving (__tb, __bk) partition
            .repartition("__tb", "__bk")
        )
        stage = stage_path(posts_p, "compact", self.spark)
        posts.write.mode("overwrite").partitionBy("__tb", "__bk").parquet(
            stage
        )
        swap_in(
            posts_p, stage,
            verify=lambda p: self.spark.read.schema(self._posts_schema())
            .parquet(p).first(),
            spark=self.spark,
        )
        lens = (
            self.spark.read.schema(self._lens_schema())
            .parquet(read_path(lens_p, self.spark))
            .withColumn("__bk", folded)
            .repartition("__bk")
        )
        stage_l = stage_path(lens_p, "compact", self.spark)
        lens.write.mode("overwrite").partitionBy("__bk").parquet(stage_l)
        swap_in(
            lens_p, stage_l,
            verify=lambda p: self.spark.read.schema(self._lens_schema())
            .parquet(p).first(),
            spark=self.spark,
        )
        self._refresh_consts()
        return (
            self.spark.read.schema(self._posts_schema())
            .parquet(read_path(posts_p, self.spark))  # re-resolve post-swap
            .count()
        )

    # -- search ----------------------------------------------------------

    def _buckets_for(self, vocab: list[str]) -> list[int]:
        """Bucket ids for the query vocabulary — computed with the SAME
        engine hash that bucketed the index (one vocab-sized local job;
        ``vocab`` is already deduplicated, so no distinct exchange — the
        driver-side set() below folds hash collisions instead)."""
        vdf = small_df(
            self.spark, [(t,) for t in vocab], "term: string", ["term"]
        )
        rows = vdf.select(
            F.pmod(F.xxhash64("term"), F.lit(self.n_buckets)).alias("b")
        ).collect()
        return sorted({int(r.b) for r in rows})

    def topk_batch(
        self,
        queries: DataFrame,
        k: int = 10,
        query_id_col: str = "query_id",
        query_col: str = "query",
        k1: float = 1.2,
        b: float = 0.75,
        max_literal_terms: int = DEFAULT_MAX_LITERAL_TERMS,
    ) -> DataFrame:
        """Top-``k`` per query — partition-pruned: only the query terms'
        buckets of the postings are read (plan-locked); the corpus is
        never touched.  df is derived from the same pruned read (exact —
        a term's postings are complete inside its bucket).  Output
        matches ``bm25_topk_batch`` exactly.

        Past ``max_literal_terms`` distinct terms the term filter switches
        from a literal IN-list (plan-size/codegen hazard at DPR-scale
        vocabularies) to a broadcast semi-join; the bucket filter stays a
        literal (bounded by n_buckets)."""
        import os

        if queries.isLocal():
            # literal/local query table (every serving call site): derive
            # the (query_id, term) pairs and vocabulary driver-side — the
            # same no-job fast path as ``bm25_topk_batch`` (query_terms
            # mirrors _terms_frame token-for-token), skipping a
            # distinct+collect round trip per search
            _require_integral_id(queries, query_id_col, "queries query_id")
            pairs = [
                (int(r[0]), t)
                for r in queries.select(
                    F.col(query_id_col).cast("long"), F.col(query_col)
                ).collect()
                for t in query_terms(r[1] or "")
            ]
            qterms = small_df(
                self.spark, pairs, "query_id: long, term: string",
                ["query_id", "term"],
            )
            vocab = sorted({t for _, t in pairs})
        else:
            qterms = _terms_frame(queries, query_id_col, query_col)
            vocab = sorted(
                {r[0] for r in qterms.select("term").distinct().collect()}
            )
        if not vocab:
            raise ValueError("no query has any terms")
        from .dirswap import read_path

        buckets = self._buckets_for(vocab)
        pruned = (
            self.spark.read.schema(self._posts_schema())
            .parquet(read_path(os.path.join(self.path, "postings"),
                               self.spark))
            .filter(F.col("__tb").isin(buckets))
        )
        if len(vocab) <= max_literal_terms:
            hits = pruned.filter(F.col("term").isin(vocab))
        else:
            vocab_df = F.broadcast(
                small_df(
                    self.spark, [(t,) for t in vocab], "term: string",
                    ["term"],
                )
            )
            hits = pruned.join(vocab_df, "term")
        hits = hits.drop("__tb", "__bk")
        dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
        consts_df = small_df(
            self.spark, [(self.n_docs, self.avgdl)],
            "n_docs: long, avgdl: double", ["n_docs", "avgdl"],
        )
        scored = _score_hits(
            hits, qterms, dfreq, consts_df, k1, b, self.id_col
        )
        return _rank_per_query(scored, k, self.id_col)

    def topk(self, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75) -> DataFrame:
        """Single-query convenience over ``topk_batch`` (drops query_id)."""
        q = small_df(
            self.spark, [(0, query)], "query_id: long, query: string",
            ["query_id", "query"],
        )
        return (
            self.topk_batch(q, k=k, k1=k1, b=b)
            .drop("query_id", "lex_rank")
        )


def _batch_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dl, term, tf) postings of a document frame — shared by the
    index writer and the key-reuse guard so the two can never diverge.

    NULL text still yields one posting row (term '', dl NULL): a plain
    explode would DROP the doc, excluding it from the doclens-derived
    (n_docs, avgdl) while the scan-time scorer counts it in n_docs — the
    coalesced sentinel keeps both paths value-identical on corpora with
    NULL text (n_docs counts the doc, avg(dl) skips its NULL dl, and the
    '' term can never match a query term — ``query_terms`` filters empty
    strings)."""
    toks = tokens(text_col)
    return (
        docs.select(
            id_col,
            F.size(toks).alias("dl"),
            F.explode(F.coalesce(toks, F.array(F.lit("")))).alias("term"),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _safe_index_key(key: str) -> str:
    """Validate an ingest key for use as a partition VALUE — the SAME
    validate-and-raise contract as the ledgers' _safe_key (admission_sink
    feeds one run-scoped key to both components, so their acceptance
    rules must not diverge; silent sanitization could also collide two
    distinct keys onto one partition)."""
    from .ledger import _safe_key

    return _safe_key(str(key))


def _merge_tombstones(ts_dir: str, pairs: DataFrame) -> None:
    """Maintain the DEDUPED tombstone table both serving indexes' forget()
    writes: union the new purged (id, batch) pairs with the existing
    table and staged-swap the result into ONE file.  Tombstone-sized work
    (bounded by cumulative deletions), and it keeps the keyed-replay
    check's read cost flat as forgets accumulate — plain appends would
    grow a file per forget and duplicate pairs across overlapping purges.
    Entries are never dropped here: only the CALLER knows when a batch
    key can no longer be replayed (its checkpoint committed past it), so
    retention is a caller-side decision."""
    from .dirswap import read_path, stage_path, swap_in

    spark = pairs.sparkSession
    live = read_path(ts_dir)
    if _has_parquet_data(ts_dir):
        merged = spark.read.parquet(live).unionByName(pairs).distinct()
        stage = stage_path(ts_dir, "merge")
        merged.coalesce(1).write.mode("overwrite").parquet(stage)
        swap_in(
            ts_dir, stage, verify=lambda p: spark.read.parquet(p).first()
        )
    else:
        # no table yet, OR a torn first write (directory with no data
        # files — a crash mid-write leaves only _temporary/).  A plain
        # isdir branch would try to READ the torn dir and fail forever;
        # overwrite heals it.  Safe ordering-wise: forget() tombstones
        # BEFORE it purges, so a torn tombstone write means the purge
        # never happened — there is nothing to resurrect yet.
        pairs.distinct().coalesce(1).write.mode("overwrite").parquet(live)


def _has_parquet_data(path: str) -> bool:
    """True when ``path`` holds at least one parquet data file — a torn
    first write (crash mid-job) leaves a directory with no data files,
    which must read as 'no table', never as an unreadable one."""
    from .dirswap import fs_listdir, read_path

    return any(n.endswith(".parquet") for n in fs_listdir(read_path(path)))


def _tombstoned_ids(spark, ts_dir: str, key: str, id_col: str):
    """The ids forget() tombstoned under ``key`` (None when no tombstone
    table exists) — the frame a keyed replay anti-joins its batch
    against.  Heals a crashed merge swap before reading; a torn FIRST
    write also reads as no-tombstones, which is sound because forget()
    tombstones before it purges (nothing was purged yet)."""
    from .dirswap import read_path

    live = read_path(ts_dir)
    if not _has_parquet_data(ts_dir):
        return None
    return (
        spark.read.parquet(live)
        .filter(F.col("__bk") == key)
        .select(id_col)
        .distinct()
    )


def prune_tombstones(
    spark,
    ts_dir: str,
    settled_keys=(),
    include_unreplayable: bool = False,
) -> int:
    """Retention for the deduped tombstone table (shared by both serving
    indexes): drop entries whose batch key can never be replayed again.

    ``_merge_tombstones`` deliberately never drops rows — only the caller
    knows when a key is SETTLED (its upstream checkpoint committed past
    the batch and the raw batch is retired, so no replay under that key
    can ever arrive).  This is that caller-side decision, surfaced as a
    maintenance op.  ``settled_keys`` takes the USER-FACING idempotency
    keys (exactly what ``ingest``/``add`` were called with); they are
    validated and mapped to the stored ``k-<key>`` partition values here,
    so a typo'd key raises instead of silently pruning nothing.

    ``include_unreplayable=True`` additionally drops rows whose ``__bk``
    is the build's ``base`` partition or an un-keyed ``u<N>`` counter.
    Those rows are consulted by NO code path — only keyed replays read
    tombstones — so dropping them is unconditionally safe; they exist
    because ``forget()`` tombstones every (id, batch) pair of a purged
    document regardless of how the batch originally landed.

    Contract the caller owns: after pruning a key, a replay of that
    key's ORIGINAL pre-forget batch would resurrect the purged documents
    (the stored-subset guard reads the purge as a crashed partial write).
    Prune only keys that provably cannot replay.

    Crash-safety: the rewrite is a staged + verified swap (the
    ``_merge_tombstones`` pattern); a prune-to-empty removes the table
    directory, and a crash mid-removal leaves only SETTLED rows behind —
    conservative in both directions.  Returns rows pruned (0 when the
    table does not exist or nothing matched)."""
    from .dirswap import read_path, remove_surface, stage_path, swap_in

    if isinstance(settled_keys, str):
        # iterating a bare string would "settle" its single CHARACTERS —
        # each a valid key — and silently prune the wrong rows
        raise TypeError(
            "settled_keys must be an iterable of keys, not a single "
            f"string ({settled_keys!r}); wrap it in a list"
        )
    dead_keys = ["k-" + _safe_index_key(k) for k in settled_keys]
    live = read_path(ts_dir)
    if (not dead_keys and not include_unreplayable) or not _has_parquet_data(
        ts_dir
    ):
        return 0
    cur = spark.read.parquet(live).localCheckpoint(eager=True)
    settled = F.col("__bk").isin(dead_keys) if dead_keys else F.lit(False)
    if include_unreplayable:
        settled = settled | (F.col("__bk") == "base") | F.col(
            "__bk"
        ).rlike(r"^u[0-9]+$")
    pruned = cur.filter(settled).count()
    if pruned == 0:
        return 0
    kept = cur.filter(~settled)
    if kept.isEmpty():
        remove_surface(ts_dir, spark)
        return pruned
    stage = stage_path(ts_dir, "merge")
    kept.coalesce(1).write.mode("overwrite").parquet(stage)
    swap_in(ts_dir, stage, verify=lambda p: spark.read.parquet(p).first())
    return pruned


def _warn_unkeyed_into_keyed_index(
    index_path: str, table_path: str, level_prefix: str
) -> None:
    """Warn LOUDLY when an un-keyed ingest targets an index that already
    holds keyed (``__bk=k-*``) batches: such an index is maintained by a
    replay-idempotent pipeline (e.g. ``admission_sink``), and an un-keyed
    append beside it reinstates exactly the double-count-on-replay
    foot-gun the keys exist to close.  A warning (not a refusal): offline
    backfills legitimately mix, but the operator should hear about it
    before a replay does the double counting.  The directory scan is
    scheme-dispatched (fs_listdir) because both index classes accept any
    swap-capable store at construction — a plain os.listdir would
    silently no-op on hdfs/abfs paths and mute the warning exactly where
    replays are most likely."""
    import logging
    import os

    from .dirswap import fs_isdir, fs_listdir

    root = table_path if fs_isdir(table_path) else None
    if root is None:
        return
    subdirs = [os.path.join(root, d) for d in fs_listdir(root)
               if d.startswith(level_prefix)] if level_prefix else [root]
    for sub in subdirs or [root]:
        if not fs_isdir(sub):
            continue
        if any(d.startswith("__bk=k-") for d in fs_listdir(sub)):
            logging.getLogger(__name__).warning(
                "un-keyed ingest into %r, which already holds keyed "
                "(__bk=k-*) batches — this index looks pipeline-maintained "
                "(admission_sink keys every ingest); an un-keyed append "
                "WILL double-count if the caller's batch is ever replayed. "
                "Pass idempotency_key unless this is a deliberate one-off "
                "backfill.",
                index_path,
            )
            return


def _unkeyed_batch_name(path: str) -> str:
    """A fresh __bk partition value for un-keyed appends: max existing
    u<N> counter + 1 across BOTH index tables, so a name still live in
    either is never reused (len()-based counting could resurrect a name
    after forget() dropped an earlier batch's partitions and then
    dynamic-overwrite a LIVE batch).  Un-keyed ingest remains the
    caller-owns-at-most-once path; replays WILL double-count."""
    import os
    import re as _re

    from .dirswap import fs_isdir, fs_listdir, read_path

    mx = -1
    lens = read_path(os.path.join(path, "doclens"))
    posts = read_path(os.path.join(path, "postings"))
    roots = []
    if fs_isdir(lens):
        roots.append(lens)
    if fs_isdir(posts):
        roots.extend(
            os.path.join(posts, d)
            for d in fs_listdir(posts)
            if d.startswith("__tb=")
        )
    for r in roots:
        for d in fs_listdir(r):
            m = _re.fullmatch(r"__bk=u(\d+)", d)
            if m:
                mx = max(mx, int(m.group(1)))
    return f"u{mx + 1}"
