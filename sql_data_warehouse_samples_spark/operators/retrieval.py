"""Hard-negative mining for retrieval/embedding training data.

Standard contrastive-training practice (DPR, Karpukhin 2020 §4.2;
sentence-transformers mining): for each training query, take the top
LEXICALLY-matching documents that are NOT labeled positives — "hard"
because BM25 thinks they answer the query — and additionally drop
candidates whose embedding is near-identical to a labeled positive
(``sim_ceiling``), the standard false-negative guard: an unlabeled
duplicate of the positive would otherwise be trained AGAINST as a
negative and poison the objective.

Scale shape (100 TB corpus, millions of queries):

* the ONLY corpus-sized work is the BM25 pass, which filters tokens to
  the query's terms BEFORE the explode (operators/bm25.py) — the shuffle
  carries hits only; with a persisted term-bucketed inverted index the
  scan prunes to the query's term buckets;
* everything downstream is bounded by |Q|·k_raw candidate rows: the
  positive anti-join and the false-negative cosine check are joins of a
  k_raw-row frame against a broadcast positive set — the corpus'
  embeddings are probed by key (|candidates| + |positives| rows fetched),
  never scanned pairwise.

Float conventions: BM25 scores and cosines round to 6 dp (the engine's
cross-engine determinism rule), ordering always carries an id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_hard_negatives(
    docs: DataFrame,
    query: str,
    positives: DataFrame,
    embeddings: DataFrame | None = None,
    query_id: int = 0,
    k: int = 10,
    k_raw: int | None = None,
    sim_ceiling: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mine up to ``k`` hard negatives for one training query.

    ``positives``: one column of ``id_col`` — the labeled relevant docs.
    ``embeddings``: optional (id, vector) side for the false-negative
    guard; when given, a candidate whose cosine to ANY positive is
    ``>= sim_ceiling`` is dropped.  Candidates or positives WITHOUT an
    embedding row are kept (no similarity evidence — the lexical signal
    stands), mirrored by the oracle's LEFT-join semantics.

    Output: (query_id, doc_id, bm25, lex_rank, max_pos_cosine) — the top
    ``k`` surviving candidates by BM25 rank.  ``lex_rank`` is the rank in
    the RAW candidate list (before drops), so a training pipeline can see
    how hard each negative is.

    One query per call (BM25 is per-query); loop or union for a query
    set — each call's non-corpus cost is bounded by ``k_raw`` rows.
    """
    from pyspark.sql import Window

    from .bm25 import bm25_topk
    from .similarity import cosine

    k_raw = k_raw or 2 * k
    pos = F.broadcast(
        positives.select(F.col(id_col).alias("__pos_id")).distinct()
    )
    cands = (
        bm25_topk(docs, query, k=k_raw, id_col=id_col, text_col=text_col)
        .withColumn(
            "lex_rank",
            F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc(id_col))),
        )
        .join(pos, F.col(id_col) == F.col("__pos_id"), "left_anti")
        # materialize the k_raw-row candidate list: BOTH the cosine-guard
        # branch and the final join consume it — without this the whole
        # corpus-sized BM25 pass is planned (and run) twice
        .localCheckpoint(eager=True)
    )
    if embeddings is not None:
        emb = embeddings.select(
            F.col(vec_id_col).alias("__eid"), F.col(vec_col).alias("__evec")
        )
        pos_vecs = F.broadcast(
            pos.join(emb, F.col("__pos_id") == F.col("__eid")).select(
                F.col("__evec").alias("__pvec")
            )
        )
        # |cands| x |positives| grid — both sides bounded (k_raw and the
        # label count), embeddings fetched by key, corpus never scanned
        max_cos = (
            cands.join(emb, F.col(id_col) == F.col("__eid"), "left")
            .join(pos_vecs, how="cross")
            .groupBy(id_col)
            .agg(
                F.max(
                    F.round(cosine(F.col("__evec"), F.col("__pvec")), 6)
                ).alias("max_pos_cosine")
            )
        )
        cands = cands.join(F.broadcast(max_cos), id_col, "left").filter(
            F.coalesce(F.col("max_pos_cosine") < sim_ceiling, F.lit(True))
        )
    else:
        cands = cands.withColumn(
            "max_pos_cosine", F.lit(None).cast("double")
        )
    return (
        cands.orderBy("lex_rank")
        .limit(k)
        .select(
            F.lit(query_id).cast("long").alias("query_id"),
            id_col,
            "bm25",
            "lex_rank",
            "max_pos_cosine",
        )
    )
