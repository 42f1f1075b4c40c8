"""Embedding-similarity workload over the embeddings table.

Driver-mandated LLM-pipeline surface: brute-force cosine top-k (exactness
baseline) + LSH-bucketed ANN (scale path).  Implementations in
``operators.similarity``.

Oracle note: DuckDB's builtin list_cosine_similarity accumulates in float32
(≈1e-7 off from double math), so oracles spell the dot product out in
explicit CAST(... AS DOUBLE) arithmetic matching Spark's fold, and both
sides round to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity as S
from ..operators._frames import small_df
from . import query
from ._util import tbl

_DOT = (
    "list_sum(list_transform(list_zip(q.embedding, c.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_NORM_Q = "sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
_NORM_C = "sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"


# ---------------------------------------------------------------------------
# s01 — brute-force cosine top-k for the first 10 vectors as queries.
# ---------------------------------------------------------------------------


@query(
    "s01_cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, embedding FROM embeddings),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_DOT} / NULLIF({_NORM_Q} * {_NORM_C}, 0), 6) AS cosine_sim
  FROM q, c
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine_sim, nbr_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS nbr_rank
  FROM sims
)
WHERE nbr_rank <= 5
""",
)
def s01_cosine_topk(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    # query side: a ≤10-row id slice — the spread exchange would widen it
    # to 32 near-empty partitions and the broadcast build would schedule a
    # 33-task job for 10 rows (r12 job-trace); the corpus side keeps the
    # spread (per-row cosine folds are the CPU term)
    q = tbl(spark, sf_dir, "embeddings", spread=False).filter(
        F.col("vec_id") < 10
    )
    return S.cosine_topk(e, q, k=5)


# ---------------------------------------------------------------------------
# s01+s03 battery — round-8 rotation: brute-force cosine top-k and corpus
# embedding statistics in ONE driver slot (the standalone s01/s03 stay
# registered post-window with their own oracles).  Each branch's oracle is
# the standalone query's, re-projected onto the shared battery schema.
# ---------------------------------------------------------------------------


@query(
    "s01_s03_embed_battery",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, embedding FROM embeddings),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_DOT} / NULLIF({_NORM_Q} * {_NORM_C}, 0), 6) AS cosine_sim
  FROM q, c
  WHERE q.vec_id <> c.vec_id
),
norms AS (
  SELECT label,
         ROUND(sqrt(list_sum(list_transform(c.embedding,
               x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))), 6) AS vnorm
  FROM (SELECT label, embedding FROM embeddings) c
)
SELECT 's01_cosine_topk' AS family,
       CAST(query_id AS VARCHAR) AS k,
       neighbor_id AS id2,
       CAST(nbr_rank AS BIGINT) AS n,
       cosine_sim AS x1,
       CAST(NULL AS DOUBLE) AS x2,
       CAST(NULL AS DOUBLE) AS x3
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS nbr_rank
  FROM sims
)
WHERE nbr_rank <= 5
UNION ALL
SELECT 's03_embedding_stats' AS family,
       CAST(label AS VARCHAR) AS k,
       CAST(NULL AS BIGINT) AS id2,
       COUNT(*) AS n,
       CAST(SUM(CAST(vnorm AS DECIMAL(18,6))) AS DOUBLE) AS x1,
       CAST(MIN(vnorm) AS DOUBLE) AS x2,
       CAST(MAX(vnorm) AS DOUBLE) AS x3
FROM norms
GROUP BY label
""",
)
def s01_s03_embed_battery(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    # id-slice query side: unspread (the s01 rationale)
    q = tbl(spark, sf_dir, "embeddings", spread=False).filter(
        F.col("vec_id") < 10
    )
    topk = S.cosine_topk(e, q, k=5).select(
        F.lit("s01_cosine_topk").alias("family"),
        F.col("query_id").cast("string").alias("k"),
        F.col("neighbor_id").alias("id2"),
        F.col("nbr_rank").cast("long").alias("n"),
        F.col("cosine_sim").alias("x1"),
        F.lit(None).cast("double").alias("x2"),
        F.lit(None).cast("double").alias("x3"),
    )
    norms = e.select(
        "label", F.round(S.norm(F.col("embedding")), 6).alias("vnorm")
    )
    stats = norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vnorm").cast("decimal(18,6)")).cast("double").alias("x1"),
        F.min("vnorm").cast("double").alias("x2"),
        F.max("vnorm").cast("double").alias("x3"),
    ).select(
        F.lit("s03_embedding_stats").alias("family"),
        F.col("label").cast("string").alias("k"),
        F.lit(None).cast("long").alias("id2"),
        "n",
        "x1",
        "x2",
        "x3",
    )
    return topk.unionByName(stats)


# ---------------------------------------------------------------------------
# s02 — LSH-bucketed approximate neighbors.  EXACT oracle (round-6, the r5
# verdict's stretch #10): the hyperplanes are deterministic Python floats
# (_hyperplanes(64, 6, seed=42)), so the oracle SQL inlines them as
# literal arrays and reproduces the full pipeline — sign-bit bucket ids,
# radius-1 multi-probe (bucket XOR each single bit), candidate equi-join,
# pair dedup, rounded cosine, top-5 — closed-form in DuckDB.  Both engines
# compare float64 dots against 0 for the sign bits; a flip would need a
# |dot| at the last-ulp scale, absent on this corpus (hash-matched at
# sf0.01 by the local oracle gate).
# ---------------------------------------------------------------------------


def _s02_oracle() -> str:
    planes = S._hyperplanes(64, 6, 42)

    def arr(p):
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    def bucket(t):
        bits = [
            f"(CASE WHEN list_sum(list_transform(list_zip({t}.embedding, "
            f"{arr(p)}), z -> CAST(z[1] AS DOUBLE) * z[2])) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        ]
        return "(" + " + ".join(bits) + ")"

    probes = "\n  UNION ALL\n".join(
        f"  SELECT query_id, embedding, xor(bucket, {1 << i}) AS bucket FROM q0"
        for i in range(len(planes))
    )
    dot = (
        "list_sum(list_transform(list_zip(s.qv, s.cv), "
        "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))"
    )
    nrm = (
        "sqrt(list_sum(list_transform(s.{v}, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    return f"""
WITH c AS (
  SELECT e.vec_id AS neighbor_id, e.embedding, {bucket('e')} AS bucket
  FROM embeddings e
),
q0 AS (
  SELECT e.vec_id AS query_id, e.embedding, {bucket('e')} AS bucket
  FROM embeddings e WHERE e.vec_id < 10
),
qp AS (
  SELECT query_id, embedding, bucket FROM q0
  UNION ALL
{probes}
),
cand AS (
  SELECT DISTINCT q.query_id, c.neighbor_id,
         q.embedding AS qv, c.embedding AS cv
  FROM qp q JOIN c USING (bucket)
  WHERE q.query_id <> c.neighbor_id
),
sims AS (
  SELECT query_id, neighbor_id,
         ROUND({dot} / NULLIF({nrm.format(v='qv')} * {nrm.format(v='cv')}, 0),
               6) AS cosine_sim
  FROM cand s
)
SELECT query_id, neighbor_id, cosine_sim, nbr_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS nbr_rank
  FROM sims)
WHERE nbr_rank <= 5
"""


@query("s02_ann_lsh_topk", oracle=_s02_oracle())
def s02_ann_lsh_topk(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    # id-slice query side: unspread (the s01 rationale)
    q = tbl(spark, sf_dir, "embeddings", spread=False).filter(
        F.col("vec_id") < 10
    )
    return S.ann_lsh_topk(e, q, k=5)


# ---------------------------------------------------------------------------
# s03 — vector stats per label: norms via exact-decimal aggregation.
# ---------------------------------------------------------------------------


@query(
    "s03_embedding_stats",
    oracle="""
WITH c AS (SELECT vec_id, label, embedding FROM embeddings),
norms AS (
  SELECT label,
         ROUND(sqrt(list_sum(list_transform(c.embedding,
               x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))), 6) AS vnorm
  FROM c
)
SELECT label, COUNT(*) AS n_vectors,
       CAST(SUM(CAST(vnorm AS DECIMAL(18,6))) AS DOUBLE) AS total_norm,
       CAST(MIN(vnorm) AS DOUBLE) AS min_norm,
       CAST(MAX(vnorm) AS DOUBLE) AS max_norm
FROM norms
GROUP BY label
""",
)
def s03_embedding_stats(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    norms = e.select(
        "label", F.round(S.norm(F.col("embedding")), 6).alias("vnorm")
    )
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("vnorm").cast("decimal(18,6)")).cast("double").alias("total_norm"),
        F.min("vnorm").cast("double").alias("min_norm"),
        F.max("vnorm").cast("double").alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# s04 — IVF-flat ANN: deterministic coarse quantizer (lowest-id seed
# centroids), corpus assigned to inverted lists by argmin L2, queries probe
# the nprobe nearest lists.  Fully SQL-expressible → exact oracle.
# ---------------------------------------------------------------------------

_L2 = (
    "ROUND(list_sum(list_transform(list_zip({l}.embedding, cents.cent),"
    " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6)"
)

_S04_DOT = (
    "list_sum(list_transform(list_zip(q.qvec, a.cvec),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_S04_NQ = "sqrt(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
_S04_NC = "sqrt(list_sum(list_transform(a.cvec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"


@query(
    "s04_ivf_topk",
    oracle=f"""
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent
               FROM embeddings WHERE vec_id < 16),
ca AS (SELECT c.vec_id AS neighbor_id, c.embedding AS cvec, centroid_id,
              {_L2.format(l='c')} AS d2
       FROM embeddings c, cents),
cassign AS (
  SELECT neighbor_id, cvec, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id
                                 ORDER BY d2, centroid_id) AS r FROM ca)
  WHERE r = 1),
qa AS (SELECT qv.vec_id AS query_id, qv.embedding AS qvec, centroid_id,
              {_L2.format(l='qv')} AS d2
       FROM (SELECT * FROM embeddings WHERE vec_id < 10) qv, cents),
qprobe AS (
  SELECT query_id, qvec, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY d2, centroid_id) AS r FROM qa)
  WHERE r <= 4),
sims AS (
  SELECT q.query_id, a.neighbor_id,
         ROUND({_S04_DOT} / NULLIF({_S04_NQ} * {_S04_NC}, 0), 6) AS cosine_sim
  FROM cassign a JOIN qprobe q USING (centroid_id)
  WHERE q.query_id <> a.neighbor_id)
SELECT query_id, neighbor_id, cosine_sim, nbr_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS nbr_rank
  FROM sims)
WHERE nbr_rank <= 5
""",
)
def s04_ivf_topk(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    # id-slice query side: unspread (the s01 rationale)
    q = tbl(spark, sf_dir, "embeddings", spread=False).filter(
        F.col("vec_id") < 10
    )
    return S.ivf_topk(e, q, k=5, nlist=16, nprobe=4)


# ---------------------------------------------------------------------------
# s15 — INDEX-BACKED IVF serving (operators/similarity.IvfIndex): s04's
# exact queries and exact oracle, answered from the PERSISTED inverted
# lists instead of re-assigning the corpus per call — the vector-serving
# cost story (s14 is the lexical twin).  The index builds once per
# sf_dir (cached under /tmp; build = s04's one assignment pass) with the
# same deterministic seed quantizer, so search() is value-identical to
# ivf_topk by construction and the oracle is shared verbatim.  Each
# search opens only the probed centroid partitions (~nprobe/nlist of the
# lists, statically pruned) — the claim the standing sf10 section
# measures at 100x.
# ---------------------------------------------------------------------------


def _ivf_serving_index(spark, sf_dir):
    import os as _os

    from ..operators.similarity import IvfIndex
    from ._util import serving_cache_dir

    # content-fingerprinted cache key (r10 ADVICE): a regenerated
    # dataset at the same path gets a fresh index, never a stale one
    path = serving_cache_dir(sf_dir, "ivf_serving", "embeddings")
    if _os.path.isdir(_os.path.join(path, "lists")):
        return IvfIndex.load(spark, path)
    e = tbl(spark, sf_dir, "embeddings")
    return IvfIndex.build(e, path, nlist=16)  # s04's seed quantizer


def _s15_oracle() -> str:
    from . import ORACLES

    return ORACLES["s04_ivf_topk"]


@query("s15_ivf_index_serving", oracle=_s15_oracle())
def s15_ivf_index_serving(spark, sf_dir):
    idx = _ivf_serving_index(spark, sf_dir)
    # id-slice query side: unspread (the s01 rationale)
    e = tbl(spark, sf_dir, "embeddings", spread=False)
    return idx.search(e.filter(F.col("vec_id") < 10), k=5, nprobe=4)


# ---------------------------------------------------------------------------
# s05 — int8 embedding quantization (operators/similarity.quantize_embeddings):
# the 4x storage/shuffle compression path for a 100 TB embedding corpus.
# Map-only; all math in float64 so the oracle reproduces it exactly.
# ---------------------------------------------------------------------------


@query(
    "s05_embedding_quantize",
    oracle="""
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS q_scale
  FROM embeddings
)
SELECT vec_id,
       ROUND(q_scale, 6) AS q_scale6,
       CASE WHEN q_scale = 0 THEN list_transform(embedding, x -> 0)
            ELSE list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) / q_scale) AS INT)) END AS q
FROM s
""",
)
def s05_embedding_quantize(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    out = S.quantize_embeddings(e)
    return out.select(
        "vec_id",
        F.round("q_scale", 6).alias("q_scale6"),
        "q",
    )


# ---------------------------------------------------------------------------
# d12 — semantic dedup (SemDeDup, operators/dedup.semantic_dedup): cluster by
# nearest seed centroid, prune any vector with a ≥-threshold lower-id
# neighbor in its cluster, return survivors.  Deterministic seed quantizer
# (vec_id < 16) makes the whole pipeline SQL-expressible → exact oracle.
# nlist=16 balances the argmin fold (∝ nlist) against the quadratic
# in-cluster pair stage (∝ n²/nlist) at the bench scale.
# The corpus has no planted near-identical embeddings, so the threshold sits
# at the top of the observed cosine range (~0.35+) to exercise real pruning;
# semantics at production thresholds (0.9+) are covered by planted-dup tests.
# ---------------------------------------------------------------------------

_D12_L2 = (
    "ROUND(list_sum(list_transform(list_zip({l}.embedding, cents.cent),"
    " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6)"
)

_D12_DOT = (
    "list_sum(list_transform(list_zip(a.v, b.v),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_D12_NA = "sqrt(list_sum(list_transform(a.v, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
_D12_NB = "sqrt(list_sum(list_transform(b.v, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"


@query(
    "d12_semantic_dedup",
    oracle=f"""
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cent
               FROM embeddings WHERE vec_id < 16),
ca AS (SELECT e.vec_id AS id, e.embedding AS v, centroid_id,
              {_D12_L2.format(l='e')} AS d2
       FROM embeddings e, cents),
assign AS (
  SELECT id, v, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                 ORDER BY d2, centroid_id) AS r FROM ca)
  WHERE r = 1)
SELECT s.id AS vec_id, s.centroid_id
FROM assign s
WHERE NOT EXISTS (
  SELECT 1 FROM assign a JOIN assign b
    ON a.centroid_id = b.centroid_id AND a.id < b.id
  WHERE b.id = s.id
    AND ROUND({_D12_DOT} / NULLIF({_D12_NA} * {_D12_NB}, 0), 6) >= 0.35)
""",
)
def d12_semantic_dedup(spark, sf_dir):
    """SemDeDup's scale rule (Abbas et al. 2023 §3): CLUSTER COUNT grows
    with the corpus so cluster SIZE (the quadratic term) stays constant —
    nlist = n/500, floored at 16 so every driver/oracle scale (sf0.01 has
    ≤2k vectors) keeps the exact nlist=16 the SQL oracle hardcodes.  The
    10x bench corpus measured 11.4x scaling with nlist pinned vs ~linear
    with this rule (PERFORMANCE.md)."""
    from ..operators.dedup import semantic_dedup
    from ._util import table_rows

    e = tbl(spark, sf_dir, "embeddings")
    # corpus size from the parquet footers (exact — what count() returns)
    # instead of a full scan+exchange job per call; see _util.table_rows
    try:
        n = table_rows(sf_dir, "embeddings")
    except Exception:  # noqa: BLE001 - stats miss → honest count job
        n = e.count()
    nlist = max(16, n // 500)
    cents = S.seed_centroids(e, nlist=nlist)
    return semantic_dedup(e, cents, threshold=0.35)


# ---------------------------------------------------------------------------
# s06 — product-quantization encoding (operators/similarity.pq_encode;
# Jégou et al. 2011, FAISS PQ).  Seed codebooks = the k lowest-id vectors'
# subvectors (pq_codebooks), so the per-subspace argmin is fully
# SQL-expressible — exploded to scalar rows for an exact oracle.  m=8
# subspaces of dim/8; k=16 codes (embeddings ids are dense from 0, so the
# oracle's seed vec_id IS the dense code).  The ADC search path (pq_topk)
# is recall-checked against s01 brute force in tests/test_operators.py.
# ---------------------------------------------------------------------------

_S06_SUB_D2 = (
    "ROUND(list_sum(list_transform(list_zip(sub.v, cb.c),"
    " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6)"
)


@query(
    "s06_pq_codes",
    oracle=f"""
WITH js AS (SELECT unnest(range(8)) AS j),
sub AS (
  SELECT e.vec_id, js.j, list_slice(e.embedding, js.j*8+1, js.j*8+8) AS v
  FROM embeddings e, js
),
cb AS (
  SELECT s.vec_id AS code, js.j, list_slice(s.embedding, js.j*8+1, js.j*8+8) AS c
  FROM embeddings s, js
  WHERE s.vec_id < 16
),
d AS (
  SELECT sub.vec_id, sub.j, cb.code, {_S06_SUB_D2} AS d2
  FROM sub JOIN cb ON sub.j = cb.j
)
SELECT vec_id, CAST(j AS BIGINT) AS subspace, code, d2 AS sub_d2
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS r
  FROM d)
WHERE r = 1
""",
)
def s06_pq_codes(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    books = S.pq_codebooks(e, m=8, k=16)
    enc = S.pq_encode(e, books)
    return enc.select(
        "vec_id", F.posexplode("pq").alias("subspace", "s")
    ).select(
        "vec_id",
        F.col("subspace").cast("long").alias("subspace"),
        F.col("s.code").alias("code"),
        F.col("s.d2").alias("sub_d2"),
    )


# ---------------------------------------------------------------------------
# s08 — label centroids (grouped mean-pool): the class-centroid primitive
# under SemDeDup / IVF training / prototype classification, as an exact-
# oracle query.  Per-coordinate rows (label, pos, m) keep the schema scalar
# for hash comparison; the order-independent DECIMAL(18,6) sum makes the
# mean identical across engines regardless of aggregation order.
# ---------------------------------------------------------------------------


@query(
    "s08_label_centroids",
    oracle="""
WITH ex AS (
  SELECT label, CAST(u.i AS INT) AS pos,
         CAST(embedding[CAST(u.i AS INT) + 1] AS DOUBLE) AS x
  FROM embeddings, UNNEST(range(0, LEN(embedding))) AS u(i)
)
SELECT label,
       CAST(pos AS INT) AS pos,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS m
FROM ex GROUP BY label, pos ORDER BY label, pos
""",
)
def s08_label_centroids(spark, sf_dir):
    """Mean-pooled embedding per label: ONE posexplode + one (label, pos)
    aggregate — n·d skinny rows with uniform keys, map-side combined; no
    collect, no UDF.  Downstream re-packs with array_sort(collect_list)
    when a vector shape is needed (same rounding, so bit-identical)."""
    e = tbl(spark, sf_dir, "embeddings")
    ex = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    return (
        ex.groupBy("label", F.col("pos").cast("int").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                (
                    F.sum(F.round(F.col("x"), 6).cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                ),
                6,
            ).alias("m"),
        )
        .orderBy("label", "pos")
    )


# ---------------------------------------------------------------------------
# s09 — corpus-vs-corpus KNN JOIN (both sides large): block-nested Arrow
# gemm, exact semantics — every corpus vector gets its k nearest others.
# The IVF-pruned approximate mode of the same operator is recall-tested in
# tests/test_operators.py.
# ---------------------------------------------------------------------------


@query(
    "s09_knn_join",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings),
c AS (SELECT vec_id, embedding FROM embeddings),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_DOT} / NULLIF({_NORM_Q} * {_NORM_C}, 0), 6) AS cosine_sim
  FROM q, c
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine_sim, nbr_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS nbr_rank
  FROM sims
)
WHERE nbr_rank <= 3
""",
)
def s09_knn_join(spark, sf_dir):
    """All-pairs KNN join of the embeddings table against itself, k=3 —
    the self-similarity graph every SemDeDup/graph-dedup pipeline starts
    from.  Exact block mode: an 8×8 grid of cogrouped gemm tiles, shuffle
    = 8×|corpus| skinny rows per side, no executor ever materializes more
    than one tile; ranking re-ranks ≤ 8·k local winners per query."""
    e = tbl(spark, sf_dir, "embeddings")
    return S.knn_join(e, e, k=3)


# ---------------------------------------------------------------------------
# s10 — PQ + exact refine (FAISS IndexRefineFlat pattern): ADC over the
# stored codes selects 20 candidates/query, then ONLY those 20 rows read
# the full-precision vector for an exact-cosine re-rank.  Seed codebooks
# (= the s06 exact-encode convention) keep the whole pipeline, candidate
# cut included, closed-form in DuckDB; exact_decimal=True accumulates the
# ADC sum as DECIMAL on both sides so candidate ranks can't flip on a
# float ulp.
# ---------------------------------------------------------------------------

_S10_QD2 = (
    "ROUND(list_sum(list_transform(list_zip(q.qv, cb.c),"
    " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6)"
)


@query(
    "s10_pq_refine_topk",
    oracle=f"""
WITH js AS (SELECT unnest(range(8)) AS j),
sub AS (
  SELECT e.vec_id, js.j, list_slice(e.embedding, js.j*8+1, js.j*8+8) AS v
  FROM embeddings e, js
),
cb AS (
  SELECT s.vec_id AS code, js.j, list_slice(s.embedding, js.j*8+1, js.j*8+8) AS c
  FROM embeddings s, js
  WHERE s.vec_id < 16
),
d AS (
  SELECT sub.vec_id, sub.j, cb.code,
         ROUND(list_sum(list_transform(list_zip(sub.v, cb.c),
           p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
              * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6) AS d2
  FROM sub JOIN cb ON sub.j = cb.j
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS r
    FROM d)
  WHERE r = 1
),
q AS (
  SELECT e.vec_id AS query_id, js.j, list_slice(e.embedding, js.j*8+1, js.j*8+8) AS qv
  FROM embeddings e, js WHERE e.vec_id < 5
),
qtab AS (
  SELECT q.query_id, q.j, cb.code, {_S10_QD2} AS qd2
  FROM q JOIN cb ON q.j = cb.j
),
adc AS (
  SELECT qt.query_id, cd.vec_id AS neighbor_id,
         CAST(SUM(CAST(qt.qd2 AS DECIMAL(28,10))) AS DOUBLE) AS adc_d2
  FROM codes cd JOIN qtab qt ON cd.j = qt.j AND cd.code = qt.code
  WHERE cd.vec_id <> qt.query_id
  GROUP BY qt.query_id, cd.vec_id
),
cand AS (
  SELECT query_id, neighbor_id, adc_d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adc_d2, neighbor_id) AS cr
    FROM adc)
  WHERE cr <= 20
),
rer AS (
  SELECT cand.query_id, cand.neighbor_id, cand.adc_d2,
         ROUND({_DOT} / NULLIF({_NORM_Q} * {_NORM_C}, 0), 6) AS cos
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, adc_d2, cos, nbr_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS nbr_rank
  FROM rer)
WHERE nbr_rank <= 5
""",
)
def s10_pq_refine_topk(spark, sf_dir):
    e = tbl(spark, sf_dir, "embeddings")
    # probe/slice sides: unspread (the s01 rationale) — the codebook seed
    # is a 16-row slice, the queries a 5-row slice, and the refine stage
    # fetches only the |Q|·candidates shortlist from the raw table; only
    # the pq_encode corpus pass is per-row CPU that wants the spread
    ep = tbl(spark, sf_dir, "embeddings", spread=False)
    books = S.pq_codebooks(ep, m=8, k=16)
    codes = S.pq_encode(e, books).select("vec_id", "pq")
    queries = ep.filter(F.col("vec_id") < 5)
    return S.pq_refine_topk(
        codes, ep, queries, books, k=5, candidates=20, exact_decimal=True
    )


# ---------------------------------------------------------------------------
# s16 — IVF-PQ index-backed refined serving (r12): the third serving-index
# flagship, completing the triple (s14 BM25, s15 IVF-flat, s16 IVF-PQ).
# Shares s10's EXACT oracle verbatim: with the deterministic seed
# quantizer+codebooks (train_iters=0, pq_iters=0, residual=False) the
# persisted codes are value-identical to s10's scan-path encode, and with
# nprobe=nlist the probe-pruned ADC candidate set equals the exhaustive
# scan's (the oracle demands exhaustive ADC; recall-trading nprobe<nlist
# pruning is the same machinery, test-locked separately).  exact_decimal
# makes the served distances bit-identical to pq_topk's decimal fold.
# Serving cost story: stage 1 reads STORED m-byte codes (never a raw
# vector — the ~190x IO cut at dim-768/m=16); stage 2 re-ranks only the
# |Q|*candidates shortlist against raw vectors, broadcast-pruned.
# ---------------------------------------------------------------------------


def _ivfpq_serving_index(spark, sf_dir):
    import os as _os

    from ..operators.similarity import IvfPqIndex
    from ._util import serving_cache_dir

    path = serving_cache_dir(sf_dir, "ivfpq_serving", "embeddings")
    if _os.path.isdir(_os.path.join(path, "lists")):
        return IvfPqIndex.load(spark, path)
    e = tbl(spark, sf_dir, "embeddings")
    # s10's deterministic codebooks (pq_codebooks seed, m=8, k=16); seed
    # coarse quantizer so the layout is reproducible
    return IvfPqIndex.build(e, path, nlist=16, m=8, k_pq=16)


def _s16_oracle() -> str:
    from . import ORACLES

    return ORACLES["s10_pq_refine_topk"]


@query("s16_ivfpq_index_serving", oracle=_s16_oracle())
def s16_ivfpq_index_serving(spark, sf_dir):
    idx = _ivfpq_serving_index(spark, sf_dir)
    # query slice + shortlist-fetch raw side: unspread (the s01/s10
    # rationale) — the index path never runs per-row CPU over the corpus
    e = tbl(spark, sf_dir, "embeddings", spread=False)
    return idx.search_refined(
        e.filter(F.col("vec_id") < 5),
        e,
        k=5,
        nprobe=16,
        candidates=20,
        exact_decimal=True,
    )


# ---------------------------------------------------------------------------
# s17 — RESIDUAL IVF-PQ refined serving (r12): the FAISS IVF-PQ default
# (Jégou 2011 §V.A — encode x − centroid(x); residuals have lower variance
# than raw vectors, so the same m×k codebook budget quantizes them more
# finely).  Everything stays closed-form because the coarse quantizer and
# codebooks are the deterministic seeds: assignment = d12's argmin CTE,
# residual = one list_zip subtract, codebooks = the residual subvectors of
# the 16 lowest ids, and the per-(query,centroid) lookup tables are the
# residual twist the oracle must reproduce — a candidate's ADC uses the
# table of ITS OWN centroid (q − that centroid), not one global table.
# nprobe=nlist keeps the candidate set exhaustive (the exactness the
# oracle needs); the recall-trading pruned path is the same machinery.
# ---------------------------------------------------------------------------

_S17_SUBD2 = (
    "ROUND(list_sum(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
)


def _ivfpq_res_serving_index(spark, sf_dir):
    import os as _os

    from ..operators.similarity import IvfPqIndex
    from ._util import serving_cache_dir

    path = serving_cache_dir(sf_dir, "ivfpq_res_serving", "embeddings")
    if _os.path.isdir(_os.path.join(path, "lists")):
        return IvfPqIndex.load(spark, path)
    e = tbl(spark, sf_dir, "embeddings")
    return IvfPqIndex.build(
        e, path, nlist=16, m=8, k_pq=16, residual=True
    )


@query(
    "s17_residual_pq_serving",
    oracle=f"""
WITH js AS (SELECT unnest(range(8)) AS j),
cents AS (SELECT vec_id AS centroid_id, embedding AS cent
          FROM embeddings WHERE vec_id < 16),
ca AS (
  SELECT e.vec_id, e.embedding, cents.centroid_id,
         ROUND(list_sum(list_transform(list_zip(e.embedding, cents.cent),
           p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
              * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6) AS d2
  FROM embeddings e, cents),
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY d2, centroid_id) AS r FROM ca)
  WHERE r = 1),
resid AS (
  SELECT a.vec_id, a.centroid_id,
         list_transform(list_zip(a.embedding, c.cent),
           p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) AS rv
  FROM assign a JOIN cents c USING (centroid_id)),
sub AS (SELECT r.vec_id, js.j, list_slice(r.rv, js.j*8+1, js.j*8+8) AS v
        FROM resid r, js),
cb AS (SELECT r.vec_id AS code, js.j,
              list_slice(r.rv, js.j*8+1, js.j*8+8) AS c
       FROM resid r, js WHERE r.vec_id < 16),
d AS (
  SELECT sub.vec_id, sub.j, cb.code,
         {_S17_SUBD2.format(a="sub.v", b="cb.c")} AS d2
  FROM sub JOIN cb ON sub.j = cb.j),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                 ORDER BY d2, code) AS r FROM d)
  WHERE r = 1),
qres AS (
  SELECT e.vec_id AS query_id, cents.centroid_id,
         list_transform(list_zip(e.embedding, cents.cent),
           p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) AS qv
  FROM embeddings e, cents WHERE e.vec_id < 5),
qtab AS (
  SELECT q.query_id, q.centroid_id, cb.j, cb.code,
         {_S17_SUBD2.format(
             a="list_slice(q.qv, cb.j*8+1, cb.j*8+8)", b="cb.c")} AS qd2
  FROM qres q CROSS JOIN cb),
adc AS (
  SELECT qt.query_id, a.vec_id AS neighbor_id,
         CAST(SUM(CAST(qt.qd2 AS DECIMAL(28,10))) AS DOUBLE) AS adc_d2
  FROM codes cd
  JOIN assign a ON a.vec_id = cd.vec_id
  JOIN qtab qt ON qt.centroid_id = a.centroid_id
              AND qt.j = cd.j AND qt.code = cd.code
  WHERE cd.vec_id <> qt.query_id
  GROUP BY qt.query_id, a.vec_id),
cand AS (
  SELECT query_id, neighbor_id, adc_d2 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adc_d2, neighbor_id) AS cr
    FROM adc) WHERE cr <= 20),
rer AS (
  SELECT cand.query_id, cand.neighbor_id, cand.adc_d2,
         ROUND({_DOT} / NULLIF({_NORM_Q} * {_NORM_C}, 0), 6) AS cos
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings c ON c.vec_id = cand.neighbor_id)
SELECT query_id, neighbor_id, adc_d2, cos, nbr_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS nbr_rank
  FROM rer)
WHERE nbr_rank <= 5
""",
)
def s17_residual_pq_serving(spark, sf_dir):
    idx = _ivfpq_res_serving_index(spark, sf_dir)
    # query slice + shortlist-fetch raw side: unspread (the s16 rationale)
    e = tbl(spark, sf_dir, "embeddings", spread=False)
    return idx.search_refined(
        e.filter(F.col("vec_id") < 5),
        e,
        k=5,
        nprobe=16,
        candidates=20,
        exact_decimal=True,
    )


# ---------------------------------------------------------------------------
# s11 — hybrid lexical+vector retrieval via reciprocal-rank fusion
# (Cormack 2009): the BM25 top-10 for a term query and the cosine top-10
# for an embedding query fuse as score = Σ 1/(60 + rank).  Both input
# rank lists already carry exact oracles (s07 / s01 conventions); the
# fusion adds one |lists|·k-row union + aggregate — corpus-free, so the
# 100 TB cost lives entirely in the upstream retrievers.  Reciprocals are
# rounded to 10 dp and summed as DECIMAL on both sides.
# ---------------------------------------------------------------------------

_S11_QUERY, _S11_K = "spark hash join window", 10
_S11_TERMS = "'" + "','".join(_S11_QUERY.split()) + "'"


@query(
    "s11_hybrid_rrf",
    oracle=rf"""
WITH sized AS (
  SELECT doc_id,
         LEN(string_split_regex(TRIM(text), '\s+')) AS dl,
         list_filter(string_split_regex(TRIM(text), '\s+'),
                     t -> list_contains([{_S11_TERMS}], t)) AS hits
  FROM documents
),
consts AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM sized),
hit AS (SELECT doc_id, dl, unnest(hits) AS term FROM sized),
tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM hit GROUP BY doc_id, dl, term),
dfreq AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term),
bm AS (
  SELECT doc_id,
         ROUND(SUM(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                   * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6)
           AS bm25
  FROM tf JOIN dfreq USING (term) CROSS JOIN consts
  GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT {_S11_K}
),
lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM bm
),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id, embedding FROM embeddings),
sims AS (
  SELECT c.vec_id AS doc_id,
         ROUND({_DOT} / NULLIF({_NORM_Q} * {_NORM_C}, 0), 6) AS cosine_sim
  FROM q, c
  WHERE q.vec_id <> c.vec_id
),
vec AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, doc_id) AS rank
    FROM sims)
  WHERE rank <= {_S11_K}
),
uni AS (
  SELECT doc_id, CAST(ROUND(1.0 / (60 + rank), 10) AS DECIMAL(28,10)) AS r FROM lex
  UNION ALL
  SELECT doc_id, CAST(ROUND(1.0 / (60 + rank), 10) AS DECIMAL(28,10)) AS r FROM vec
)
SELECT CAST(0 AS BIGINT) AS query_id, doc_id,
       CAST(SUM(r) AS DOUBLE) AS rrf,
       COUNT(*) AS n_lists,
       ROW_NUMBER() OVER (ORDER BY SUM(r) DESC, doc_id) AS fused_rank
FROM uni GROUP BY doc_id
""",
)
def s11_hybrid_rrf(spark, sf_dir):
    from ..operators.bm25 import bm25_topk
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents")
    e = tbl(spark, sf_dir, "embeddings")
    lex = bm25_topk(d, _S11_QUERY, k=_S11_K).select(
        F.lit(0).cast("long").alias("query_id"),
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("rank"),
    )
    # single-row query slice: unspread (the s01 rationale)
    q1 = tbl(spark, sf_dir, "embeddings", spread=False).filter(
        F.col("vec_id") == 0
    )
    vec = S.cosine_topk(e, q1, k=_S11_K).select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("nbr_rank").alias("rank"),
    )
    return S.rrf_fuse([lex, vec], k0=60)


# ---------------------------------------------------------------------------
# s12 — hard-negative mining for retrieval training (DPR Karpukhin 2020
# §4.2 / sentence-transformers practice): top BM25 candidates that are NOT
# labeled positives, minus candidates whose embedding is near-identical to
# a positive (the false-negative guard).  Composes the s07 BM25 and s01
# cosine conventions; everything past the term-filtered BM25 pass is
# bounded by k_raw candidate rows.  Positives here: doc_id IN (0, 1).
# ---------------------------------------------------------------------------

_S12_K, _S12_RAW, _S12_CEIL = 10, 20, 0.6


@query(
    "s12_hard_negatives",
    oracle=rf"""
WITH sized AS (
  SELECT doc_id,
         LEN(string_split_regex(TRIM(text), '\s+')) AS dl,
         list_filter(string_split_regex(TRIM(text), '\s+'),
                     t -> list_contains([{_S11_TERMS}], t)) AS hits
  FROM documents
),
consts AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM sized),
hit AS (SELECT doc_id, dl, unnest(hits) AS term FROM sized),
tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM hit GROUP BY doc_id, dl, term),
dfreq AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term),
bm AS (
  SELECT doc_id,
         ROUND(SUM(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                   * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6)
           AS bm25
  FROM tf JOIN dfreq USING (term) CROSS JOIN consts
  GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT {_S12_RAW}
),
ranked AS (
  SELECT doc_id, bm25,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER)
           AS lex_rank
  FROM bm
),
negs AS (SELECT * FROM ranked WHERE doc_id NOT IN (0, 1)),
pv AS (SELECT embedding FROM embeddings WHERE vec_id IN (0, 1)),
mc AS (
  SELECT n.doc_id,
         MAX(ROUND({_DOT} / NULLIF({_NORM_Q} * {_NORM_C}, 0), 6))
           AS max_pos_cosine
  FROM negs n
  LEFT JOIN embeddings c ON c.vec_id = n.doc_id
  CROSS JOIN pv q
  GROUP BY n.doc_id
)
SELECT CAST(0 AS BIGINT) AS query_id, n.doc_id, n.bm25, n.lex_rank,
       mc.max_pos_cosine
FROM negs n LEFT JOIN mc ON mc.doc_id = n.doc_id
WHERE COALESCE(mc.max_pos_cosine < {_S12_CEIL}, TRUE)
ORDER BY n.lex_rank LIMIT {_S12_K}
""",
)
def s12_hard_negatives(spark, sf_dir):
    from ..operators.retrieval import mine_hard_negatives

    d = tbl(spark, sf_dir, "documents")
    # the guard only PROBES embeddings (bounded semi-join fetch) — the
    # spread exchange would shuffle the whole vector payload to filter a
    # few dozen rows (r12 job-trace: a 0.6 s 32-task stage for 22 rows)
    e = tbl(spark, sf_dir, "embeddings", spread=False)
    positives = small_df(spark, [(0,), (1,)], "doc_id: long", ["doc_id"])
    return mine_hard_negatives(
        d,
        _S11_QUERY,
        positives,
        embeddings=e,
        k=_S12_K,
        k_raw=_S12_RAW,
        sim_ceiling=_S12_CEIL,
    )


# ---------------------------------------------------------------------------
# s13 — BATCHED hard-negative mining (the DPR-scale shape the r7 verdict
# asked for): a query TABLE mined in ONE corpus pass — the (query_id, term)
# list broadcasts into the shared BM25 scorer, candidates rank per query,
# per-query positives anti-join and cosine-guard against per-query positive
# embeddings.  Three queries in one call: q0 has two positives, q1 two
# different ones, q2 NONE (exercises the no-positive / NULL-cosine keep
# semantics).  Oracle: s12's SQL parameterized by a (query_id, term) VALUES
# list — every stage gains a query_id key, nothing else changes.
# ---------------------------------------------------------------------------

_S13 = [
    (0, "spark hash join window"),
    (1, "vector scan filter merge"),
    (2, "stream batch query sort"),
]
_S13_POS = [(0, 0), (0, 1), (1, 2), (1, 3)]
_S13_K, _S13_RAW, _S13_CEIL = 5, 12, 0.6
_S13_QT_SQL = ", ".join(
    f"({qid}, '{t}')" for qid, q in _S13 for t in q.split()
)
_S13_POS_SQL = ", ".join(f"({q}, {d})" for q, d in _S13_POS)
_S13_VOCAB_SQL = "'" + "','".join(
    sorted({t for _, q in _S13 for t in q.split()})
) + "'"


@query(
    "s13_hard_negatives_batch",
    oracle=rf"""
WITH qt(query_id, term) AS (VALUES {_S13_QT_SQL}),
pos(query_id, doc_id) AS (VALUES {_S13_POS_SQL}),
sized AS (
  SELECT doc_id,
         LEN(string_split_regex(TRIM(text), '\s+')) AS dl,
         list_filter(string_split_regex(TRIM(text), '\s+'),
                     t -> list_contains([{_S13_VOCAB_SQL}], t)) AS hits
  FROM documents
),
consts AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM sized),
hit AS (SELECT doc_id, dl, unnest(hits) AS term FROM sized),
tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM hit GROUP BY doc_id, dl, term),
dfreq AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         ROUND(SUM(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
                   * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6)
           AS bm25
  FROM tf JOIN qt USING (term) JOIN dfreq USING (term) CROSS JOIN consts
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, bm25,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY bm25 DESC, doc_id) AS INTEGER)
           AS lex_rank
  FROM scored
  QUALIFY lex_rank <= {_S13_RAW}
),
negs AS (
  SELECT r.* FROM ranked r
  LEFT JOIN pos p ON p.query_id = r.query_id AND p.doc_id = r.doc_id
  WHERE p.doc_id IS NULL
),
pv AS (
  SELECT p.query_id, e.embedding
  FROM pos p JOIN embeddings e ON e.vec_id = p.doc_id
),
mc AS (
  SELECT n.query_id, n.doc_id,
         MAX(ROUND({_DOT} / NULLIF({_NORM_Q} * {_NORM_C}, 0), 6))
           AS max_pos_cosine
  FROM negs n
  LEFT JOIN embeddings c ON c.vec_id = n.doc_id
  JOIN pv q ON q.query_id = n.query_id
  GROUP BY n.query_id, n.doc_id
)
SELECT CAST(n.query_id AS BIGINT) AS query_id, n.doc_id, n.bm25, n.lex_rank,
       mc.max_pos_cosine
FROM negs n
LEFT JOIN mc ON mc.query_id = n.query_id AND mc.doc_id = n.doc_id
WHERE COALESCE(mc.max_pos_cosine < {_S13_CEIL}, TRUE)
QUALIFY ROW_NUMBER() OVER (PARTITION BY n.query_id ORDER BY n.lex_rank)
        <= {_S13_K}
""",
)
def s13_hard_negatives_batch(spark, sf_dir):
    from ..operators.retrieval import mine_hard_negatives_batch

    d = tbl(spark, sf_dir, "documents")
    # probe-only embeddings side: unspread (the s12 rationale)
    e = tbl(spark, sf_dir, "embeddings", spread=False)
    queries = small_df(
        spark, _S13, "query_id: long, query: string", ["query_id", "query"]
    )
    positives = small_df(
        spark, _S13_POS, "query_id: long, doc_id: long", ["query_id", "doc_id"]
    )
    return mine_hard_negatives_batch(
        d,
        queries,
        positives,
        embeddings=e,
        k=_S13_K,
        k_raw=_S13_RAW,
        sim_ceiling=_S13_CEIL,
    )


# ---------------------------------------------------------------------------
# r13 window re-seats (VERDICT r12 item 1): the round-12 rotation dropped
# three green driver rows (s10, s12, t21).  Per the established fold
# discipline (q03_q05 et al.) each pair below shares ONE driver seat while
# BOTH constituents stay registered and locally oracle-checked: the battery
# literally RUNS both pipelines and unions their tagged outputs, so the
# driver's 50-row window hash-verifies s10+s16 / s12+s13 in one row each.
# ---------------------------------------------------------------------------


def _s10_s16_oracle() -> str:
    from . import ORACLES

    base = ORACLES["s10_pq_refine_topk"]
    return (
        f"SELECT 'scan' AS mode, * FROM ({base})\n"
        f"UNION ALL\nSELECT 'served' AS mode, * FROM ({base})"
    )


@query("s10_s16_pq_battery", oracle=_s10_s16_oracle())
def s10_s16_pq_battery(spark, sf_dir):
    """PQ retrieval battery: s10's scan-path encode+ADC+refine and s16's
    IVF-PQ index-backed serving of the SAME queries — value-identical by
    construction (shared exact oracle), tagged and unioned so one driver
    seat hash-checks both the scan and the serving pipeline."""
    a = s10_pq_refine_topk(spark, sf_dir).select(
        F.lit("scan").alias("mode"), "*"
    )
    b = s16_ivfpq_index_serving(spark, sf_dir).select(
        F.lit("served").alias("mode"), "*"
    )
    return a.unionByName(b)


def _s12_s13_oracle() -> str:
    from . import ORACLES

    return (
        f"SELECT 'single' AS mode, * FROM ({ORACLES['s12_hard_negatives']})\n"
        f"UNION ALL\nSELECT 'batch' AS mode, * FROM "
        f"({ORACLES['s13_hard_negatives_batch']})"
    )


@query("s12_s13_mining_battery", oracle=_s12_s13_oracle())
def s12_s13_mining_battery(spark, sf_dir):
    """Hard-negative mining battery: s12's single-query miner and s13's
    batched (query-table) miner, tagged and unioned — one driver seat
    hash-checks both the single and the batch mining pipeline."""
    a = s12_hard_negatives(spark, sf_dir).select(
        F.lit("single").alias("mode"), "*"
    )
    b = s13_hard_negatives_batch(spark, sf_dir).select(
        F.lit("batch").alias("mode"), "*"
    )
    return a.unionByName(b)
