"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Driver-mandated LLM-pipeline extension (BASELINE.json north_star).  Design
targets 100 TB corpora:

* Exact dedup — hash-groupBy on a content fingerprint.  One shuffle keyed by
  a 128-bit hash: uniformly distributed, skew-free by construction.
* MinHash+LSH near-dedup — shingle → k minhashes → b bands; candidate pairs
  come from an equi-join on (band_id, band_hash), i.e. a shuffle whose key
  cardinality is tunable via b/r.  No O(n²) comparisons; the only cross-pair
  work is verifying candidates inside buckets.
* SimHash — 64-bit weighted-projection signature; near-dups differ in few
  bits.  Banding the 64 bits into chunks gives the same LSH join trick.
* n-gram Jaccard — the exact verifier applied to candidate pairs.

All signature computation is pure Spark SQL expressions (xxhash64 /
higher-order array functions) — JVM-side, codegen, no Python UDF, no
driver-side collect.  Everything composes as DataFrame → DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def normalized_text(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id representative per exact (normalized) content hash.

    Returns the input rows annotated with ``content_hash`` and
    ``is_duplicate``.  Implemented as min-over-window rather than
    groupBy+join: ONE hash-partitioned shuffle on the md5 key (uniform by
    construction, skew-free) instead of three exchanges — at 100 TB the
    difference is the job.
    """
    from pyspark.sql import Window

    with_hash = df.withColumn("content_hash", F.md5(normalized_text(text_col)))
    w = Window.partitionBy("content_hash")
    return with_hash.withColumn(
        "is_duplicate", F.col(id_col) != F.min(id_col).over(w)
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings (distinct set).  Docs shorter than
    n tokens contribute their whole text as one shingle (so short docs
    still sign/band).  Gram construction via the zip_with fold
    (operators/text.adjacent_ngrams — the transform(sequence, slice)
    form is 4-5× slower interpreted)."""
    from .text import adjacent_ngrams

    toks = tokens(text_col)
    return F.array_distinct(
        F.when(F.size(toks) >= n, adjacent_ngrams(toks, n)).otherwise(
            F.array(F.concat_ws(" ", toks))
        )
    )


#: Sentinel for "no shingles" — an empty doc's signature is all-MAX, so empty
#: docs still band together; the Jaccard verify stage drops them (0/0 → null).
_MAX_LONG = (1 << 63) - 1


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """k-permutation MinHash via seeded xxhash64 (64-bit, JVM-side).

    hash_i(s) = xxhash64(i, s); signature[i] = min over shingles.

    Single-pass formulation: fold over the shingle array once, hashing each
    shingle with all k seeds (``zip_with(acc, hashes, least)``).  The naive
    alternative — k separate ``array_min(transform(shingles, hash_i))``
    projections — re-evaluates the whole shingle expression (tokenize →
    n-gram → distinct) k times per row, which measured ~30× slower.
    """
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    init = F.array_repeat(F.lit(_MAX_LONG).cast("long"), num_hashes)
    return F.aggregate(
        shingle_col,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.xxhash64(i, s)),
            lambda a, b: F.least(a, b),
        ),
    )


def minhash_signatures(
    sh_frame: DataFrame,
    num_hashes: int = 32,
    strategy: str = "fold",
) -> DataFrame:
    """(__id, __sig) from a (__id, __sh array<string>) shingle frame.

    Two bit-identical strategies (same trade family as
    ``positioned_gram_hashes``'s gram_strategy):

    * ``fold`` — the map-only ``aggregate``/``zip_with`` fold
      (``minhash_signature``): ZERO exchange, but Spark evaluates HOF
      lambdas interpreted, so per-shingle cost is k interpreter trips.
    * ``explode`` — ``explode_outer`` the shingles and take k codegen'd
      ``min(xxhash64(i, s))`` aggregate columns: every hash runs inside
      whole-stage codegen with map-side partial mins, at the price of ONE
      doc-keyed exchange of partial aggregates (signature-sized rows —
      the same frame the banding stage ships anyway).  Empty/null shingle
      arrays keep the all-MAX sentinel via explode_outer + coalesce.

    Both produce byte-identical signatures (``xxhash64`` stays JVM-side;
    only the min-reduction moves) — asserted by
    tests/test_round5_hardening.py::test_minhash_strategy_parity.
    """
    if strategy == "fold":
        return sh_frame.select(
            "__id", minhash_signature(F.col("__sh"), num_hashes).alias("__sig")
        )
    if strategy != "explode":
        raise ValueError(f"unknown minhash strategy {strategy!r}")
    e = sh_frame.select("__id", F.explode_outer("__sh").alias("__s"))
    aggs = [
        F.coalesce(
            F.min(
                F.when(
                    F.col("__s").isNotNull(), F.xxhash64(F.lit(i), F.col("__s"))
                )
            ),
            F.lit(_MAX_LONG).cast("long"),
        ).alias(f"__h{i}")
        for i in range(num_hashes)
    ]
    return (
        e.groupBy("__id")
        .agg(*aggs)
        .select(
            "__id",
            F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("__sig"),
        )
    )


#: Default per-(band, bucket) population cap.  A bucket of n members yields
#: n·(n−1)/2 pairwise candidates — a dup-heavy corpus (or the all-MAX
#: empty-doc sentinel bucket) would otherwise make one bucket quadratic.
DEFAULT_MAX_BUCKET = 128

#: Hot-path caches (persist() frames inside _candidate_pairs and the ledger
#: verify) awaiting release.  The pairs frame is returned LAZILY, so the
#: producer cannot unpersist before the caller materializes; left alone the
#: MEMORY_AND_DISK blocks accumulate across repeated dedup calls in a
#: long-lived session until executor storage thrashes.  Each TOP-LEVEL
#: dedup entry point (minhash/simhash/embedding pairs, semantic_dedup,
#: ledger near_dups/ingest) releases the previous op's caches on entry —
#: bounding the live set to one operation — and eager materializers
#: (ledger ingest) also release as soon as their result is checkpointed.
#: Inner helpers (_candidate_pairs, _near_dups_signed) only REGISTER —
#: releasing there would clobber a sibling stage's cache mid-operation.
#: Releasing a frame a concurrent job still references is safe — Spark
#: recomputes.
#:
#: CONCURRENCY: the registry is process-global and assumes ONE top-level
#: dedup/ledger operation in flight per driver process at a time.  Two
#: concurrent top-level ops on one session (e.g. two streaming admission
#: sinks on separate schedulers, or a thread pool of dedup calls) would
#: release each other's caches mid-operation — results stay CORRECT
#: (Spark recomputes an unpersisted frame), but the persist() the hot
#: path relies on silently degrades to full recompute.  Run concurrent
#: admission pipelines in separate driver processes, or serialize them.
_HOT_CACHES: list = []


def release_hot_caches() -> None:
    """Unpersist dedup's outstanding hot-path caches (see _HOT_CACHES).

    Process-global, single-operation semantics: see the _HOT_CACHES
    concurrency note — callers running top-level dedup/ledger ops
    concurrently on one driver will release each other's caches
    (correctness preserved, persist() benefit lost)."""
    while _HOT_CACHES:
        df = _HOT_CACHES.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass


def _candidate_pairs(
    banded: DataFrame,
    max_bucket: int | None,
    payload: tuple[str, ...] = (),
) -> DataFrame:
    """(id_a, id_b) candidate pairs from banded buckets, bounded per bucket.

    Buckets with ≤ ``max_bucket`` members do the full pairwise self-join.
    Oversized buckets degrade to LINEAR "star" pairing: every member pairs
    with the bucket's min-id representative only, so a 10k-identical-doc
    cluster emits 10k−1 candidates instead of ~50M — downstream verify still
    flags all its members as duplicates of the representative.  The count
    window shuffles on the same (band, bh) key the self-join needs, so no
    extra exchange is introduced on the big side.

    ``payload`` names columns of ``banded`` carried through to the output as
    ``<name>_a`` / ``<name>_b`` — for small per-doc values (a SimHash
    signature is ONE long) this lets the verify stage read them off the
    candidate rows instead of join-ing back to the signature table twice.
    Payload must be functionally dependent on ``__id`` (the trailing
    distinct assumes it).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    star = None
    if max_bucket is not None:
        w = Window.partitionBy("band", "bh")
        # persist the annotated frame: THREE plan branches consume it (both
        # self-join sides + the star branch) — without the cache each one
        # would recompute the banding AND the upstream signature fold, and
        # re-shuffle the full corpus for its own copy of the window.
        annotated = (
            banded.withColumn("__n", F.count(F.lit(1)).over(w))
            # min over the (__id, *payload) struct = the min-id row, so the
            # star branch sees the representative's payload too
            .withColumn("__rep", F.min(F.struct("__id", *payload)).over(w))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _HOT_CACHES.append(annotated)
        star = (
            annotated.filter(
                (F.col("__n") > max_bucket)
                & (F.col("__id") != F.col("__rep.__id"))
            )
            .select(
                F.col("__rep.__id").alias("id_a"),
                F.col("__id").alias("id_b"),
                *[F.col(f"__rep.{p}").alias(f"{p}_a") for p in payload],
                *[F.col(p).alias(f"{p}_b") for p in payload],
            )
        )
        banded = annotated.filter(F.col("__n") <= max_bucket).select(
            "__id", "band", "bh", *payload
        )
    else:
        # uncapped path: BOTH self-join sides consume the banded frame —
        # persist it so the upstream signature pass runs once, mirroring
        # the capped branch's cache (else the corpus is hashed twice)
        banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
        _HOT_CACHES.append(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
        *[F.col(f"a.{p}").alias(f"{p}_a") for p in payload],
        *[F.col(f"b.{p}").alias(f"{p}_b") for p in payload],
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash-LSH.

    rows/band r = num_hashes/bands; collision threshold ≈ (1/bands)^(1/r).
    The band join is an equi-join on (band, band_signature) — shuffle keys
    are hashes, so co-located and skew-free at any scale; per-bucket work is
    bounded by ``max_bucket`` (see _candidate_pairs).
    """
    release_hot_caches()  # top-level entry: drop the previous op's caches
    sig = minhash_signature(shingles(text_col, shingle_n), num_hashes)
    with_sig = df.select(F.col(id_col).alias("__id"), sig.alias("__sig"))
    return _banded_candidates(with_sig, num_hashes, bands, max_bucket)


def _banded_candidates(
    with_sig: DataFrame,
    num_hashes: int,
    bands: int,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Band a (__id, __sig) frame and self-join for colliding pairs."""
    r = num_hashes // bands
    assert r * bands == num_hashes, "bands must divide num_hashes"
    banded = with_sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(",", *[F.element_at("__sig", b * r + j + 1).cast("string") for j in range(r)]).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    return _candidate_pairs(banded, max_bucket)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.round(inter / F.nullif(union, F.lit(0.0)), 6)


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    sig_strategy: str = "fold",
) -> DataFrame:
    """LSH candidates verified by exact shingle-set Jaccard ≥ threshold.

    Output: (id_a, id_b, jaccard_sim).  The shingle sets are computed ONCE
    and persisted (memory-and-disk, spillable): the candidate pass derives
    signatures from them and the verify pass joins back to the same cached
    frame — without this, Spark re-tokenizes the corpus for each of the
    four plan branches (self-join sides + both verify probes).  At 100 TB
    this intermediate is the standard "signature table" materialization.
    """
    from pyspark import StorageLevel

    from .similarity import _spread

    release_hot_caches()  # top-level entry: drop the previous op's caches
    # spread by cores before the expensive shingle/signature projection —
    # a single-file corpus otherwise tokenizes on one task (no-op when the
    # scan already has enough splits, so nothing shuffles at scale)
    sh = (
        _spread(df)
        .select(
            F.col(id_col).alias("__id"), shingles(text_col, shingle_n).alias("__sh")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _HOT_CACHES.append(sh)
    with_sig = minhash_signatures(sh, num_hashes, sig_strategy)
    cands = _banded_candidates(with_sig, num_hashes, bands, max_bucket)
    return (
        cands.join(sh.withColumnsRenamed({"__id": "id_a", "__sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"__id": "id_b", "__sh": "sh_b"}), "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_to: int = 6,
    blocking: str | None = None,
    n_planes: int = 8,
    bands: int = 4,
    seed: int = 42,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    impl: str = "gemm",
    n_blocks: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold (id_a < id_b).

    * ``blocking=None`` — exact all-pairs baseline, O(n²) comparisons —
      the oracle/verification mode.  ``impl="gemm"`` (default) routes it
      through the ``all_pairs_similarity`` upper-triangle tile grid: one
      float64 gemm per (block_a ≤ block_b) cogroup cell.  The previous
      default (``impl="fold"``, kept selectable and parity-locked —
      tests/test_round6_hardening.py) evaluated an *interpreted*
      ``zip_with``+``aggregate`` lambda per candidate pair — Spark never
      codegens HOF lambdas, so all ~n²/2 dot products were interpreter
      CPU: 11.3 s vs <2 s for the gemm on the same sf0.1 corpus.  Both
      produce identical rounded output (float64 dot, round-then-filter;
      non-finite rows — null vector or any null/NaN/±Inf element — are
      dropped by every impl before pairing).
    * ``blocking="lsh"`` — scale path: ``bands`` independent random-
      hyperplane signatures; only pairs colliding in ≥1 band are compared
      (equi-join on (band, bucket) — hash-keyed shuffle, skew-free).  High
      recall at high thresholds (near-identical vectors agree on most sign
      bits), cost ~ bucket sizes instead of n².
    """
    release_hot_caches()  # top-level entry: drop the previous op's caches
    from .similarity import _hyperplanes, _spread, dot, lsh_bucket, norm

    if blocking is None and impl == "gemm":
        id_t = dict(df.dtypes)[id_col]
        if id_t not in ("tinyint", "smallint", "int", "bigint"):
            impl = "fold"  # gemm kernel needs integral ids; fold takes any
        else:
            try:
                import numpy  # noqa: F401
                import pyarrow  # noqa: F401
            except ImportError:
                impl = "fold"  # pure-JVM cluster
    if blocking is None and impl == "gemm":
        from .similarity import all_pairs_similarity

        out = all_pairs_similarity(
            df, id_col, vec_col, threshold, round_to, n_blocks
        )
        # fold path preserves the caller's id type; match it
        return out.select(
            F.col("id_a").cast(id_t).alias("id_a"),
            F.col("id_b").cast(id_t).alias("id_b"),
            "cosine_sim",
        )

    # Non-finite rows (null vector, any null/NaN/±Inf element) can never
    # be near-duplicates — and WITHOUT this filter a NaN element would
    # pass the threshold filter (a NaN dot product makes round(sim) NaN,
    # and Spark's NaN-is-largest ordering makes NaN >= threshold TRUE),
    # emitting every pair involving the bad vector.  The gemm path masks
    # non-finite rows inside the tile kernel (np.isfinite); this keeps
    # the fold and lsh paths output-identical to it.
    df = df.filter(
        F.col(vec_col).isNotNull()
        & ~F.exists(
            F.col(vec_col),
            lambda x: x.isNull()
            | F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == F.lit(float("inf"))),
        )
    )
    # norms and float→double casts are per-ROW, so hoist both out of the
    # pair join — the per-pair work is then a single multiply-add fold.
    # Numerically identical to cosine(a, b): float→double is exact and the
    # fold order is unchanged.
    as_double = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    a = df.select(
        F.col(id_col).alias("id_a"),
        as_double.alias("__va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        as_double.alias("__vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    if blocking is None:
        # file-split partitioning reflects BYTES, not compute: a small
        # single-file corpus would run the whole O(n²) pass on one task.
        # Spread the streamed side across the cluster before the pair join
        # (no-op when the scan already has enough splits).
        cand = (
            _spread(b)
            .crossJoin(F.broadcast(a))
            .filter(F.col("id_a") < F.col("id_b"))
        )
    elif blocking == "lsh":
        # band ONCE on (id, bucket), bound per-bucket pairing, then join the
        # per-row payloads (double vectors + norms) back onto the candidate
        # pairs — the corpus is never amplified by the band fan-out.
        parts = []
        for bi in range(bands):
            planes = _hyperplanes(64, n_planes, seed + 1000 * bi)
            parts.append(
                F.struct(
                    F.lit(bi).alias("band"),
                    lsh_bucket(F.col(vec_col), planes).alias("bh"),
                )
            )
        banded = df.select(
            F.col(id_col).alias("__id"), F.explode(F.array(*parts)).alias("__bb")
        ).select("__id", F.col("__bb.band").alias("band"), F.col("__bb.bh").alias("bh"))
        cand = (
            _candidate_pairs(banded, max_bucket)
            .join(a, "id_a")
            .join(b, "id_b")
            .select("id_a", "__va", "__na", "id_b", "__vb", "__nb")
        )
    else:
        raise ValueError(f"unknown blocking mode {blocking!r}")
    sim = dot(F.col("__va"), F.col("__vb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    return (
        cand.withColumn("cosine_sim", F.round(sim, round_to))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text_col: str, impl: str = "arrow") -> Column:
    """64-bit SimHash over whitespace tokens (xxhash64 token hashes).

    bit_j(doc) = sign( Σ_tokens (token_hash has bit j ? +1 : -1) ).

    ``impl="arrow"`` (default): the token HASHES stay JVM-side
    (``xxhash64`` — numpy cannot reproduce it bit-exactly), and only the
    64-bit sign-sum moves to an Arrow-batched numpy kernel: per batch,
    one flat uint64 hash array + 64 vectorized bit-extract/segment-sum
    passes (``np.add.reduceat`` over doc offsets).  That arithmetic is
    exact integer popcount math on already-computed hashes, so the
    signature is bit-identical to the fold — only the execution engine
    differs.  The JVM fold evaluates its lambdas interpreted (Spark
    codegens no higher-order function): 64 zip_with/transform closures
    PER TOKEN made it the slowest headline op; the kernel replaces
    ~64·tokens interpreted closures per doc with dense numpy.  Map-only
    either way — no exchange, no collect.

    ``impl="fold"``: the original pure-JVM HOF fold (kept selectable for
    pure-JVM clusters; auto-fallback when pyarrow is unavailable).  The
    Python ``F.shiftright`` builder only takes literal shift amounts, so
    the variable-shift inner loop is expressed in SQL, where shift
    amounts are full expressions.
    """
    if impl == "arrow":
        try:
            import numpy as np
            import pandas as pd
            import pyarrow  # noqa: F401 - probe only
        except ImportError:
            impl = "fold"
    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import LongType

        def _sig_fn(col):
            vals = col.tolist()
            lens = np.array(
                [0 if v is None else len(v) for v in vals], dtype=np.int64
            )
            nz = lens > 0
            out = np.zeros(len(vals), dtype=np.int64)
            if nz.any():
                flat = np.concatenate(
                    [np.asarray(v, dtype=np.int64) for v in vals if v is not None and len(v)]
                ).view(np.uint64)
                seg_lens = lens[nz]
                starts = np.zeros(len(seg_lens), dtype=np.int64)
                np.cumsum(seg_lens[:-1], out=starts[1:])
                sig = np.zeros(len(seg_lens), dtype=np.uint64)
                one = np.uint64(1)
                for j in range(64):
                    ones = np.add.reduceat((flat >> np.uint64(j)) & one, starts)
                    # sign(Σ ±1) > 0  <=>  2·(count of set bits) > n_tokens
                    bit = (2 * ones.astype(np.int64)) > seg_lens
                    sig |= bit.astype(np.uint64) << np.uint64(j)
                out[nz] = sig.view(np.int64)
            ser = pd.Series(out, dtype="Int64")
            null_rows = pd.Series([v is None for v in vals])
            return ser.where(~null_rows)

        _sig = pandas_udf(_sig_fn, LongType())
        hashes = F.expr(
            rf"transform(split(trim(`{text_col}`), '\\s+'), t -> xxhash64(t))"
        )
        return _sig(hashes)
    if impl != "fold":
        raise ValueError(f"unknown simhash64 impl {impl!r}")
    toks = rf"split(trim(`{text_col}`), '\\s+')"
    bit_sums = (
        f"aggregate(transform({toks}, t -> xxhash64(t)),"
        " array_repeat(cast(0 as bigint), 64),"
        " (acc, h) -> zip_with(acc,"
        "   transform(sequence(0, 63),"
        "     j -> if(((h >> j) & 1) = 1, cast(1 as bigint), cast(-1 as bigint))),"
        "   (a, b) -> a + b))"
    )
    return F.expr(
        f"aggregate(zip_with({bit_sums}, sequence(0, 63),"
        " (s, j) -> if(s > 0, shiftleft(cast(1 as bigint), j), cast(0 as bigint))),"
        " cast(0 as bigint), (acc, x) -> acc | x)"
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of xor)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("long")


def hamming_neardup_pairs(
    sig: DataFrame,
    id_col: str = "__id",
    sig_col: str = "__sim",
    max_hamming: int = 3,
    bands: int = 8,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs from PRECOMPUTED 64-bit signatures by banding +
    Hamming verification — the signature-agnostic core shared by text
    SimHash and image dHash (any 64-bit locality-preserving fingerprint).

    Splitting 64 bits into `bands` chunks guarantees recall for pairs with
    < bands differing bits (pigeonhole): any such pair collides on ≥1 chunk.
    Per-bucket pairing is bounded by ``max_bucket`` (see _candidate_pairs).
    The 8-byte signature rides the banding explode as a payload column, so
    the verify reads sim_a/sim_b off the candidate rows — no join back to a
    signature table, ONE (band, bh) exchange total.
    """
    release_hot_caches()  # top-level entry: drop the previous op's caches
    chunk = 64 // bands
    # null signatures (e.g. undecodable images) can never verify — drop
    # them before the explode instead of shipping null-keyed buckets
    sig = sig.select(
        F.col(id_col).alias("__id"), F.col(sig_col).alias("__sim")
    ).filter(F.col("__sim").isNotNull())
    banded = sig.select(
        "__id",
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("__sim"), b * chunk)
                        .bitwiseAND(F.lit((1 << chunk) - 1))
                        .alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "__id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"), "__sim"
    )
    return (
        _candidate_pairs(banded, max_bucket, payload=("__sim",))
        .withColumn("hamming", hamming64(F.col("__sim_a"), F.col("__sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 8,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    sig_impl: str = "arrow",
) -> DataFrame:
    """Near-dup pairs by SimHash banding + Hamming verification: one
    signature pass over the corpus, then ``hamming_neardup_pairs``.
    (MinHash keeps its join-back instead: its signature is 32 longs and
    its verify needs the SHINGLE sets.)
    """
    from .similarity import _spread

    sig = _spread(df).select(
        F.col(id_col).alias("__id"),
        simhash64(text_col, impl=sig_impl).alias("__sim"),
    )
    return hamming_neardup_pairs(
        sig, max_hamming=max_hamming, bands=bands, max_bucket=max_bucket
    )


# ---------------------------------------------------------------------------
# benchmark contamination + incremental (batch-vs-corpus) dedup
# ---------------------------------------------------------------------------


def ngram_strings(text_col: Column | str, n: int = 8) -> Column:
    """All (overlapping) word n-grams as space-joined strings; empty array
    below n tokens — the contamination-check unit (n-gram overlap against
    an eval set is the standard decontamination rule for training corpora).
    Uses the zip_with fold (operators/text.adjacent_ngrams) — ~2× faster
    than transform(sequence, slice) at n=8."""
    from .text import adjacent_ngrams

    return adjacent_ngrams(tokens(text_col), n)


def contaminated_ids(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Training docs sharing ANY word n-gram with a benchmark/eval doc.

    Scale shape: explode each side to distinct n-gram hashes, then a
    LEFT SEMI join on the hash — benchmark side is small (eval sets are),
    so Catalyst broadcasts it; the train side is a map-only explode with
    no pre-shuffle.  Returns distinct contaminated ``id_col`` rows.
    """
    t = train.select(
        F.col(id_col), F.explode(F.array_distinct(ngram_strings(text_col, n))).alias("g")
    )
    b = benchmark.select(
        F.explode(F.array_distinct(ngram_strings(text_col, n))).alias("g")
    ).distinct()
    return t.join(b, "g", "left_semi").select(id_col).distinct()


def _bloom_bits(
    h1: "object", h2: "object", n_items: int, bits_per_item: int
) -> tuple["object", int, int]:
    """Packed Bloom bit array from (h1, h2) 64-bit hash pairs.

    Double hashing (Kirsch–Mitzenmacher): probe_i = h1 + i·h2 (mod m)
    simulates k independent hashes from two.  k = round(ln2 · m/n), the
    textbook false-positive-optimal count for the chosen bits/item."""
    import numpy as np

    m = max(64, n_items * bits_per_item)
    k = max(1, int(round(0.6931 * bits_per_item)))
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    a = np.asarray(h1, dtype=np.int64).view(np.uint64)
    b = np.asarray(h2, dtype=np.int64).view(np.uint64)
    for i in range(k):
        idx = (a + np.uint64(i) * b) % np.uint64(m)
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return bits, m, k


class BloomGramFilter:
    """Broadcast Bloom over a benchmark's word n-gram hashes, built ONCE
    and reusable across queries/micro-batches (the streaming contamination
    gate rebuilds NOTHING per batch — the benchmark side is static).

    A 16-bits/gram Bloom (~0.04% FP rate) packs 10⁸ benchmark grams into
    ~200 MB of executor memory where a broadcast string set would need
    many GB (≥50 B/gram + hash-set overhead) — past Spark's broadcast
    ceiling.  The corpus side stays map-only: JVM-computed (xxhash64,
    xxhash64-salted) gram hash pairs feed a vectorized Arrow membership
    kernel.  Driver collect is the benchmark HASH PAIRS only (16 B/gram,
    eval-set bounded) — the same control-plane class as broadcast
    centroids.
    """

    def __init__(
        self,
        benchmark: DataFrame,
        text_col: str = "text",
        n: int = 8,
        bits_per_gram: int = 16,
    ) -> None:
        self.n = n
        self.bits_per_gram = bits_per_gram
        self.grams = benchmark.select(
            F.explode(F.array_distinct(ngram_strings(text_col, n))).alias("g")
        ).distinct()
        pairs = self.grams.select(
            F.xxhash64("g").alias("h1"),
            F.xxhash64(F.lit("bloom2"), F.col("g")).alias("h2"),
        ).toPandas()
        bits, self.m, self.k = _bloom_bits(
            pairs["h1"].to_numpy(), pairs["h2"].to_numpy(), max(1, len(pairs)),
            bits_per_gram,
        )
        # benchmark-snapshot signature: order-independent XOR of the gram
        # hashes + the gram count — recomputable from any candidate
        # benchmark with one Spark aggregate (no collect, no bit-pack), so
        # a persisted artifact can be staleness-checked cheaply (save/load)
        import numpy as np

        self.n_grams = int(len(pairs))
        self.sig = (
            int(np.bitwise_xor.reduce(pairs["h1"].to_numpy()))
            if len(pairs)
            else 0
        )
        sc = benchmark.sparkSession.sparkContext
        self._bc = sc.broadcast(bytes(bits.tobytes()))

    def save(self, path: str) -> None:
        """Persist the build-once artifact: bit array + meta (incl. the
        benchmark-snapshot signature) + the distinct benchmark grams (the
        exact-verify side ``contaminated_ids`` joins against).  A
        restarted stream then ``load``s in O(bits) instead of re-paying
        the benchmark gram build (tokenize + slice + distinct + pack)."""
        import os

        from .dirswap import atomic_json_write, atomic_write, fs_mkdirs

        fs_mkdirs(path)
        self.grams.write.mode("overwrite").parquet(
            os.path.join(path, "grams")
        )
        atomic_write(os.path.join(path, "bits.bin"), self._bc.value)
        atomic_json_write(
            os.path.join(path, "_BLOOM_META.json"),
            {
                "n": self.n,
                "bits_per_gram": self.bits_per_gram,
                "m": self.m,
                "k": self.k,
                "n_grams": self.n_grams,
                "sig": self.sig,
            },
        )

    @classmethod
    def load(cls, spark, path: str) -> "BloomGramFilter":
        """Open a persisted filter: re-broadcast the stored bits, point
        ``grams`` at the stored parquet — no benchmark scan, no gram
        build.  The caller owns staleness (see ``ensure_bloom``)."""
        import json
        import os

        from .dirswap import fs_read_bytes

        obj = cls.__new__(cls)
        meta = json.loads(
            fs_read_bytes(os.path.join(path, "_BLOOM_META.json"), spark)
        )
        obj.n = int(meta["n"])
        obj.bits_per_gram = int(meta.get("bits_per_gram", 0))
        obj.m = int(meta["m"])
        obj.k = int(meta["k"])
        obj.n_grams = int(meta["n_grams"])
        obj.sig = int(meta["sig"])
        bits = fs_read_bytes(os.path.join(path, "bits.bin"), spark)
        obj._bc = spark.sparkContext.broadcast(bits)
        obj.grams = spark.read.schema("g string").parquet(
            os.path.join(path, "grams")
        )
        return obj

    def benchmark_sig(self, benchmark: DataFrame, text_col: str = "text") -> tuple[int, int]:
        """(xor-of-gram-hashes, gram count) of a candidate benchmark —
        ONE Spark aggregate over its distinct grams; compare against
        (self.sig, self.n_grams) to detect a stale artifact."""
        row = (
            benchmark.select(
                F.explode(
                    F.array_distinct(ngram_strings(text_col, self.n))
                ).alias("g")
            )
            .distinct()
            .agg(
                F.expr("bit_xor(xxhash64(g))").alias("x"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()[0]
        )
        return (int(row.x) if row.x is not None else 0, int(row.c))

    def _kernel(self):
        """(uint64 a, uint64 b) ndarray pair -> bool hit ndarray, closed
        over the broadcast bits (NOT self — keep the filter object out of
        the serialized UDF closure)."""
        bc, m, k = self._bc, self.m, self.k

        def probe(a, b):
            import numpy as np

            arr = np.frombuffer(bc.value, dtype=np.uint8)
            hit = np.ones(len(a), dtype=bool)
            for i in range(k):
                idx = (a + np.uint64(i) * b) % np.uint64(m)
                byte = arr[(idx >> np.uint64(3)).astype(np.int64)]
                hit &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
            return hit

        return probe

    def might_contain(self) -> "Column":
        """Scalar pandas UDF (h1, h2) -> maybe-member, for exploded grams."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BooleanType

        probe = self._kernel()

        def _fn(h1, h2):
            import numpy as np

            a = h1.to_numpy(dtype=np.int64).view(np.uint64)
            b = h2.to_numpy(dtype=np.int64).view(np.uint64)
            return pd.Series(probe(a, b))

        return pandas_udf(_fn, BooleanType())

    def any_gram_maybe(
        self, text_col: "Column | str", *, grams: bool = False
    ) -> "Column":
        """Per-DOCUMENT maybe-contaminated boolean — no explode, no join,
        no row-count change: the append-mode-safe streaming shape.  Gram
        hash pairs ride as arrays (one transform-lambda xxhash64 per gram,
        the same per-gram hash work the batch explode pays) into ONE
        Arrow kernel call that flattens the batch and OR-reduces per doc.

        ``grams=True`` marks ``text_col`` as a PRECOMPUTED distinct-gram
        array column: both hash transforms then reference one materialized
        attribute instead of each re-evaluating the gram construction
        (tokenize + slice + concat per gram — the expensive part) —
        callers filtering a wide stream should materialize the grams once
        (see ``streaming.ingest.contamination_gate``).
        """
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BooleanType

        probe = self._kernel()

        def _fn(h1s, h2s):
            import numpy as np

            lens = np.fromiter(
                (0 if x is None else len(x) for x in h1s), dtype=np.int64,
                count=len(h1s),
            )
            out = np.zeros(len(h1s), dtype=bool)
            if lens.sum():
                a = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in h1s if x is not None and len(x)]
                ).view(np.uint64)
                b = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in h2s if x is not None and len(x)]
                ).view(np.uint64)
                hit = probe(a, b)
                nz = lens > 0
                starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
                out[nz] = np.logical_or.reduceat(hit, starts)
            return pd.Series(out)

        if grams:
            garr = F.col(text_col) if isinstance(text_col, str) else text_col
        else:
            garr = F.array_distinct(ngram_strings(text_col, self.n))
        return pandas_udf(_fn, BooleanType())(
            F.transform(garr, lambda g: F.xxhash64(g)),
            F.transform(garr, lambda g: F.xxhash64(F.lit("bloom2"), g)),
        )

    def contaminated_ids(
        self,
        train: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        verify: bool = True,
    ) -> DataFrame:
        """Training docs sharing ANY n-gram with the benchmark — see
        ``bloom_contaminated_ids`` for semantics and the verify contract."""
        t = train.select(
            F.col(id_col),
            F.explode(F.array_distinct(ngram_strings(text_col, self.n))).alias("g"),
        ).withColumn(
            "__maybe",
            self.might_contain()(
                F.xxhash64("g"), F.xxhash64(F.lit("bloom2"), F.col("g"))
            ),
        )
        maybe = t.filter(F.col("__maybe")).drop("__maybe")
        if not verify:
            return maybe.select(id_col).distinct()
        return maybe.join(self.grams, "g", "left_semi").select(id_col).distinct()


def ensure_bloom(
    spark,
    path: str,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    bits_per_gram: int = 16,
) -> BloomGramFilter:
    """Load the persisted decontamination Bloom at ``path`` if it exists
    AND still matches ``benchmark`` (the snapshot signature: one Spark
    aggregate over the candidate's distinct grams, no collect/bit-pack);
    otherwise build from ``benchmark`` and save.  The restart contract
    ``admission_sink(bloom_path=...)`` rides: a resumed stream re-pays one
    signature aggregate, never the gram build — and a CHANGED benchmark
    is detected rather than silently served stale."""
    import os

    from .dirswap import fs_exists

    if fs_exists(os.path.join(path, "_BLOOM_META.json"), spark):
        bloom = BloomGramFilter.load(spark, path)
        # EVERY build parameter must match, not just the benchmark: a
        # changed bits_per_gram (FP-rate retune) must rebuild, never
        # silently serve the old rate
        if bloom.n == n and bloom.bits_per_gram == bits_per_gram:
            sig, cnt = bloom.benchmark_sig(benchmark, text_col)
            if (sig, cnt) == (bloom.sig, bloom.n_grams):
                return bloom
    bloom = BloomGramFilter(
        benchmark, text_col=text_col, n=n, bits_per_gram=bits_per_gram
    )
    bloom.save(path)
    return bloom


def bloom_contaminated_ids(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bits_per_gram: int = 16,
    verify: bool = True,
) -> DataFrame:
    """``contaminated_ids`` behind a broadcast BLOOM prefilter — the 100 TB
    decontamination shape when the benchmark gram set is too large to
    broadcast as strings (see ``BloomGramFilter`` for the memory math).

    The corpus side is a map-only explode feeding the vectorized Arrow
    membership kernel; only the ~FP-rate fraction of grams that MIGHT
    match reaches the exact string semi-join, so the verify join's probe
    side shrinks from every-gram-in-the-corpus to (true hits + m-tunable
    noise).

    ``verify=True`` (default) re-checks maybe-hits against the benchmark
    gram strings — output EXACTLY equals ``contaminated_ids`` (the Bloom
    is one-sided: no false negatives by construction).  ``verify=False``
    returns the unverified superset: zero joins on the corpus side at
    all, the one-pass mode for a first 100 TB sweep.
    """
    return BloomGramFilter(benchmark, text_col, n, bits_per_gram).contaminated_ids(
        train, text_col=text_col, id_col=id_col, verify=verify
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_hashes: DataFrame | None = None,
) -> DataFrame:
    """New-batch ingestion dedup: drop batch docs whose exact (normalized)
    content already exists in the corpus, then dedup within the batch.

    The anti-join keys on the md5 content hash — ONE shuffle on a uniform
    key (or a broadcast when the batch's hash set is small).  Pass
    ``corpus_hashes`` (a one-column ``content_hash`` frame, e.g. from
    ``operators.ledger.ContentHashLedger``) to skip re-hashing the corpus
    entirely — the daily-ingest pattern for a growing 100 TB corpus: cost
    scales with the batch, never the corpus text.  ``corpus`` (raw
    documents, hashed here) remains for one-shot reconciliation runs.
    """
    if (corpus is None) == (corpus_hashes is None):
        raise ValueError("pass exactly one of corpus / corpus_hashes")
    bh = batch.withColumn("content_hash", F.md5(normalized_text(text_col)))
    if corpus_hashes is not None:
        ch = corpus_hashes.select("content_hash").distinct()
    else:
        ch = corpus.select(
            F.md5(normalized_text(text_col)).alias("content_hash")
        ).distinct()
    fresh = bh.join(ch, "content_hash", "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash")
    return (
        fresh.withColumn("keep_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("keep_id"))
        .drop("keep_id")
    )


def positioned_gram_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    strategy: str = "window",
) -> DataFrame:
    """``(__id, __start, __gh)`` rows: the md5 digest of every overlapping
    word ``n``-gram with its start position — the shared front end of the
    ExactSubstr operators (d11 pair finding, d14 span removal).

    Two constructions with an explicit CPU-vs-shuffle trade:

    * ``"window"`` (default): posexplode the token stream and build each
      gram from ``n−1`` ``lead()`` columns over a doc-keyed window.
      Whole-stage-codegen'd end to end — measured 3× cheaper CPU than the
      fold at n=20 (Spark evaluates higher-order-function lambdas
      interpreted, never codegen) — at the price of ONE token-stream
      exchange (comparable bytes to the gram exchange every consumer pays
      next, since tokens ship ~8 B vs 32 B gram digests).
    * ``"fold"``: the map-only ``adjacent_ngrams`` zip_with fold — ZERO
      exchanges.  Use where the corpus side must not shuffle at all
      (d07-style contamination gates) or when CPU is abundant relative to
      the interconnect.
    """
    from pyspark.sql import Window

    from .text import adjacent_ngrams

    if strategy == "fold":
        return df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(
                F.transform(adjacent_ngrams(tokens(text_col), n), F.md5)
            ).alias("__start", "__gh"),
        )
    if strategy != "window":
        raise ValueError(f"unknown gram strategy {strategy!r}")
    tok = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(text_col)).alias("__start", "__t"),
    )
    w = Window.partitionBy("__id").orderBy("__start")
    parts = [F.col("__t")] + [F.lead("__t", k).over(w) for k in range(1, n)]
    # the gram MUST be built in the same projection as the tail guard:
    # a lead() evaluated after the filter would see the filtered row set
    # and silently truncate every gram near the kept/dropped boundary
    return (
        tok.select(
            "__id",
            "__start",
            F.concat_ws(" ", *parts).alias("__g"),
            F.lead("__t", n - 1).over(w).alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .select("__id", "__start", F.md5("__g").alias("__gh"))
    )


def substring_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 20,
    gram_strategy: str = "window",
) -> DataFrame:
    """Exact-substring duplicate pairs: documents sharing any verbatim
    run of ``n`` tokens (the ExactSubstr criterion of Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — public
    paper — re-expressed relationally: a shared length-n token window IS
    a shared n-gram, no suffix array needed).

    Star-formed per gram: each gram links its members to the gram's
    minimum doc id, so a boilerplate gram shared by 10k documents emits
    9 999 edges, never the C(n,2) clique — mass duplication stays linear
    by construction (no bucket cap needed).  Gram fronts come from
    ``positioned_gram_hashes`` (codegen'd window build by default, the
    map-only fold via ``gram_strategy="fold"``); per-doc gram dedup rides
    the SAME doc-keyed exchange as the window build (an ordered lag
    compare — no extra shuffle), then ONE gram-keyed exchange
    (min-over-window) and one pair-keyed count.  Grams shuffle as md5
    digests, not n-token strings: 32 bytes per gram instead of ~6n, and
    128 bits keeps the collision probability negligible at 100 TB gram
    counts.  ``n_shared_grams`` counts the grams for which ``id_a`` is
    the global representative (a diagnostic weight, not symmetric gram
    overlap).  Feed the pairs to ``graph.duplicate_clusters``.
    """
    from pyspark.sql import Window

    g = positioned_gram_hashes(df, text_col, id_col, n, gram_strategy)
    if gram_strategy == "window":
        # per-doc distinct without a new exchange: re-sort the existing
        # doc partitioning by gram hash and drop adjacent repeats
        wd = Window.partitionBy("__id").orderBy("__gh")
        grams = (
            g.withColumn("__prev", F.lag("__gh").over(wd))
            .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("__gh")))
            .select(F.col("__id").alias("doc_id"), F.col("__gh").alias("gh"))
        )
    else:
        grams = (
            g.groupBy("__id")
            .agg(F.collect_set("__gh").alias("__gs"))
            .select(F.col("__id").alias("doc_id"), F.explode("__gs").alias("gh"))
        )
    w = Window.partitionBy("gh")
    return (
        grams.withColumn("id_a", F.min("doc_id").over(w))
        .filter(F.col("doc_id") > F.col("id_a"))
        .groupBy("id_a", F.col("doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def pair_metrics(
    candidates: DataFrame, truth: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> dict:
    """Precision/recall/F1 of a candidate pair set against ground truth —
    the tuning loop for LSH bands/thresholds (run on a labeled sample,
    not the corpus).  Pairs are order-normalized before comparison; the
    counts come from two small joins (sample-sized inputs)."""
    def norm(df: DataFrame) -> DataFrame:
        lo = F.least(F.col(id_a), F.col(id_b)).alias("a")
        hi = F.greatest(F.col(id_a), F.col(id_b)).alias("b")
        return df.select(lo, hi).distinct()

    c, t = norm(candidates), norm(truth)
    n_c, n_t = c.count(), t.count()
    n_hit = c.join(t, ["a", "b"]).count()
    precision = n_hit / n_c if n_c else 0.0
    recall = n_hit / n_t if n_t else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "n_candidates": n_c,
        "n_truth": n_t,
        "n_hit": n_hit,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


def semantic_dedup(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    round_to: int = 6,
    max_cluster: int | None = None,
    impl: str = "gemm",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-then-prune
    semantic deduplication over an embedding column.

    1. Assign every vector to its nearest centroid — the same map-only
       argmin fold over a literal centroid array as ``similarity.ivf_topk``
       (zero row amplification, no shuffle).
    2. Within each cluster, compare pairs by cosine; a vector is pruned when
       some LOWER-id member of its cluster is ≥ ``threshold`` similar — the
       deterministic stand-in for the paper's keep-one-per-ε-ball rule.
    3. Survivors are returned as (id, centroid_id).

    Scale shape: the pairwise stage is keyed on centroid id, so the shuffle
    is one equi-join exchange; per-cluster cost is quadratic in cluster
    size, which SemDeDup controls by raising k (cluster count scales with
    corpus, cluster SIZE stays roughly constant).  For skewed/degenerate
    clusterings, ``max_cluster`` bounds any one cluster's work by degrading
    it to linear star pairing against the min-id representative — the same
    guardrail as the LSH bucket cap (``_candidate_pairs``).

    Prune math is float64 with ``round_to`` rounding, engine-portable
    (workload d12).  ``impl="gemm"`` (default) runs the within-cluster
    pair stage as ONE float64 gemm per cluster via a grouped-map kernel —
    the ``all_pairs_similarity`` pattern; the per-pair interpreted
    ``aggregate``/``zip_with`` fold it replaces (kept selectable and
    parity-locked as ``impl="fold"``, and still used by the
    ``max_cluster`` star-cap path) paid interpreter CPU per
    pair×dimension (r12: most of d12's runtime).
    """
    release_hot_caches()  # top-level entry: drop the previous op's caches
    from pyspark import StorageLevel

    from .similarity import (
        _HAS_ARROW,
        _semantic_prune_kernel,
        assign_centroids,
        dot,
        norm,
    )

    if impl not in ("gemm", "fold"):
        raise ValueError(f"unknown semantic_dedup impl {impl!r}")
    as_double = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if impl == "gemm" and max_cluster is None and _HAS_ARROW:
        # TWO plan branches consume base (the per-cluster kernel input and
        # the survivor anti-join) — cache so the argmin assignment runs
        # once.  Norms live inside the kernel; no per-row norm fold.
        base = (
            assign_centroids(df, vec_col, centroids, round_to, out_col="__cid")
            .select(
                F.col(id_col).alias("__id"), "__cid", as_double.alias("__v")
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _HOT_CACHES.append(base)
        pruned = base.groupBy("__cid").applyInPandas(
            _semantic_prune_kernel(threshold, round_to), "__id long"
        )
        return base.join(pruned, "__id", "left_anti").select(
            F.col("__id").alias(id_col), F.col("__cid").alias("centroid_id")
        )
    # assign_centroids picks the plan-literal fold for small quantizers and
    # a broadcast-joined fold above CENT_LITERAL_MAX_ELEMS — production
    # nlist ≈ √n would otherwise blow up the plan tree
    base = (
        assign_centroids(df, vec_col, centroids, round_to, out_col="__cid")
        .select(
            F.col(id_col).alias("__id"),
            "__cid",
            as_double.alias("__v"),
            norm(F.col(vec_col)).alias("__n"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _HOT_CACHES.append(base)
    # FOUR plan branches consume base (bucket frame, both pair-join payload
    # sides, the survivor anti-join) — without the cache each one would
    # recompute the argmin centroid fold over the whole corpus.
    banded = base.select("__id", F.lit(0).alias("band"), F.col("__cid").alias("bh"))
    cand = _candidate_pairs(banded, max_cluster)
    a = base.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na")
    )
    b = base.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb")
    )
    sim = dot(F.col("__va"), F.col("__vb")) / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    pruned = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.round(sim, round_to) >= threshold)
        .select(F.col("id_b").alias("__id"))
        .distinct()
    )
    return base.join(pruned, "__id", "left_anti").select(
        F.col("__id").alias(id_col), F.col("__cid").alias("centroid_id")
    )


def remove_duplicate_spans(
    df: DataFrame, text_col: str, id_col: str, n: int = 20,
    gram_strategy: str = "window",
) -> DataFrame:
    """ExactSubstr *removal* (Lee et al. 2021 §4.1): where
    ``substring_dup_pairs`` reports which documents share a verbatim
    length-``n`` token run, this removes the run itself — every token
    covered by a shared n-gram is deleted from all but the gram's
    minimum-id document, so exactly ONE verbatim copy survives
    corpus-wide and the rest of each document is untouched.

    Returns ``(id_col, text_clean, n_tokens_kept, n_tokens_removed)``.

    Shape: gram explode with start positions (L−n+1 rows/doc), ONE
    gram-keyed exchange for the canonical owner (min-over-window on the
    md5 gram digest — 32-byte shuffle keys), covered-position explode
    (deduplicated) FOLDED to one positions-array row per affected doc.
    Reassembly then never shuffles the token stream: the kept positions
    are ``array_except(sequence, covered)`` — a JVM hash-set difference
    that preserves the sequence order — applied map-side after an
    id-keyed join whose right side has ≤ one row per AFFECTED doc.
    (The previous form exploded every token and paid a (id, pos)-keyed
    join plus an array_sort(collect_list(struct)) re-aggregate over the
    full token stream — W× more join rows and the single heaviest
    exchange in the operator, W = tokens/doc.)
    """
    from pyspark.sql import Window

    grams = positioned_gram_hashes(df, text_col, id_col, n, gram_strategy)
    w = Window.partitionBy("__gh")
    # collect_set dedups covered positions INSIDE the per-doc aggregate —
    # the distinct().groupBy().collect_list() form paid a second exchange
    # (by (id, pos), then again by id) for the same set (r12, guide §2.4);
    # downstream only needs set membership (array_except) and set size
    covered = (
        grams.withColumn("__rep", F.min("__id").over(w))
        .filter(F.col("__id") > F.col("__rep"))
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__start"), F.col("__start") + (n - 1))
            ).alias("__pos"),
        )
        .groupBy("__id")
        .agg(F.collect_set("__pos").alias("__cov"))
    )
    base = df.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__toks"))
    joined = base.join(covered, "__id", "left")
    size_t = F.size("__toks")
    cov = F.coalesce(F.col("__cov"), F.expr("array()").cast("array<int>"))
    # null/empty text → empty position list (size_t is null or 0), so
    # n_tokens_kept reports 0 consistently with the "" text_clean — the
    # greatest(size,1)-1 form used to hand a null-text doc kept_pos=[0]
    kept_pos = F.when(
        size_t > 0,
        F.array_except(F.sequence(F.lit(0), size_t - 1), cov),
    ).otherwise(F.expr("array()").cast("array<int>"))
    kept_toks = F.transform(kept_pos, lambda i: F.element_at("__toks", i + 1))
    return joined.select(
        F.col("__id").alias(id_col),
        F.coalesce(F.concat_ws(" ", kept_toks), F.lit("")).alias("text_clean"),
        F.coalesce(F.size(kept_pos), F.lit(0)).cast("long").alias("n_tokens_kept"),
        F.coalesce(F.size(cov), F.lit(0)).cast("long").alias("n_tokens_removed"),
    )


def edit_verify(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    max_ratio: float = 0.2,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Verify candidate near-dup pairs by NORMALIZED EDIT DISTANCE:
    keep pairs with ``levenshtein(a, b) / max(len(a), len(b)) <= max_ratio``.

    The character-level complement to the token-set Jaccard verifier
    (``ngram_jaccard_pairs`` semantics): Jaccard is blind to token ORDER
    and to heavy in-token edits; edit distance catches both, at
    O(len_a·len_b) per pair — which is exactly why it belongs HERE, after
    banding has cut candidates to near-linear, never on the full corpus.

    Shape: two hash joins to attach both texts to the (already small)
    candidate frame, then a pure-JVM ``levenshtein`` filter — the corpus
    is never self-joined.

    Returns (id_a, id_b, edit_dist, edit_ratio) for surviving pairs.
    """
    t = docs.select(F.col(id_col), F.col(text_col))
    a = t.select(F.col(id_col).alias(id_a), F.col(text_col).alias("__ta"))
    b = t.select(F.col(id_col).alias(id_b), F.col(text_col).alias("__tb"))
    joined = pairs.join(a, id_a).join(b, id_b)
    dist = F.levenshtein("__ta", "__tb")
    longest = F.greatest(F.length("__ta"), F.length("__tb"))
    ratio = dist / F.nullif(longest.cast("double"), F.lit(0.0))
    return (
        joined.withColumn("edit_dist", dist.cast("long"))
        .withColumn("edit_ratio", F.round(F.coalesce(ratio, F.lit(0.0)), 6))
        .filter(F.coalesce(ratio, F.lit(0.0)) <= max_ratio)
        .select(id_a, id_b, "edit_dist", "edit_ratio")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Content-level diff of two corpus snapshots: per document id, is it
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, text
    hash differs) or ``unchanged``.

    The corpus-iteration primitive: between two curation runs you want the
    delta, not the snapshots.  Works on the normalized content hash (same
    normalization as ``exact_dedup``), so whitespace-only churn is
    ``unchanged``.

    Shape: each side reduces to (id, hash) — text never shuffles — then
    ONE full-outer equi-join on the id.  Cost is two hash projections +
    one co-partitioned join at any corpus size.
    """
    oh = old.select(
        F.col(id_col), F.md5(normalized_text(text_col)).alias("__h_old")
    )
    nh = new.select(
        F.col(id_col), F.md5(normalized_text(text_col)).alias("__h_new")
    )
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return oh.join(nh, id_col, "full_outer").select(
        id_col, status.alias("status")
    )


def contamination_ratios(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_ratio: float = 0.0,
) -> DataFrame:
    """FUZZY decontamination: per training doc, the fraction of its
    distinct word n-grams that appear anywhere in the benchmark set.

    ``contaminated_ids`` flags ANY shared n-gram (the conservative exact
    gate); real pipelines often gate on an overlap THRESHOLD instead
    (GPT-3's 13-gram collision rule, Gopher's 8-gram overlap fraction) so
    one boilerplate phrase doesn't nuke a long document.

    Scale shape: identical to the exact gate — benchmark grams distinct +
    broadcast; the train side explodes its distinct grams once, an INNER
    broadcast join keeps hits only, one (id)-keyed count aggregate, and
    the per-doc gram total rides along from the same projection (no
    second tokenization pass).  Returns
    ``(id_col, n_grams, n_hits, overlap_ratio)`` for docs with
    ``overlap_ratio >= min_ratio`` (docs with zero hits only appear when
    ``min_ratio == 0``).
    """
    grams = train.select(
        F.col(id_col),
        F.array_distinct(ngram_strings(text_col, n)).alias("__gs"),
    )
    b = benchmark.select(
        F.explode(F.array_distinct(ngram_strings(text_col, n))).alias("g")
    ).distinct()
    hits = (
        grams.select(F.col(id_col), F.size("__gs").alias("n_grams"),
                     F.explode("__gs").alias("g"))
        .join(F.broadcast(b), "g")
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = grams.select(
        F.col(id_col), F.size("__gs").alias("n_grams")
    ).filter(F.col("n_grams") > 0)
    out = (
        base.join(hits.select(id_col, "n_hits"), id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)).cast("long"))
        .withColumn(
            "overlap_ratio",
            F.round(F.col("n_hits") / F.col("n_grams").cast("double"), 6),
        )
        .select(id_col, F.col("n_grams").cast("long").alias("n_grams"),
                "n_hits", "overlap_ratio")
    )
    return out.filter(F.col("overlap_ratio") >= min_ratio)
