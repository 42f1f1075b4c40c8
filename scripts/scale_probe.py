"""Scaling probe: the reference claims ~linear scan/agg/CTAS improvement
with compute units (white-papers/Integrating MicroStrategy...md:17;
BASELINE.md derived target #1).  This measures core-count scaling on this
box and prints the efficiency curve:

    python scripts/scale_probe.py            # cores = 4, 8, 16, 32
    python scripts/scale_probe.py 8 32       # explicit ladder
    SCALE_PROBE_X=32 python scripts/...      # inflation factor (default 16)

The sf0.1 test tables are far too small to exercise parallelism (any
query finishes in ~1 s of mostly fixed per-job cost at 4 cores already),
so the probe INFLATES them on the fly — each row replicated X times via
``explode(sequence(...))``, flowing through the same operators the
workload uses:

* ``agg``   — q01-style decimal aggregation over lineitem × X
* ``sig``   — MinHash signature fold (32 hashes × shingles) over
              documents × X, the heaviest per-row compute in the engine

Each config runs in a fresh SparkContext (master=local[n]); timings are
the median of 3 after a warmup run.  Perfect linearity is still not
expected on one box (shared memory bandwidth, GC), but compute-bound
stages should show clear speedup — a flat curve on ``sig`` would mean the
operator serializes, which is exactly what the probe exists to catch.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_data_warehouse_samples_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
INFLATE = int(os.environ.get("SCALE_PROBE_X", "16"))


def _inflate(df, n: int):
    """Replicate every row n times (row-grain explode; no driver data).

    The small test parquet arrives as ONE split, which would pin the whole
    inflated computation to a single task no matter the core count — the
    same under-partitioned-scan hazard the workload's ``_spread`` guards
    (operators/similarity.py).  Spread BEFORE the explode so the probe
    measures the operators, not a self-inflicted single-partition scan."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par).withColumn(
        "__copy", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


def probe_agg(spark) -> None:
    li = _inflate(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"), INFLATE)
    (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sq"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def probe_sig(spark) -> None:
    from sql_data_warehouse_samples_spark.operators.dedup import (
        minhash_signature,
        shingles,
    )

    d = _inflate(spark.read.parquet(f"{SF_DIR}/documents.parquet"), INFLATE)
    (
        d.select(minhash_signature(shingles("text", 3), 32).alias("__sig"))
        .select(F.avg(F.element_at("__sig", 1)).alias("s"))  # avg: no long overflow
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


PROBES = {"agg": probe_agg, "sig": probe_sig}


def ntile_ladder() -> None:
    """q30-class total-order window probe: exact NTILE (single-partition
    WindowExec) vs ``operators/quantiles.approx_ntile`` (two-pass sketch +
    map-only CASE) across an input-size ladder.  The exact path's cost
    grows superlinearly in ONE task while the approx path flat-scales with
    the cluster — this measures the crossover instead of asserting it.

        python scripts/scale_probe.py ntile        # X = 1, 4, 16, 64
        python scripts/scale_probe.py ntile 8 32   # explicit X ladder
    """
    from pyspark.sql import Window

    from sql_data_warehouse_samples_spark.operators.quantiles import approx_ntile

    ladder = [int(a) for a in sys.argv[2:]] or [1, 4, 16, 64]
    spark = build_session(app_name="scale-probe-ntile")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_acctbal"
    )
    report = []
    for x in ladder:
        df = _inflate(base, x).select(
            # unique-ish ordering value so exact NTILE's sort is honest
            (F.col("c_acctbal") + F.col("__copy") * 0.0001).alias("v")
        )
        n_rows = df.count()  # materializes the inflate outside the timings

        def run_exact(d=df):
            d.withColumn(
                "bucket", F.ntile(100).over(Window.orderBy("v"))
            ).select(F.sum("bucket")).write.format("noop").mode("overwrite").save()

        def run_approx(d=df):
            approx_ntile(d, "v", 100).select(F.sum("bucket")).write.format(
                "noop"
            ).mode("overwrite").save()

        timings = {}
        for name, fn in [("exact", run_exact), ("approx", run_approx)]:
            fn()  # warm
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                reps.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(reps), 3)
        report.append({"inflate_x": x, "rows": n_rows, **timings})
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "probe": "ntile", "ladder": report}))


def run_config(cores: int) -> dict:
    spark = build_session(
        app_name=f"scale-probe-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        timings = {}
        for name, fn in PROBES.items():
            fn(spark)  # warm (codegen/JIT)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark)
                reps.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(reps), 3)
        return timings
    finally:
        spark.stop()


def grams_ladder() -> None:
    """Mass-duplication probe for the ExactSubstr family: plant ONE
    boilerplate document duplicated X times on top of the corpus and run
    ``substring_dup_pairs``.  Star-formed gram edges emit (X-1) edges per
    shared gram — runtime and edge count must grow ~LINEARLY in X; a
    pairwise formulation would grow with X² and this probe would show it
    immediately.

        python scripts/scale_probe.py grams           # X = 100, 400, 1600
        python scripts/scale_probe.py grams 50 500    # explicit ladder
    """
    from pyspark.sql import functions as F  # noqa: F811

    from sql_data_warehouse_samples_spark.operators.dedup import (
        substring_dup_pairs,
    )

    ladder = [int(a) for a in sys.argv[2:]] or [100, 400, 1600]
    spark = build_session(app_name="scale-probe-grams")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    boiler = " ".join(f"boiler{i}" for i in range(60))  # 60 tokens, 41 20-grams
    report = []
    for x in ladder:
        dup = (
            spark.range(x)
            .select(
                (F.col("id") + 1_000_000).alias("doc_id"),
                F.lit(boiler).alias("text"),
            )
        )
        corpus = docs.unionByName(dup).repartition(32).localCheckpoint(eager=True)
        pairs = substring_dup_pairs(corpus, "text", "doc_id", n=20)
        t0 = time.perf_counter()
        n_edges = pairs.count()
        dt = time.perf_counter() - t0
        report.append({"x": x, "edges": n_edges, "sec": round(dt, 3)})
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "probe": "grams", "ladder": report}))


def load_probe() -> None:
    """Loader-throughput probe (BASELINE derived target 2: Spark's
    parallel CSV read must never be the bottleneck vs the single-node
    DBLoader pattern — 1M-row batches, 8 file threads).  Exports
    lineitem to gzip CSV shards, then measures the staged-varchar →
    cast-clean → CTAS pipeline end-to-end and prints rows/sec.

        python scripts/scale_probe.py load [n_shards]
    """
    import shutil
    import tempfile

    from sql_data_warehouse_samples_spark.engine import Engine
    from sql_data_warehouse_samples_spark.sources.csv_loader import (
        ColumnSpec,
        LoadOptions,
    )

    shards = int(sys.argv[2]) if sys.argv[2:] else 8
    # local mode = one JVM for driver+executors; the default 1g heap
    # thrashes the GC locker on a multi-million-row gzip export
    spark = build_session(
        app_name="scale-probe-load",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    if INFLATE > 1:  # sf0.1 alone is fixed-cost dominated (~7 s floor)
        li = _inflate(li, INFLATE).drop("__copy")
    n_rows = li.count()
    workdir = tempfile.mkdtemp(prefix="loadprobe_")
    csv_dir = f"{workdir}/csv"
    (
        li.repartition(shards)
        .write.option("compression", "gzip")
        .mode("overwrite")
        .csv(csv_dir)
    )
    cols = [
        ColumnSpec(f.name, f.dataType.simpleString(), nullable=True)
        for f in li.schema.fields
    ]
    eng = Engine(spark)
    eng.create_schema("loadprobe")
    try:
        t0 = time.perf_counter()
        eng.load_csv(
            f"{csv_dir}/*.csv.gz",
            "loadprobe.lineitem",
            cols,
            LoadOptions(compression="gzip"),
        )
        dt = time.perf_counter() - t0
        loaded = spark.table("loadprobe.lineitem").count()
        print(
            json.dumps(
                {
                    "sf_dir": SF_DIR,
                    "probe": "load",
                    "shards": shards,
                    "rows": loaded,
                    "sec": round(dt, 3),
                    "rows_per_sec": int(loaded / dt),
                }
            )
        )
        assert loaded == n_rows, (loaded, n_rows)
    finally:
        eng.catalog.drop_schema("loadprobe", cascade=True)
        shutil.rmtree(workdir, ignore_errors=True)


def shards_probe() -> None:
    """Training-shard export throughput (operators/shards.py): inflate the
    documents table, write `n_shards` sorted hive-partitioned shards, and
    print rows/sec.  The interesting number is the COST OF THE SORT+WRITE
    relative to a plain unsorted write — the shuffle-shard layout should
    cost ~one exchange, not a multiple of the plain write.

        python scripts/scale_probe.py shards [n_shards]
    """
    import shutil
    import tempfile

    from sql_data_warehouse_samples_spark.operators.shards import (
        write_training_shards,
    )

    n_shards = int(sys.argv[2]) if sys.argv[2:] else 32
    spark = build_session(
        app_name="scale-probe-shards",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if INFLATE > 1:
        d = _inflate(d, INFLATE).withColumn(
            "doc_id",
            F.col("doc_id") * INFLATE + F.col("__copy"),
        ).drop("__copy")
    # materialize the inflated frame so BOTH writes pay identical input
    # cost — otherwise the plain baseline fuses the (nearly free) explode
    # and the overhead ratio overstates the shard layout's price
    d = d.localCheckpoint(eager=True)
    n_rows = d.count()
    workdir = tempfile.mkdtemp(prefix="shardprobe_")
    try:
        t0 = time.perf_counter()
        write_training_shards(d, f"{workdir}/shards", "doc_id", n_shards, seed="ep0")
        dt_shard = time.perf_counter() - t0
        t0 = time.perf_counter()
        d.write.mode("overwrite").parquet(f"{workdir}/plain")
        dt_plain = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "sf_dir": SF_DIR,
                    "probe": "shards",
                    "rows": n_rows,
                    "n_shards": n_shards,
                    "shard_sec": round(dt_shard, 3),
                    "plain_write_sec": round(dt_plain, 3),
                    "shard_rows_per_sec": int(n_rows / dt_shard),
                    "overhead_x": round(dt_shard / dt_plain, 2),
                }
            )
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def knn_ladder() -> None:
    """Exact block-gemm KNN join vs IVF-pruned mode as the corpus grows.

    Exact corpus-vs-corpus KNN is quadratic BY DEFINITION; the question a
    100 TB user needs answered is WHERE the IVF mode (linear-ish: each
    vector compared within ~corpus/nlist-sized lists) takes over and what
    recall the pruning costs.  Vectors are inflated with DISTINCT noisy
    copies (re-keyed ids, deterministic per-copy perturbation) so the
    neighbor structure stays non-degenerate.

        python scripts/scale_probe.py knn     # X = 1, 4, 8 copies
    """
    spark = build_session(app_name="knn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from sql_data_warehouse_samples_spark.operators import similarity as S

    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    report = []
    for x in (1, 4, 8):
        copies = [base]
        for i in range(1, x):
            copies.append(
                base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
                .withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (v, j) -> cast(v + 0.4 * "
                        f"sin((j + 1) * {i} * 1.7 + {i}) as float))"
                    ),
                )
            )
        e = copies[0]
        for c in copies[1:]:
            e = e.unionByName(c)
        e = e.repartition(32).localCheckpoint(eager=True)
        n = e.count()
        nlist = max(16, n // 250)
        timings = {}
        outs = {}
        for mode, kw in (
            ("exact", {}),
            ("ivf_p1", {"mode": "ivf", "nlist": nlist, "nprobe": 1}),
            ("ivf_p4", {"mode": "ivf", "nlist": nlist, "nprobe": 4}),
        ):
            t0 = time.time()
            rows = S.knn_join(e, e, k=3, **kw).collect()
            timings[mode] = round(time.time() - t0, 2)
            outs[mode] = {(r.query_id, r.neighbor_id) for r in rows}
        exact = outs["exact"]
        report.append(
            {
                "n_vectors": n,
                "nlist": nlist,
                "sec": timings,
                "recall_vs_exact": {
                    m: round(len(outs[m] & exact) / len(exact), 3)
                    for m in ("ivf_p1", "ivf_p4")
                },
            }
        )
    print(json.dumps({"sf_dir": SF_DIR, "knn_ladder": report}))


def bpe_ladder() -> None:
    """BPE merge-loop wall-clock vs n_merges and batch_size — measures the
    sequential-round scheduler cost the r5 verdict flagged: a 32k-vocab
    trainer at batch_size=1 is ~32k Spark jobs of fixed cost.

        python scripts/scale_probe.py bpe           # n_merges = 100, 400, 1000
        SCALE_PROBE_MERGES="100 1000" python ...    # explicit ladder

    Reports sec + effective rounds for batch_size 1 vs the default (16),
    asserting identical merge lists (the _select_batch exactness rule).
    The per-merge marginal cost extrapolates linearly to the 32k-vocab
    production run (rounds are the unit of fixed cost, so the speedup is
    rounds_seq / rounds_batched up to the dict-rewrite floor).
    """
    spark = build_session(app_name="bpe-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from sql_data_warehouse_samples_spark.operators import bpe as B

    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    ladder = [
        int(x)
        for x in os.environ.get("SCALE_PROBE_MERGES", "100 400 1000").split()
    ]
    report = []
    for n_merges in ladder:
        row = {"n_merges": n_merges}
        merges_by_bs = {}
        for bs in (1, 16):
            t0 = time.time()
            merges, _ = B.bpe_train(docs, n_merges, batch_size=bs, min_count=2)
            sec = round(time.time() - t0, 2)
            merges_by_bs[bs] = merges
            row[f"bs{bs}_sec"] = sec
            row[f"bs{bs}_merges_learned"] = len(merges)
        t0 = time.time()
        coll = B.bpe_train_collected(docs, n_merges, min_count=2)
        row["collected_sec"] = round(time.time() - t0, 2)
        row["identical"] = merges_by_bs[1] == merges_by_bs[16]
        row["collected_identical"] = coll == merges_by_bs[1]
        # ENFORCE the exactness the docstring (and PERFORMANCE.md) claim —
        # a silent divergence buried in JSON is not an exactness proof
        # (explicit raise: a bare assert vanishes under python -O)
        if not (row["identical"] and row["collected_identical"]):
            raise AssertionError(f"merge-list divergence: {row}")
        row["speedup"] = (
            round(row["bs1_sec"] / row["bs16_sec"], 2) if row["bs16_sec"] else 0
        )
        report.append(row)
        print(json.dumps(row), flush=True)
    # the production-vocab rung: ONLY the collected trainer is viable at
    # 32k merges (per-round Spark fixed cost is hours); min_count=1 keeps
    # the small corpus from exhausting merges early, purely a timing rung
    t0 = time.time()
    big = B.bpe_train_collected(docs, 32_000, min_count=1)
    big_row = {
        "n_merges": 32_000,
        "collected_sec": round(time.time() - t0, 2),
        "collected_merges_learned": len(big),
    }
    report.append(big_row)
    print(json.dumps(big_row), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "bpe_ladder": report}))


def admission_ladder() -> None:
    """End-to-end cost of the composed streaming admission sink (L-st5):

        python scripts/scale_probe.py admission

    Rungs: batch sizes 1k → 10k → 1k → 100k → 1k documents, admitted
    through the REAL ``streaming.ingest.admission_sink`` (exact Bloom+
    verify decontamination → AdmissionPipeline exact+near dedup → dynamic-
    partition corpus write) against ONE persistent ledger that GROWS as
    rungs admit.  Two claims this measures directly:

    * per-batch wall is ~linear in BATCH size (the 1k/10k/100k spread);
    * per-batch wall is ~flat in ADMITTED-CORPUS size (the repeated 1k
      rungs, run when the ledger holds ~1k, ~12k and ~112k docs) — the
      ledger design's whole point: ingest reads stored keys/signatures
      (16 B / 8·k B rows), never corpus text.

    Every synthesized doc is globally distinct (per-doc token suffixes),
    so every rung pays the FULL work: sign + band-join the entire stored
    ledger side, no early exits.  Each rung uses a fresh drop dir +
    checkpoint (availableNow would otherwise re-read prior rungs' files);
    the ledger directory is shared across rungs.
    """
    import shutil
    import tempfile

    spark = build_session(app_name="admission-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from sql_data_warehouse_samples_spark.operators.ledger import (
        AdmissionPipeline,
    )
    from sql_data_warehouse_samples_spark.streaming import ingest as SI

    root = tempfile.mkdtemp(prefix="admission_probe_")
    pipeline = AdmissionPipeline(spark, os.path.join(root, "ledger"))
    benchmark = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )

    def synth(n_rows: int, offset: int):
        return spark.range(offset, offset + n_rows, 1, 32).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(59)),
                    lambda j: F.concat(F.lit("w"), F.col("id"), F.lit("_"), j),
                ),
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("probe").alias("source"),
            F.lit(400).cast("long").alias("n_chars"),
            F.current_timestamp().alias("ingest_ts"),
        )

    rungs = [1_000, 10_000, 1_000, 100_000, 1_000]
    offset, admitted, report = 0, 0, []
    for i, n_rows in enumerate(rungs):
        src = os.path.join(root, f"src{i}")
        synth(n_rows, offset).repartition(4).write.parquet(src)
        offset += n_rows
        t0 = time.time()
        q = SI.admission_sink(
            SI.read_document_stream(spark, src, max_files_per_trigger=4),
            pipeline,
            out_dir=os.path.join(root, "corpus"),
            checkpoint=os.path.join(root, f"ckpt{i}"),
            benchmark=benchmark,
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 2)
        row = {
            "rung": i,
            "batch_rows": n_rows,
            "ledger_docs_before": admitted,
            "wall_sec": wall,
            "sec_per_1k_docs": round(wall / (n_rows / 1_000), 3),
        }
        admitted += n_rows  # all-distinct corpus: every doc admits
        report.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"admission_ladder": report}))
    shutil.rmtree(root, ignore_errors=True)


def bpe_32k_dict_ladder() -> None:
    """Back the "32k merges in minutes" claim with a measurement at
    production-shaped DICT sizes:

        python scripts/scale_probe.py bpe32k            # 100k, 500k, 1M words
        SCALE_PROBE_DICT_WORDS="1000000" python ...     # explicit ladder

    The collected trainer's cost driver is the WORD DICT (the top-
    ``max_words`` rows collected to the driver), not the corpus — and the
    sf0.1 synthetic corpus has only ~31 distinct words, so corpus
    inflation cannot reach a production dict.  The probe synthesizes the
    dict DIRECTLY (``bpe_train_on_dict``): N distinct natural-SHAPED words
    (3-12 lowercase letters derived from the index's md5 — real-dict word
    lengths, not 32-char hex strings) with Zipf counts N//(i+1)+1, the
    shape a web-scale ``word_frequencies`` pass produces.  Per rung: the
    32k-merge train wall and the
    driver max-RSS against the ``max_words`` cap bounding it.
    """
    import hashlib
    import resource

    from sql_data_warehouse_samples_spark.operators import bpe as B

    ladder = [
        int(x)
        for x in os.environ.get(
            "SCALE_PROBE_DICT_WORDS", "100000 1000000"
        ).split()
    ]

    def word(i: int) -> str:
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[:10], "big")
        length = 3 + (i * 7919) % 10  # 3-12, uncorrelated with rank
        chars = []
        for _ in range(length):
            chars.append(chr(97 + h % 26))
            h //= 26
        return "".join(chars)

    report = []
    for n_words in ladder:
        t0 = time.time()
        seen: dict = {}
        i = 0
        while len(seen) < n_words:
            w = word(i)
            if w not in seen:
                seen[w] = len(seen)
            i += 1
        dict_rows = [(w, n_words // (r + 1) + 1) for w, r in seen.items()]
        synth_sec = round(time.time() - t0, 2)
        kernel = os.environ.get("SCALE_PROBE_BPE_KERNEL", "auto")
        t0 = time.time()
        merges = B.bpe_train_on_dict(
            dict_rows, 32_000, min_count=1, kernel=kernel
        )
        train_sec = round(time.time() - t0, 2)
        row = {
            "dict_words": n_words,
            "dict_synth_sec": synth_sec,
            "train_32k_sec": train_sec,
            "kernel": (
                "c" if kernel != "python" and B._load_bpe_ckernel() else "python"
            ),
            "merges_learned": len(merges),
            "driver_maxrss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
            ),
        }
        report.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"bpe32k_ladder": report}))


def ensure_sf10(spark, base_dir: str | None = None) -> str:
    """Synthesize (once, cached) the 100x corpus from sf0.1 — bench.py's
    sf1 recipe at X=100: per-copy token suffixes make every document copy
    mutually distinct; per-copy deterministic noise decorrelates embedding
    copies.  Shared by the one-off probe below and bench.py's standing
    sf10 section (SPARK_GRAFT_SF10=1)."""
    X = 100
    base = base_dir or SF_DIR
    sf10_dir = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")
    marker = os.path.join(sf10_dir, "_SUCCESS_SF10")
    if not os.path.exists(marker):
        os.makedirs(sf10_dir, exist_ok=True)
        copies = spark.range(0, X).select(F.col("id").cast("int").alias("__copy"))
        docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
        (
            docs.crossJoin(copies)
            .select(
                (F.col("doc_id") + F.col("__copy").cast("long") * 1_000_000)
                .alias("doc_id"),
                F.regexp_replace(
                    "text",
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1c"), F.col("__copy").cast("string")),
                ).alias("text"),
                *[
                    c
                    for c in docs.columns
                    if c not in ("doc_id", "text", "n_chars")
                ],
            )
            .withColumn("n_chars", F.length("text"))
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(sf10_dir, "documents.parquet"))
        )
        embs = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
        (
            embs.crossJoin(copies)
            .select(
                (F.col("vec_id") + F.col("__copy").cast("long") * 1_000_000)
                .alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: (
                        x
                        + 0.5
                        * F.sin(
                            (j + 1) * F.col("__copy") * 2.3999
                            + F.col("__copy")
                        )
                    ).cast("float"),
                ).alias("embedding"),
                *[
                    c
                    for c in embs.columns
                    if c not in ("vec_id", "embedding")
                ],
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(sf10_dir, "embeddings.parquet"))
        )
        with open(marker, "w") as f:
            f.write("ok\n")
    return sf10_dir


def sf10_probe() -> None:
    """One-off 100x scale point for the round-6 flagships whose sf1 (10x)
    ratios are floored by fixed cost (s10 1.4x, d23 1.0x at 10x — both
    consistent with the ~linear design but not yet EVIDENCE of it):

        python scripts/scale_probe.py sf10

    Synthesizes the cached 100x corpus (ensure_sf10), then times
    s10 / d23 / t19 at sf0.1 and sf10.  Note d23's benchmark side
    (doc_id % 97) scales WITH the corpus here, so its ratio covers Bloom
    build + probe both growing 100x — an upper bound on the fixed-bench
    production shape.  bench.py's SPARK_GRAFT_SF10=1 section records the
    same measurement round-over-round in BENCH_full_r{N}.json.
    """
    spark = build_session(app_name="sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from sql_data_warehouse_samples_spark import workload

    workload.load_all()
    sf10_dir = ensure_sf10(spark)

    subset = [
        "s10_pq_refine_topk",
        "d23_bloom_decontamination",
        "t19_c4_line_clean",
    ]
    report = []
    for name in subset:
        fn = workload.QUERIES[name]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()  # codegen warmup
        row = {"query": name}
        for label, d in (("sf0.1", SF_DIR), ("sf10", sf10_dir)):
            reps = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                reps.append(time.time() - t0)
            row[f"{label}_sec"] = round(min(reps), 2)
        row["ratio_100x"] = round(row["sf10_sec"] / max(row["sf0.1_sec"], 1e-9), 1)
        report.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"sf10_probe": report, "copies": 100}))


def main() -> None:
    if sys.argv[1:2] == ["admission"]:
        admission_ladder()
        return
    if sys.argv[1:2] == ["sf10"]:
        sf10_probe()
        return
    if sys.argv[1:2] == ["bpe32k"]:
        bpe_32k_dict_ladder()
        return
    if sys.argv[1:2] == ["ntile"]:
        ntile_ladder()
        return
    if sys.argv[1:2] == ["knn"]:
        knn_ladder()
        return
    if sys.argv[1:2] == ["bpe"]:
        bpe_ladder()
        return
    if sys.argv[1:2] == ["grams"]:
        grams_ladder()
        return
    if sys.argv[1:2] == ["load"]:
        load_probe()
        return
    if sys.argv[1:2] == ["shards"]:
        shards_probe()
        return
    ladder = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    results = {c: run_config(c) for c in ladder}
    base = ladder[0]
    report = []
    for cores in ladder:
        total = sum(results[cores].values())
        speedup = sum(results[base].values()) / total if total else 0.0
        report.append(
            {
                "cores": cores,
                "total_sec": round(total, 3),
                "speedup_vs_first": round(speedup, 2),
                "efficiency": round(speedup / (cores / base), 2),
                "probes": results[cores],
            }
        )
    print(json.dumps({"sf_dir": SF_DIR, "inflate_x": INFLATE, "ladder": report}))


if __name__ == "__main__":
    main()
