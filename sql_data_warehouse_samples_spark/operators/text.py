"""Text-analysis operators for large-scale training-data pipelines.

Driver-mandated extension beyond the reference surface (BASELINE.json
north_star; SURVEY §7 step 9).  All operators are pure Column expressions
(JVM-side, whole-stage-codegen friendly — no Python UDFs in the hot path),
so they scale to 100 TB document corpora: each is a map-only transform with
no shuffle.

Precedent in the reference for heavy string cleansing as column expressions:
GenerateLoadScript-V3-ContainerSubfolders.sql:139-167 (staged varchar →
cast/clean pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker-word profiles for the n-gram/stopword heuristic
# language-ID.  Ordered dict: ties resolve to the first language listed.
LANGUAGE_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
    "es": ["el", "los", "las", "una", "y"],
    "zh": ["的", "是", "了", "在", "我"],
}

DEFAULT_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the loader's field-splitting idiom)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def word_token_count(text: Column | str) -> Column:
    """BPE-ish regex tokenization: word pieces, numbers, and symbols."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def stopword_count(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Number of token occurrences that are stopwords (bag semantics)."""
    sw = F.array(*[F.lit(s) for s in (stopwords or DEFAULT_STOPWORDS)])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    n = token_count(text)
    return F.round(stopword_count(text, stopwords) / F.nullif(n.cast("double"), F.lit(0.0)), 6)


def punctuation_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.round(n_punct / F.nullif(F.length(c).cast("double"), F.lit(0.0)), 6)


def quality_score(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Composite [0,1] quality score: lexical diversity + length + signal.

    score = 0.5*distinct_ratio + 0.3*min(n_tokens/100, 1) + 0.2*(1 - stopword_ratio)
    """
    n = token_count(text).cast("double")
    distinct_ratio = distinct_token_count(text) / F.nullif(n, F.lit(0.0))
    sw_ratio = stopword_count(text, stopwords) / F.nullif(n, F.lit(0.0))
    return F.round(
        0.5 * distinct_ratio + 0.3 * F.least(n / 100.0, F.lit(1.0)) + 0.2 * (1.0 - sw_ratio),
        6,
    )


def language_marker_hits(text: Column | str, lang: str) -> Column:
    """Token occurrences matching the language's marker-word profile."""
    profile = F.array(*[F.lit(w) for w in LANGUAGE_PROFILES[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(profile, t)))


def language_id(text: Column | str) -> Column:
    """Predict language by max marker-word hits; ties → profile order.

    Pure expression: a CASE chain over per-language hit counts.  At 100 TB
    this is a map-only pass (no shuffle, no UDF).
    """
    hits = {lang: language_marker_hits(text, lang) for lang in LANGUAGE_PROFILES}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build reversed so earlier profiles win ties
    for lang in reversed(list(LANGUAGE_PROFILES)):
        expr = F.when(hits[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best <= 0, F.lit("und")).otherwise(expr)


def content_fingerprint(text: Column | str) -> Column:
    """Stable 64-bit-equivalent content fingerprint: md5 prefix of the
    normalized text (lowercased, whitespace-collapsed)."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.substring(F.md5(normalized), 1, 16)


def bag_fingerprint(text: Column | str) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted distinct token set.

    Detects shuffled/reordered near-duplicates that exact hashing misses.
    """
    bag = F.array_sort(F.array_distinct(tokens(text)))
    return F.substring(F.md5(F.concat_ws(" ", bag)), 1, 16)


def adjacent_ngrams(toks: Column, n: int) -> Column:
    """All overlapping word n-grams (ordered, space-joined); empty below n
    tokens.

    Built by folding ``zip_with(acc, shift(toks, k))`` — NOT
    ``transform(sequence, slice/element_at)``: per-element slicing inside
    an interpreted HOF lambda is 2-16× slower (measured at sf0.1; the same
    interpreted-lambda trap as the MinHash fold notes).  zip_with pads the
    shorter side with NULL and ``concat_ws`` drops NULLs, so the partial
    tail grams are sliced off.  Slice lengths use size(toks) — an INT_MAX
    length overflows start+length and silently returns [].
    """
    acc = toks
    for k in range(2, n + 1):
        acc = F.zip_with(
            acc, F.slice(toks, k, F.size(toks)), lambda a, b: F.concat_ws(" ", a, b)
        )
    full = F.slice(acc, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.when(F.size(toks) >= n, full).otherwise(
        F.array().cast("array<string>")
    )


def bigrams(text: Column | str) -> Column:
    """Adjacent token 2-grams, space-joined; empty array below 2 tokens."""
    return adjacent_ngrams(tokens(text), 2)


def repetition_metrics(df, text_col: str, id_col: str):
    """Gopher-style repetition/quality filter metrics (Rae et al. 2021,
    "Scaling Language Models" §A1.1 quality heuristics — public paper):
    per document, the repeated-2-gram fraction, most-frequent-token
    fraction, mean word length, alphabetic-token fraction, and a composite
    ``gopher_pass`` flag.

    Scale shape: token/2-gram frequencies via explode → groupBy
    (map-side combine, one shuffle keyed (doc_id, token) — uniform keys),
    NOT per-row higher-order-function folds (interpreted lambdas are
    O(tokens²) per doc for frequency counting).
    """
    # 2-gram cardinalities are NATIVE collection expressions
    # (size/array_distinct — codegen'd, map-only, no shuffle); only the
    # token frequencies need grouping.  The per-doc constants ride through
    # the explode so the whole operator is ONE (doc_id, token)-keyed
    # shuffle with map-side combine and ZERO joins.
    g = bigrams(text_col)
    # per-doc metrics that need NO grouping are native collection
    # expressions (size/array_distinct — codegen'd, map-only): one narrow
    # row per document.  Evaluated in their own projection — putting them
    # in the same select as an explode would re-evaluate them per exploded
    # token row (an O(tokens²) blowup).
    per_doc = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("w"),
        F.length(F.regexp_replace(F.col(text_col), r"\s+", "")).alias("n_ltr"),
        F.size(g).alias("n_2grams"),
        F.size(F.array_distinct(g)).alias("n_distinct_2grams"),
    )
    # token frequencies are the only shuffled path, and the exploded rows
    # stay NARROW (doc_id, token): (doc_id, t) combine → per-doc rollup
    tok_stats = (
        per_doc.select("doc_id", F.explode("w").alias("t"))
        .groupBy("doc_id", "t")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_tokens"),
            F.max("count").alias("max_tok"),
            F.sum(
                F.when(F.col("t").rlike("[A-Za-z]"), F.col("count")).otherwise(0)
            ).alias("n_alpha"),
        )
    )
    # join back one-row-per-doc frames (cheap doc_id exchange, no explode)
    base = per_doc.drop("w").join(tok_stats, "doc_id")
    nt = F.col("n_tokens").cast("double")
    dup2 = F.round(
        F.when(
            F.col("n_2grams") > 0,
            1.0 - F.col("n_distinct_2grams") / F.col("n_2grams").cast("double"),
        ).otherwise(0.0),
        6,
    )
    top_frac = F.round(F.col("max_tok") / nt, 6)
    mean_len = F.round(F.col("n_ltr") / nt, 6)
    alpha_frac = F.round(F.col("n_alpha") / nt, 6)
    out = base.select(
        "doc_id",
        F.col("n_tokens"),
        F.col("n_2grams"),
        dup2.alias("dup_2gram_frac"),
        top_frac.alias("top_token_frac"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_token_frac"),
    )
    gopher_pass = (
        F.col("n_tokens").between(10, 100_000)
        & (F.col("dup_2gram_frac") < 0.9)
        & (F.col("top_token_frac") < 0.3)
        & F.col("mean_word_len").between(2.0, 12.0)
        & (F.col("alpha_token_frac") > 0.7)
    )
    return out.withColumn("gopher_pass", gopher_pass)


# ---------------------------------------------------------------------------
# PII detection / redaction (map-only regex; no shuffle)
# ---------------------------------------------------------------------------

# Patterns restricted to the Java-regex ∩ RE2 common subset (no lookaround)
# so the SAME pattern string runs on Spark executors and in the DuckDB
# oracle.  Insertion order IS the redaction order: emails first (their
# local parts can contain digits that the later numeric patterns would
# otherwise mangle), then phones, then IPv4.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_count(text: Column | str, kind: str) -> Column:
    """Occurrences of one PII pattern in the ORIGINAL text."""
    pat, _ = PII_PATTERNS[kind]
    return F.regexp_count(F.col(text) if isinstance(text, str) else text, F.lit(pat))


def redact_pii(text: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with its placeholder token, chained in
    ``PII_PATTERNS`` order (counts are taken on the original text, the
    redaction is cumulative)."""
    out = F.col(text) if isinstance(text, str) else text
    for kind in kinds or list(PII_PATTERNS):
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def chunk_documents(
    df,
    text_col: str,
    id_col: str,
    max_tokens: int,
    stride: int | None = None,
):
    """Split documents into (overlapping) token-window chunks — the
    context-length preprocessing step before sequence packing.

    Offsets 0, stride, 2·stride, … < n_tokens; each chunk is the
    ``max_tokens``-token slice at its offset (the final chunks are
    shorter).  ``stride < max_tokens`` gives overlapping chunks
    (overlap = max_tokens − stride), the usual long-document recipe.

    100 TB shape: tokenize → sequence → posexplode → slice is a single
    map-only pass fused by codegen; row amplification is ~n/stride per
    document and no shuffle is introduced.  Output grain: one row per
    (doc, chunk_idx).
    """
    if stride is None:
        stride = max_tokens
    if stride < 1 or max_tokens < 1:
        raise ValueError("max_tokens and stride must be >= 1")
    n = F.size(F.col("_toks"))
    offs = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunk = F.slice(F.col("_toks"), F.col("_off") + 1, max_tokens)
    return (
        df.select(
            F.col(id_col),
            tokens(text_col).alias("_toks"),
        )
        .select(id_col, "_toks", F.explode(offs).alias("_off"))
        .select(
            id_col,
            (F.col("_off") / stride).cast("int").alias("chunk_idx"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).alias("n_chunk_tokens"),
        )
    )


def common_ngrams(
    df,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_doc_freq: int = 2,
    top_k: int = 50,
):
    """Corpus-wide repeated n-gram mining: the boilerplate detector that
    informs dedup/filter policy (header/footer phrases, license blurbs,
    navigation text show up as high-doc-frequency n-grams).

    One explode → (gram)-keyed aggregation with map-side combine; the
    distinct doc frequency rides the same shuffle as a two-phase distinct
    aggregate.  Output is driver-small (top_k rows) with a deterministic
    (count DESC, gram ASC) tiebreak.  At 100 TB the gram key space is
    large and uniform — hot grams are exactly what partial aggregation
    collapses before the exchange.
    """
    g = F.explode(adjacent_ngrams(tokens(text_col), n)).alias("ngram")
    return (
        df.select(F.col(id_col).alias("_doc"), g)
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("_doc").alias("doc_freq"),
        )
        .filter(F.col("doc_freq") >= min_doc_freq)
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# Corpus-trained bigram LM scoring (perplexity-style quality filter)
# ---------------------------------------------------------------------------


def bigram_lm_scores(df, text_col: str, id_col: str, alpha: float = 0.5,
                     round_to: int = 6):
    """Per-document negative log-likelihood under an add-α bigram language
    model trained on the corpus itself — the KenLM-style perplexity filter
    (CCNet, Wenzek et al. 2020) without an external model artifact.

    Train: one explode→groupBy pass builds bigram counts; the unigram
    (history) counts and vocabulary size derive from that gram table, not
    from a second corpus scan.  Score: each document's bigrams hash-join
    the two count tables; per-gram ``nll = -ln((c(w1w2)+α)/(c(w1)+α·V))``
    rounded to ``round_to``, then an exact-decimal average per document.

    Output: (doc_id, n_bigrams, avg_nll) — higher avg_nll = less
    corpus-typical text.  Documents under 2 tokens carry no bigrams and are
    absent (outer-join downstream if needed).

    Scale shape: two shuffles over narrow (doc_id, gram) rows with map-side
    combine, two hash equi-joins keyed on the gram/history string (uniform
    hash keys), one broadcast scalar for V.  The gram frame is persisted —
    it feeds both the training aggregate and the scoring join, and
    recomputing it would re-scan the corpus text.  At 100 TB the count
    tables are vocabulary-sized (≪ corpus); if the full vocabulary no
    longer fits a join side, a top-K table + OOV fallback bucket keeps the
    same plan shape.
    """
    from pyspark import StorageLevel
    from pyspark.sql import DataFrame  # noqa: F401  (signature clarity)

    doc_grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bigrams(F.col(text_col))).alias("g"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bc = doc_grams.groupBy("g").agg(F.count(F.lit(1)).alias("cb"))
    uc = bc.groupBy(F.substring_index("g", " ", 1).alias("w1")).agg(
        F.sum("cb").alias("cu")
    )
    vocab = uc.agg(F.count(F.lit(1)).alias("vv"))
    nll = F.round(
        -F.log(
            (F.col("cb") + F.lit(alpha))
            / (F.col("cu") + F.lit(alpha) * F.col("vv"))
        ),
        round_to,
    )
    # per-gram nll depends only on (cb, cu, V) — compute it ONCE PER
    # DISTINCT GRAM on the vocabulary-sized side and broadcast (g, nll):
    # the corpus-sized gram stream then pays one hash probe per
    # occurrence instead of two broadcast joins plus the substring/ln
    # math per occurrence (r12, guide §2.3 "shuffle keys and metadata
    # instead of payloads" applied to the broadcast side).  Identical
    # values: the same rounded expression over the same counts, evaluated
    # per gram instead of per (doc, gram) occurrence.
    gram_nll = (
        bc.withColumn("w1", F.substring_index("g", " ", 1))
        .join(uc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("g", nll.alias("nll"))
    )
    # join strategy stays PLANNER-DECIDED (no broadcast hint): at bench
    # scale the gram table broadcasts as before; past a broadcastable
    # vocabulary the planner falls back to the equi-join the docstring's
    # top-K/OOV note assumes
    scored = doc_grams.join(gram_nll, "g").select("doc_id", "nll")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.col("nll").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            round_to,
        ).alias("avg_nll"),
    )


def line_dedup(
    df,
    text_col: str,
    id_col: str,
    max_occurrences: int = 1,
    sep: str = "\n",
):
    """Corpus-level line deduplication (the CCNet / RefinedWeb boilerplate
    pass): drop every line whose exact text occurs in MORE than
    ``max_occurrences`` documents' lines across the corpus — navigation
    chrome, cookie banners, shared footers — and reassemble each document
    from its surviving lines in original order.

    Returns ``(id_col, text_clean, n_lines_kept, n_lines_dropped)``.

    Scale shape: posexplode to (doc, pos, line); line frequency is ONE
    count-over-window shuffle keyed by the line hash (md5 → uniform,
    skew-free even for a footer shared by 100M docs — the window only
    counts, never materializes a group list); reassembly is one groupBy on
    the document id sorting each doc's surviving (pos, line) structs
    map-side.  Row amplification is lines-per-doc, the same factor every
    line-grain pass pays.
    """
    from pyspark.sql import Window

    c_id, c_text = F.col(id_col), F.col(text_col)
    lines = df.select(
        c_id.alias("__id"),
        F.posexplode(F.split(c_text, F.lit(sep))).alias("__pos", "__line"),
    )
    w = Window.partitionBy(F.md5(F.col("__line")))
    counted = lines.withColumn("__freq", F.count(F.lit(1)).over(w))
    keep = F.col("__freq") <= max_occurrences
    return (
        counted.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct("__pos", "__line"))
                        )
                    ),
                    lambda x: x["__line"],
                ),
            ).alias("text_clean"),
            F.count(F.when(keep, F.lit(1))).alias("n_lines_kept"),
            F.count(F.when(~keep, F.lit(1))).alias("n_lines_dropped"),
        )
    )


def heavy_hitter_tokens(
    df: DataFrame,
    text_col: str = "text",
    min_share: float = 0.01,
    support: float | None = None,
) -> DataFrame:
    """EXACT heavy hitters (tokens with share ≥ ``min_share`` of all token
    occurrences) via the two-pass sketch pattern — the 100 TB alternative
    to a full-vocabulary aggregate:

    1. candidate pass: Spark's single-pass ``freqItems`` (Karp/
       Misra-Gries family) at ``support < min_share`` — guaranteed to
       return a SUPERSET of every token whose true share exceeds
       ``support``, in one scan with a bounded (≤ 1/support) driver-side
       result; no (token)-keyed shuffle of the full vocabulary ever runs.
    2. verify pass: exact counts for the candidate set only (a broadcast
       isin filter, then one tiny aggregate) and the exact threshold cut.

    The superset guarantee + exact recount makes the OUTPUT exact and
    deterministic even though the sketch's extra candidates are not —
    false candidates die in the recount, true heavy hitters cannot be
    missed.  Output: (token, n_occurrences), share ≥ min_share.
    """
    if support is None:
        support = min_share / 10
    if support >= min_share:
        raise ValueError("support must be < min_share for the guarantee")
    toks = df.select(F.explode(tokens(text_col)).alias("token")).filter(
        F.col("token") != ""
    )
    cand = toks.stat.freqItems(["token"], support).collect()[0][0]
    total = toks.count()
    import math

    threshold = math.ceil(min_share * total)
    if not cand:
        return toks.limit(0).groupBy("token").agg(
            F.count(F.lit(1)).alias("n_occurrences")
        )
    return (
        toks.filter(F.col("token").isin(list(cand)))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= F.lit(threshold))
    )


def c4_line_clean(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    terminal_re: str = '[.!?"]$',
    blocklist: tuple[str, ...] = ("javascript", "lorem ipsum", "cookie"),
    brace_filter: bool = True,
    min_kept_lines: int = 1,
    sep: str = "\n",
):
    """C4-style line-rule page cleaning (Raffel 2020 §2.2): keep only
    lines that (a) end in terminal punctuation, (b) have at least
    ``min_line_words`` words, (c) contain no blocklisted phrase
    (case-insensitive); drop whole pages containing ``{`` (the C4 code
    gate, ``brace_filter``) or retaining fewer than ``min_kept_lines``
    lines.  Reassembles surviving lines in original order.

    Returns ``(id_col, clean_text, n_lines, n_kept)``.

    Scale shape: entirely JVM-side array functions on the page string —
    map-only, whole-stage-codegen'd, zero exchanges, no explode (the
    line array never leaves the row) — the cheapest possible first gate
    ahead of the shuffle-bearing passes (line_dedup, MinHash).
    """
    # ``sep`` is a LITERAL separator: it feeds both F.split (which takes a
    # Java regex) and F.array_join (which takes a literal) — \Q...\E-quote
    # the split side so a metacharacter separator ("||", ".") splits the
    # same way it rejoins instead of exploding the page per-character.
    if "\\E" in sep:
        raise ValueError(r"sep must not contain the regex-quote end '\E'")
    lines = F.split(F.col(text_col), f"\\Q{sep}\\E")

    def _keep(line):
        t = F.trim(line)
        cond = (F.size(F.split(t, r"\s+")) >= min_line_words) & t.rlike(
            terminal_re
        )
        low = F.lower(line)
        for phrase in blocklist:
            cond = cond & ~low.contains(phrase)
        return cond

    kept = F.filter(lines, _keep)
    out = df
    if brace_filter:
        out = out.filter(~F.col(text_col).contains("{"))
    return (
        out.select(
            F.col(id_col),
            F.array_join(kept, sep).alias("clean_text"),
            F.size(lines).alias("n_lines"),
            F.size(kept).alias("n_kept"),
        )
        .filter(F.col("n_kept") >= min_kept_lines)
    )

