"""Distributed BPE tokenizer training — the word-frequency formulation.

A training-data pipeline that ships its own tokenizer needs merge rules
learned from the corpus (Sennrich et al. 2016).  The naive formulation
(merge over every token occurrence) would rewrite 100 TB of text per
merge; the classic trainer instead operates on the WORD-FREQUENCY
dictionary: distinct words with their counts.  That is also exactly the
scalable Spark shape —

* ONE corpus-sized shuffle total (`word_frequencies`: explode tokens,
  groupBy word with map-side combine).  At web scale the distinct-word
  dict is millions of rows where the corpus is trillions — everything
  after the first aggregate runs on the small frame.
* Each merge iteration is one tiny aggregate over the dict (pair counts
  weighted by word count, codegen'd zip_with pairing + sum) and one
  map-only rewrite of the symbol arrays (Arrow-batched kernel — the
  left-to-right non-overlapping merge scan is inherently sequential per
  word, the same category as FFD packing).
* The iteration count (vocab size, typically 30–50k) is a constant of
  the tokenizer, not of the corpus; symbol frames are
  ``localCheckpoint``-truncated per round like the connected-components
  loop (graph.py) so plans never nest.

Reference behavior parity: the pure-Python reference trainer in
tests/test_operators.py (the textbook algorithm over a collected word
dict) must produce the IDENTICAL merge sequence — tie-breaks are pinned
to (pair_count DESC, left_sym ASC, right_sym ASC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word sentinel appended to every word's symbol sequence so merges
#: can distinguish word-final from word-internal contexts (Sennrich §3.2).
END_TOKEN = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, wcount)`` over whitespace tokens — the ONE corpus-sized
    pass of the whole trainer."""
    from .text import tokens

    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def char_symbols(word: Column | str, end_token: str = END_TOKEN) -> Column:
    """Initial symbol sequence: one symbol per character + the end
    sentinel.  ``split(word, '')`` emits per-codepoint strings (a trailing
    empty element on some Spark versions is filtered defensively)."""
    c = F.col(word) if isinstance(word, str) else word
    chars = F.filter(F.split(c, ""), lambda x: x != F.lit(""))
    return F.concat(chars, F.array(F.lit(end_token)))


def pair_counts(words: DataFrame, sym_col: str = "symbols") -> DataFrame:
    """``(left_sym, right_sym, pair_count)`` — adjacent-symbol pair totals
    weighted by word frequency.  zip_with against the shifted array keeps
    the pairing codegen'd; one aggregate on (left, right)."""
    pairs = F.zip_with(
        F.col(sym_col),
        F.slice(F.col(sym_col), 2, F.greatest(F.size(sym_col) - 1, F.lit(1))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        words.select(
            F.explode(pairs).alias("p"), F.col("wcount")
        )
        .filter(F.col("p.r").isNotNull())
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("wcount").cast("long").alias("pair_count"))
    )


def _merge_udf(left: str, right: str):
    """Arrow-batched left-to-right non-overlapping pair merge over symbol
    arrays — the textbook in-word merge step.  Per-word sequential by
    nature; runs only over the distinct-word dict."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    merged = left + right

    def _fn(col):
        out = []
        for syms in col:
            if syms is None:
                out.append(None)
                continue
            n = len(syms)
            res = []
            i = 0
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return pandas_udf(_fn, ArrayType(StringType()))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    end_token: str = END_TOKEN,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns ``(merges, words)``: the ordered merge list
    ``[(left, right, pair_count), ...]`` and the final
    ``(word, wcount, symbols)`` frame (the trained segmentation of the
    dict — applying the same merges to unseen text is a map-only replay).

    Stops early when the best pair's count drops below ``min_count``
    (merging hapax pairs memorizes the dict).  Every round collects ONE
    row (the argmax pair) — the only driver traffic in the loop.
    """
    words = word_frequencies(docs, text_col).withColumn(
        "symbols", char_symbols("word", end_token)
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            pair_counts(words)
            .orderBy(
                F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym")
            )
            .limit(1)
            .collect()
        )
        if not best or best[0].pair_count < min_count:
            break
        b = best[0]
        merges.append((b.left_sym, b.right_sym, b.pair_count))
        words = words.withColumn(
            "symbols", _merge_udf(b.left_sym, b.right_sym)(F.col("symbols"))
        ).localCheckpoint(eager=True)
    return merges, words


def save_merges(
    spark, merges: list[tuple[str, str, int]], path: str
) -> None:
    """Persist a learned merge table as one-file parquet —
    ``(merge_rank, left_sym, right_sym, pair_count)``.  Rank IS the replay
    order; the table is tokenizer-sized (a few 10k rows), so one file."""
    spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "merge_rank int, left_sym string, right_sym string, pair_count long",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str, int]]:
    """Load a persisted merge table back into replay order."""
    rows = spark.read.parquet(path).orderBy("merge_rank").collect()
    return [(r.left_sym, r.right_sym, r.pair_count) for r in rows]


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_token: str = END_TOKEN,
) -> DataFrame:
    """Segment ``docs`` with an already-learned merge list — map-only
    (the merge rules ride the udf closure; no shuffle, no join).  The
    per-word merge replay applies rules in learned order, exactly the
    trainer's semantics."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    rules = [(m[0], m[1]) for m in merges]

    def _segment(w: str) -> list[str]:
        # sequential replay in learned order — the trainer's EXACT
        # semantics.  (A lowest-rank-first greedy, GPT-2-encoder style, is
        # NOT equivalent when different merge paths form the same symbol
        # string — "ab"+"c" vs "a"+"bc" — and the parity test pins replay
        # == trained dict segmentation.)  The O(1) symbol-set guard skips
        # the per-rule scan for the overwhelming majority of rules that
        # cannot apply to this word.
        syms = list(w) + [end_token]
        symset = set(syms)
        for left, right in rules:
            if left not in symset or right not in symset:
                continue
            merged = left + right
            res, i = [], 0
            n = len(syms)
            changed = False
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    changed = True
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            if changed:
                syms = res
                symset = set(syms)
        return syms

    def _fn(col):
        # per-worker memo: corpora repeat words heavily (Zipf), so each
        # distinct word segments once per executor process, not per
        # occurrence; the cache lives on the function object and survives
        # across Arrow batches in the reused worker
        memo = _fn.__dict__.setdefault("memo", {})
        out = []
        for toks in col:
            if toks is None:
                out.append(None)
                continue
            doc_syms: list[str] = []
            for w in toks:
                if not w:
                    continue
                seg = memo.get(w)
                if seg is None:
                    seg = _segment(w)
                    memo[w] = seg
                doc_syms.extend(seg)
            out.append(doc_syms)
        return pd.Series(out)

    from .text import tokens

    seg = pandas_udf(_fn, ArrayType(StringType()))
    return docs.withColumn(out_col, seg(tokens(text_col)))
