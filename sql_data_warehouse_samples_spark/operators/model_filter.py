"""Model-based document scoring/filtering — the classifier step of a
modern curation pipeline (fastText-style quality classifiers, KenLM
perplexity gates) as an injectable-scorer seam.

The environment ships no model runtimes, so the SCORER is injectable
(``set_scorer``) with a deterministic default, exactly like the
multimodal codec seam (operators/multimodal.py): the Spark-side plumbing
— Arrow-batched ``mapInPandas``, schema passthrough + appended score
column, batch sizing — is real and tested; a production deployment swaps
in the real model with one call and nothing else changes.

Scale shape: mapInPandas streams Arrow batches through the Python worker
(the ONLY sanctioned Python hot path — model inference is genuinely
Python); no shuffle, corpus order preserved, score column appended.  At
100 TB the batch size bounds worker memory and the model loads once per
executor via the scorer's closure (lazy init inside the iterator).

The default scorer is a keyed hash → uniform [0,1) — deterministic,
engine-portable (DuckDB mirrors it bit-for-bit via md5 hex math), so the
whole mapInPandas path is oracle-checkable end-to-end (t11).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

#: pandas Series[str] -> Series[float] (document texts -> scores)
Scorer = Callable[["object"], "object"]

_scorer: Scorer | None = None


def set_scorer(fn: Scorer | None) -> None:
    """Install the model scorer (None restores the deterministic fake)."""
    global _scorer
    _scorer = fn


def deterministic_fake_scorer(texts) -> "object":
    """Keyed-hash uniform score: int(md5(text)[:8], 16) / 2^32 — the
    stand-in for a real quality model, reproducible across engines."""
    return texts.map(
        lambda t: int(hashlib.md5((t or "").encode()).hexdigest()[:8], 16)
        / 4294967296.0
    )


def score_documents(
    df: DataFrame,
    text_col: str = "text",
    out: str = "model_score",
    batch_size: int = 1024,
) -> DataFrame:
    """Append a model score per document via Arrow-batched mapInPandas.

    All input columns pass through unchanged; the scorer sees
    ``batch_size``-row text batches (bounded worker memory).  Install a
    real model with ``set_scorer`` — e.g. a fastText predictor or a KenLM
    perplexity fn — loaded lazily inside the closure so each executor
    initializes it once.
    """
    scorer = _scorer or deterministic_fake_scorer
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{out}` double"

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size].copy()
                chunk[out] = [float(s) for s in scorer(chunk[text_col])]
                yield chunk

    return df.mapInPandas(run, schema=schema)


def filter_by_model(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    keep_above: bool = True,
    out: str = "model_score",
) -> DataFrame:
    """Score + threshold gate in one pass (the classifier filter stage)."""
    from pyspark.sql import functions as F

    scored = score_documents(df, text_col, out=out)
    cond = F.col(out) >= threshold if keep_above else F.col(out) <= threshold
    return scored.filter(cond)
