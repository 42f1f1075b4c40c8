"""Sequence packing for LLM training batches.

Packs variable-length documents into fixed-capacity token bins (the
"sequence packing" step before writing training shards — public practice in
e.g. the T5/GPT data pipelines: concatenate documents up to the model's
context length to avoid padding waste).

Scale shape: documents are hash-bucketed (map-only, uniform key), then each
bucket packs INDEPENDENTLY inside one ``applyInPandas`` group — the greedy
first-fit-decreasing loop is per-bucket Python over an Arrow batch, never a
driver-side collect.  At 100 TB: thousands of buckets pack in parallel, each
bounded by bucket size, and the output is a (bucket, bin_id) assignment
ready to become one training shard per bin.

Packing quality: first-fit-decreasing guarantees ≤ (11/9·OPT + 1) bins
(classic bin-packing bound); every bin but the stragglers lands near
capacity, so padding waste is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "doc_id long, bucket int, bin_id long, n_tokens long,"
    " bin_fill long, oversize boolean"
)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2048,
    num_buckets: int = 64,
) -> DataFrame:
    """Assign every document to a (bucket, bin) with Σ tokens ≤ max_tokens.

    Documents longer than ``max_tokens`` get a bin of their own, flagged
    ``oversize`` (the shard writer decides whether to split or drop them).
    Deterministic: bucket = crc32-style hash of the id, and packing order
    is (n_tokens DESC, id) within the bucket.
    """
    from .text import token_count

    sized = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(num_buckets))
        .cast("int")
        .alias("bucket"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        # first-fit-decreasing over open bins
        fills: list[int] = []
        assign: list[int] = []
        oversize: list[bool] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > max_tokens:
                fills.append(n)
                assign.append(len(fills) - 1)
                oversize.append(True)
                continue
            for b, used in enumerate(fills):
                if used + n <= max_tokens:
                    fills[b] = used + n
                    assign.append(b)
                    break
            else:
                fills.append(n)
                assign.append(len(fills) - 1)
            oversize.append(False)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bucket": bucket,
                "bin_id": assign,
                "n_tokens": pdf["n_tokens"],
                "bin_fill": [fills[b] for b in assign],
                "oversize": oversize,
            }
        )

    return sized.groupBy("bucket").applyInPandas(pack, _OUT_SCHEMA)
