"""Multimodal-column workload: binary payloads + Arrow-batched decode.

Driver-mandated LLM-pipeline surface.  Media payloads are opaque ``binary``
columns (reference precedent: the VARBINARY(MAX) employee Photo column,
dimension.employee.sql:8).  The decode step runs in ``mapInPandas``
(operators.multimodal) — the real Spark plumbing under test; the payloads
here are synthesized deterministically from the documents table so a DuckDB
oracle can recompute the expected metadata without any codec:

* 2/3 of docs get a minimal 24-byte PNG header whose width/height are
  arithmetic functions of doc_id (parsed back by the header sniffer);
* 1/3 keep their raw UTF-8 text bytes (unparseable → format NULL,
  n_bytes = byte length).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal as M
from . import query
from ._util import tbl

# 8-byte PNG signature + IHDR length(13) + "IHDR"; width/height follow as
# 4-byte big-endian ints → hex-assembled JVM-side, no Python in the build.
_PNG_PREFIX = "89504E470D0A1A0A0000000D49484452"


def _media_from_documents(d):
    w = (F.col("doc_id") % 640 + 1).cast("int")
    h = (F.col("doc_id") % 480 + 1).cast("int")
    png_hex = F.concat(
        F.lit(_PNG_PREFIX), F.lpad(F.hex(w), 8, "0"), F.lpad(F.hex(h), 8, "0")
    )
    payload = F.when(
        F.col("doc_id") % 3 != 0, F.to_binary(png_hex, F.lit("hex"))
    ).otherwise(F.col("text").cast("binary"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("string").alias("source_uri"),
    )


@query(
    "m01_media_meta",
    oracle="""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 <> 0 THEN 'png' END AS format,
         CASE WHEN doc_id % 3 <> 0 THEN 24
              ELSE octet_length(encode(text)) END AS n_bytes,
         CASE WHEN doc_id % 3 <> 0 THEN doc_id % 640 + 1 END AS width,
         CASE WHEN doc_id % 3 <> 0 THEN doc_id % 480 + 1 END AS height
  FROM documents)
SELECT format,
       COUNT(*) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(width) AS BIGINT) AS total_width,
       CAST(SUM(height) AS BIGINT) AS total_height
FROM m GROUP BY format
""",
)
def m01_media_meta(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    meta = M.decode_image_meta(_media_from_documents(d))
    return meta.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("width").cast("long").alias("total_width"),
        F.sum("height").cast("long").alias("total_height"),
    )


# ---------------------------------------------------------------------------
# m02 — REAL pixel decode through the built-in P6 PPM codec (L-m2), with an
# exact analytic oracle: the payload is a valid PPM whose pixel byte i is
# (doc_id + i) % 256, so DuckDB can recompute every statistic in closed
# form without any codec.  The Spark side decodes the ACTUAL binary through
# operators.multimodal.default_decoder — header parse, stride, the lot —
# and reduces pixels to scalars inside the same mapInPandas pass.
# ---------------------------------------------------------------------------


def _ppm_media_from_documents(d):
    w = (F.col("doc_id") % 5 + 2).cast("int")
    h = (F.col("doc_id") % 4 + 2).cast("int")
    n = (w * h * 3).cast("int")
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    ).cast("binary")
    # pixel byte i = (doc_id + i) % 256, assembled as hex JVM-side (≤ 132
    # bytes per doc at these sizes — synthesis cost, not operator cost)
    pix_hex = F.expr(
        "concat_ws('', transform(sequence(0, cast(((doc_id % 5 + 2) * "
        "(doc_id % 4 + 2) * 3 - 1) as int)), "
        "i -> lpad(hex((doc_id + i) % 256), 2, '0')))"
    )
    payload = F.concat(header, F.to_binary(pix_hex, F.lit("hex")))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.lit(None).cast("string").alias("source_uri"),
    )


@query(
    "m02_pixel_stats",
    oracle="""
WITH px AS (
  SELECT doc_id,
         (doc_id % 5 + 2) AS w,
         (doc_id % 4 + 2) AS h,
         list_sum(list_transform(
           generate_series(0, (doc_id % 5 + 2) * (doc_id % 4 + 2) * 3 - 1),
           i -> (doc_id + i) % 256)) AS pix_sum,
         list_min(list_transform(
           generate_series(0, (doc_id % 5 + 2) * (doc_id % 4 + 2) * 3 - 1),
           i -> (doc_id + i) % 256)) AS pix_min,
         list_max(list_transform(
           generate_series(0, (doc_id % 5 + 2) * (doc_id % 4 + 2) * 3 - 1),
           i -> (doc_id + i) % 256)) AS pix_max
  FROM documents)
SELECT CAST(w AS INT) AS width,
       COUNT(*) AS n_images,
       CAST(SUM(h) AS BIGINT) AS total_height,
       CAST(SUM(pix_sum) AS BIGINT) AS total_pix,
       CAST(MIN(pix_min) AS INT) AS min_pix,
       CAST(MAX(pix_max) AS INT) AS max_pix
FROM px GROUP BY w
""",
)
def m02_pixel_stats(spark, sf_dir):
    d = tbl(spark, sf_dir, "documents")
    st = M.decode_image_stats(_ppm_media_from_documents(d))
    return st.groupBy("width").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("height").cast("long").alias("total_height"),
        F.sum("pix_sum").cast("long").alias("total_pix"),
        F.min("pix_min").alias("min_pix"),
        F.max("pix_max").alias("max_pix"),
    )


# ---------------------------------------------------------------------------
# m03 — image near-dup by perceptual hash (L-m3): REAL PPM decode →
# 64-bit dHash (grayscale, nearest resample to 9×8, adjacent-pixel
# comparisons) inside ONE mapInPandas pass, then the SAME banded Hamming
# machinery text SimHash uses (dedup.hamming_neardup_pairs).  The payload
# pixel byte i is ((doc_id%7)·16 + i) % 256 at w = doc_id%5+9,
# h = doc_id%4+8, so the whole pipeline — integer grayscale, the
# arange(dst)·src//dst resample indices, bit packing, two's-complement
# wrap, pairwise Hamming — is closed-form in DuckDB (the m02 pattern):
# docs sharing (doc_id mod 140) have identical images (hamming 0); docs
# sharing (w, h) differ only where the mod-256 gradient wrap relocates.
# ---------------------------------------------------------------------------


def _dhash_media_from_documents(d):
    w = (F.col("doc_id") % 5 + 9).cast("int")
    h = (F.col("doc_id") % 4 + 8).cast("int")
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    ).cast("binary")
    pix_hex = F.expr(
        "concat_ws('', transform(sequence(0, cast(((doc_id % 5 + 9) * "
        "(doc_id % 4 + 8) * 3 - 1) as int)), "
        "i -> lpad(hex(((doc_id % 7) * 16 + i) % 256), 2, '0')))"
    )
    payload = F.concat(header, F.to_binary(pix_hex, F.lit("hex")))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.lit(None).cast("string").alias("source_uri"),
    )


# gray list gl: 8 rows × 9 cols of the resampled grayscale, 1-indexed at
# r*9+c+1; pixel k = yi(r)*w + xi(c) with yi/xi the arange(dst)*src//dst
# nearest-neighbor indices; gray = integer mean of the 3 channel bytes.
_M03_GRAYS = (
    "list_transform(generate_series(0, 71), q -> "
    "((base + 3*(((q//9) * h // 8) * w + ((q%9) * w // 9))) % 256"
    " + (base + 3*(((q//9) * h // 8) * w + ((q%9) * w // 9)) + 1) % 256"
    " + (base + 3*(((q//9) * h // 8) * w + ((q%9) * w // 9)) + 2) % 256) // 3)"
)


@query(
    "m03_image_dhash_pairs",
    oracle=f"""
WITH img AS (
  SELECT doc_id, doc_id % 5 + 9 AS w, doc_id % 4 + 8 AS h,
         (doc_id % 7) * 16 AS base
  FROM documents
),
grays AS (SELECT doc_id, {_M03_GRAYS} AS gl FROM img),
sig AS (
  SELECT doc_id,
         CAST(CASE WHEN s >= CAST(9223372036854775808 AS HUGEINT)
                   THEN s - CAST(18446744073709551616 AS HUGEINT)
                   ELSE s END AS BIGINT) AS dhash
  FROM (
    SELECT doc_id,
           list_sum(list_transform(generate_series(0, 63), p ->
             CASE WHEN gl[(p//8)*9 + (p%8) + 1] > gl[(p//8)*9 + (p%8) + 2]
                  THEN CAST(1 AS HUGEINT) << p
                  ELSE CAST(0 AS HUGEINT) END)) AS s
    FROM grays)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
""",
)
def m03_image_dhash_pairs(spark, sf_dir):
    from ..operators import dedup as D

    d = tbl(spark, sf_dir, "documents")
    sig = M.image_dhash(_dhash_media_from_documents(d))
    # uncapped buckets: the oracle is ALL qualifying pairs (banding at
    # bands=8 > max_hamming=3 is lossless by pigeonhole, so the outputs
    # match exactly); production corpora keep the default star cap
    return D.hamming_neardup_pairs(
        sig, "media_id", "dhash", max_hamming=3, bands=8, max_bucket=None
    )
