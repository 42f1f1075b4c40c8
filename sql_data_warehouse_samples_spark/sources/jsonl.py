"""JSONL (newline-delimited JSON) loader — the training-corpus twin of the
CSV load pipeline.

The reference's load surface is delimited text (PolyBase external tables +
DBLoader, csv_loader.py's provenance); modern LLM training corpora ship the
same shape as JSONL — one document object per line, gzip-compressed shards.
This loader gives JSONL the exact semantics the reference defines for
delimited loads (SURVEY §2.12 L1-L7, §2.11 S3/S7):

* staged all-varchar read → per-column tolerant cast/clean — Spark's JSON
  reader coerces scalars into string fields, so stage 2 (sentinels, NOT
  NULL defaults, varchar(n) truncation, error policies) is SHARED with
  ``CsvLoader`` verbatim;
* reject tolerance (REJECT_VALUE), discard/substitute/fail policies,
  single-pass audit counts — inherited;
* a malformed JSON line lands in ``_corrupt_record`` (PERMISSIVE mode),
  exactly like a wrong-column-count CSV row;
* a MISSING key is NULL — not an error — which is the JSONL
  schema-evolution convention (new fields appear in newer shards only);
  NOT NULL column specs turn those into typed defaults (L7).

100 TB shape: identical to the CSV path — the scan + clean is one fused
map-only pass per shard, shards parallelize across executors, and the
audit aggregate is a single extra reduce over the cached stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .csv_loader import ColumnSpec, CsvLoader, LoadOptions


class JsonlLoader(CsvLoader):
    """JSONL loader: ``CsvLoader`` with the staged read swapped for a
    schema-projected PERMISSIVE JSON scan; cleaning, error policies,
    reject tolerance, and audit are inherited unchanged."""

    def read_staged(
        self, path: str, columns: list[ColumnSpec], opts: LoadOptions
    ) -> DataFrame:
        reader = (
            self.spark.read.option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
        )
        if opts.compression:
            reader = reader.option("compression", opts.compression)
        schema_ddl = ", ".join(f"`{c.name}` string" for c in columns)
        schema_ddl += ", `_corrupt_record` string"
        return reader.schema(schema_ddl).json(path)
