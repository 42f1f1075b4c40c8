"""Line-extract utility — load-failure forensics (SURVEY §2.1 S6).

The reference ships a C# tool that prints lines K..K+N of a huge delimited
file so operators can inspect the exact rows a load rejected
(samples/utility/Extract/extract/Program.cs:19-91).  Distributed version:
``textFile`` preserves line order per file and ``zipWithIndex`` assigns
global line numbers (one lightweight count job over partition sizes), so the
slice works on files far larger than driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def extract_lines(
    spark: SparkSession, path: str, start: int, count: int
) -> DataFrame:
    """Lines ``[start, start+count)`` (0-based) of a text file as
    (line_no, line) rows."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    end = start + count
    return spark.createDataFrame(
        rdd.filter(lambda t: start <= t[1] < end).map(lambda t: (t[1], t[0])),
        "line_no long, line string",
    )
