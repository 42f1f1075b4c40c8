"""PCA projection / whitening for embedding columns.

Embedding-based curation (SemDeDup d12, near-dup d05, ANN s01–s08) works
on raw model embeddings whose coordinates are heavily correlated; PCA
whitening decorrelates them so cosine/L2 distances weight directions
equally (Abbas et al. 2023 report SemDeDup quality is sensitive to the
embedding space's conditioning) and lets ANN indexes work in a truncated
k-dim space at a fraction of the cost.

Spark-first shape — this is NOT a driver-side numpy fit:

* mean + principal components come from ``pyspark.ml.feature.PCA`` over an
  ``array_to_vector`` column: MLlib's RowMatrix covariance is a single
  distributed grammian pass (tree-aggregated d×d partials), eigen-solved
  on the driver — d×d is driver-sized for any real embedding dim.
* MLlib's PCA transform does NOT center its input, so the model here
  centers explicitly (``Summarizer.mean`` one-pass) before both fit and
  transform — otherwise component 1 mostly encodes the corpus mean.
* whitening scales each projected coordinate by 1/σ (σ from one
  ``Summarizer.std`` pass over the projected frame), making the projected
  covariance ≈ I (pytest-asserted).
* ``transform`` is map-only: center (zip_with), project (ml transform),
  scale (element-wise literal) — no shuffle, no Python row loop.

No DuckDB oracle (eigenvectors are sign/rotation ambiguous across
libraries); invariants are pytest-proven instead: projected variances are
sorted descending, whitened covariance ≈ I, transform is deterministic and
repartition-stable, truncation error shrinks as k grows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _center(col: Column, mean: list[float]) -> Column:
    m = F.array(*[F.lit(float(v)) for v in mean])
    return F.zip_with(col.cast("array<double>"), m, lambda x, mu: x - mu)


@dataclass
class PcaModel:
    """Fitted projector: ``transform`` annotates a frame with the k-dim
    projection, map-only."""

    mean: list[float]
    k: int
    whiten: bool
    scale: list[float]  # 1.0s unless whitened
    _ml_model: object  # pyspark.ml.feature.PCAModel over centered vectors

    def transform(
        self, df: DataFrame, col: str = "embedding", out_col: str = "projected"
    ) -> DataFrame:
        from pyspark.ml.functions import array_to_vector, vector_to_array

        centered = df.withColumn("__pca_in", array_to_vector(_center(F.col(col), self.mean)))
        self._ml_model.setInputCol("__pca_in").setOutputCol("__pca_out")
        proj = self._ml_model.transform(centered)
        s = F.array(*[F.lit(float(v)) for v in self.scale])
        return proj.withColumn(
            out_col,
            F.zip_with(vector_to_array("__pca_out"), s, lambda x, w: x * w),
        ).drop("__pca_in", "__pca_out")


def fit_pca(
    df: DataFrame, col: str = "embedding", k: int = 8, whiten: bool = False
) -> PcaModel:
    """Fit a centered PCA (optionally whitened) on an ``array<float>``
    column.  Two distributed passes (mean, then grammian) + one more for
    the whitening scales; everything driver-side is d-, d×d- or k-sized."""
    from pyspark.ml.feature import PCA as MlPca
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    vecs = df.select(array_to_vector(F.col(col).cast("array<double>")).alias("__v"))
    mean = [float(x) for x in vecs.select(Summarizer.mean(F.col("__v"))).first()[0]]

    centered = df.select(array_to_vector(_center(F.col(col), mean)).alias("__pca_in"))
    ml_model = MlPca(k=k, inputCol="__pca_in", outputCol="__pca_out").fit(centered)

    scale = [1.0] * k
    if whiten:
        projected = ml_model.transform(centered)
        std = projected.select(Summarizer.std(F.col("__pca_out"))).first()[0]
        scale = [1.0 / float(s) if float(s) > 0 else 0.0 for s in std]
    return PcaModel(mean=mean, k=k, whiten=whiten, scale=scale, _ml_model=ml_model)
