"""IVF (inverted-file) approximate nearest neighbor search.

The scale path for ANN beyond hyperplane LSH: partition the corpus
into coarse cells with k-means, then search only the ``n_probe``
cells nearest each query.

- Training uses pyspark.ml KMeans (seeded) on a sample — the model
  is a tiny centroid matrix that ships to executors inside a
  pandas_udf closure.
- Cell assignment and probe-list computation are numpy-vectorized
  (centroid matrix × Arrow batch), map-only.
- The search is an equi-join on cell id: cost is
  |Q| x n_probe x avg_cell_size instead of |Q| x |corpus|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from etl_npl_pipeline_spark.operators.similarity import dot, l2_normalize


TRAIN_SAMPLE_CAP = 100_000


def _centroids(corpus: DataFrame, vec_col: str, n_clusters: int, seed: int) -> np.ndarray:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    # Coarse quantizers need only a corpus sample: centroid quality
    # saturates far below full-corpus size, while a full-corpus fit
    # at 100 TB would dominate the whole search. Deterministic
    # (seeded) sample capped at TRAIN_SAMPLE_CAP rows.
    n = train.count()
    if n > TRAIN_SAMPLE_CAP:
        train = train.sample(fraction=TRAIN_SAMPLE_CAP / n, seed=seed)
    model = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(train)
    return np.array(model.clusterCenters())


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF cells (k-means coarse quantizer).

    Recall knob: n_probe (cells per query). n_probe == n_clusters
    degenerates to exact brute force.
    """
    cents = _centroids(corpus, vec_col, n_clusters, seed)

    @F.pandas_udf("long")
    def assign_cell(vs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int64))

    @F.pandas_udf("array<long>")
    def probe_cells(vs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1)[:, :n_probe].astype(np.int64)
        return pd.Series(list(order))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        l2_normalize(F.col(vec_col)).alias("cv"),
        assign_cell(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        l2_normalize(F.col(vec_col)).alias("qv"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    cand = (
        q.join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
