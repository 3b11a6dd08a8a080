"""Product-quantization (PQ) approximate nearest neighbor search.

The memory-scale path for ANN: each corpus vector is compressed to
``m`` one-byte codes (one per dimension subspace, each quantized
against its own tiny k-means codebook), and search runs Asymmetric
Distance Computation (ADC) — the query stays full-precision, each
candidate's dot product is reconstructed as ``m`` table lookups on
its codes. At 64-dim float32 → 16 bytes/vector that is a 16×
memory/shuffle reduction; a 100 TB embedding corpus becomes ~6 TB of
codes that fit executor memory where raw vectors never would
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011 — public method, clean-room implementation).

Spark shape:
- Training: driver-side numpy k-means per subspace on a bounded
  sample (reuses the IVF trainer); the codebook is a tiny
  (m, k, d/m) tensor that ships inside pandas_udf closures.
- Encoding: one map-only Arrow pass — argmin against each subspace
  codebook, vectorized over the batch.
- Search: the query set (bounded by contract) collects to the
  driver, its per-subspace lookup tables broadcast in a closure;
  ``mapInPandas`` over the CODES (not the vectors) emits per-batch
  partial top-k, so the only shuffle is candidates
  (|Q| × k′ × partitions rows), never the corpus.
- Optional exact re-rank: the ADC top-k′ candidates join back to
  the full-precision vectors (broadcast of a tiny id set) and the
  true cosine re-orders them — the standard IVFADC+R refinement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from etl_npl_pipeline_spark.operators.ivf import (
    TRAIN_SAMPLE_CAP,
    _kmeans_lloyd,
)
from etl_npl_pipeline_spark.operators.similarity import l2_normalize, pair_dot


def _norm_rows(vs: pd.Series) -> np.ndarray:
    m = np.concatenate(vs.to_numpy()).astype(np.float64).reshape(len(vs), -1)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    m_subspaces: int,
    k_codes: int,
    seed: int,
) -> np.ndarray:
    """Per-subspace k-means codebooks, trained on a bounded
    L2-normalized driver sample. Returns (m, k, d/m)."""
    train = corpus.select(F.col(vec_col).alias("v"))
    n = train.count()
    if n > TRAIN_SAMPLE_CAP:
        train = train.sample(fraction=TRAIN_SAMPLE_CAP / n, seed=seed)
    mat = np.array([row["v"] for row in train.collect()], dtype=np.float64)
    if mat.size == 0:
        # empty corpus -> empty codebooks (no dim to subdivide);
        # pq_encode over zero subspaces emits empty code arrays
        return np.zeros((0, 0, 0))
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    dim = mat.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    d_sub = dim // m_subspaces
    books = np.empty((m_subspaces, k_codes, d_sub))
    for s in range(m_subspaces):
        sub = mat[:, s * d_sub : (s + 1) * d_sub]
        # distinct seed per subspace so k-means++ draws differ
        books[s] = _kmeans_lloyd(np.ascontiguousarray(sub), k_codes, seed + s)
    return books


def pq_encode(
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress each vector to ``m`` small-int codes (argmin against
    each subspace codebook). Map-only, batch-vectorized."""
    m_sub, _, d_sub = books.shape

    @F.pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        mat = _norm_rows(vs)
        codes = np.empty((len(mat), m_sub), dtype=np.int32)
        for s in range(m_sub):
            sub = mat[:, s * d_sub : (s + 1) * d_sub]
            # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
            d = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
            codes[:, s] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return corpus.select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("codes")
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m_subspaces: int = 16,
    k_codes: int = 16,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via PQ codes + ADC, exact re-rank of
    the top ``k * rerank_factor`` ADC candidates.

    Recall knobs: m_subspaces × k_codes (code resolution) and
    rerank_factor (how deep the exact pass looks). ADC scores only
    CHOOSE candidates; the emitted cos_sim is exact."""
    books = train_pq_codebooks(corpus, vec_col, m_subspaces, k_codes, seed)
    codes = pq_encode(corpus, books, id_col, vec_col)

    # Bounded by contract: the query side of ANN search is small
    # (here ANN_N_QUERIES); LUTs are (|Q|, m, k) floats in a closure.
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
    ).collect()
    q_ids = np.array([r["query_id"] for r in qrows])
    q_mat = np.array([r["v"] for r in qrows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    d_sub = books.shape[2]
    # lut[q, s, c] = dot(query_q subspace_s, codebook_s code_c)
    lut = np.einsum(
        "qsd,skd->qsk",
        q_mat.reshape(len(q_mat), m_subspaces, d_sub),
        books,
    )
    k_prime = k * rerank_factor

    def partial_topk(it):
        for pdf in it:
            if not len(pdf):
                continue
            cm = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)  # (B, m)
            nid = pdf["neighbor_id"].to_numpy()
            rows_q, rows_n, rows_s = [], [], []
            sub_idx = np.arange(m_subspaces)
            for qi in range(len(q_ids)):
                adc = lut[qi][sub_idx[None, :], cm].sum(axis=1)  # (B,)
                top = np.argpartition(-adc, min(k_prime, len(adc) - 1))[:k_prime]
                rows_q.append(np.full(len(top), q_ids[qi]))
                rows_n.append(nid[top])
                rows_s.append(adc[top])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(rows_q),
                    "neighbor_id": np.concatenate(rows_n),
                    "adc": np.concatenate(rows_s),
                }
            )

    partials = codes.mapInPandas(
        partial_topk, schema="query_id long, neighbor_id long, adc double"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    cand = (
        partials.withColumn("r", F.row_number().over(w_adc))
        .where(F.col("r") <= k_prime)
        .select("query_id", "neighbor_id")
    )

    # exact re-rank: tiny candidate set joins back to true vectors
    qv = queries.select(
        F.col(id_col).alias("query_id"), l2_normalize(F.col(vec_col)).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        l2_normalize(F.col(vec_col)).alias("cv"),
    )
    exact = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id", pair_dot(F.col("qv"), F.col("cv")).alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
