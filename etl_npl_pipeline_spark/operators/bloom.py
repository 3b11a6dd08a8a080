"""Bloom-filter membership pre-filtering for decontamination.

L22 (`dedup_decontaminate`) broadcasts the benchmark n-gram STRINGS
to a map-side semi-join — right up to the point where the eval suite
itself is large (a few hundred million grams broadcast as strings is
gigabytes per executor). The Bloom path compresses the membership
set to an m-bit array: 2^20 bits = 128 KB regardless of gram count,
at a tunable false-positive rate (k hash functions; FP ≈ (1-e^(-kn/m))^k).

Guarantees, by construction:
- NO false negatives — a gram in the build set always probes to all
  bits set, so a Bloom pre-filter can never lose real contamination.
- False positives are bounded and removed by an exact verify stage
  over the (tiny) surviving subset — the same candidates-then-verify
  shape as the MinHash path, so the final output is exact and a SQL
  oracle can replay it.

Spark shape: positions are computed JVM-side (``xxhash64`` stays in
whole-stage codegen; one seed per hash function); only the final
bit-test runs in an Arrow ``pandas_udf`` against the broadcast numpy
bit array. Build collects DISTINCT positions (≤ |grams| × k longs,
bounded and documented), packs them on the driver, and ships the
packed bits in the closure — at most m/8 bytes, never O(grams).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_M_BITS = 1 << 20
DEFAULT_N_HASHES = 4


def _positions(gram_col: str, m_bits: int, n_hashes: int) -> list:
    """k hash positions per gram, JVM-side: xxhash64 seeded by a
    distinct literal per function, folded into [0, m_bits)."""
    return [
        F.pmod(F.xxhash64(F.lit(h), F.col(gram_col)), F.lit(m_bits))
        for h in range(n_hashes)
    ]


def build_bloom_bits(
    grams: DataFrame,
    gram_col: str = "g",
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> np.ndarray:
    """Build the packed bit array from a gram DataFrame.

    Distributed hash, driver-side pack: the collect is DISTINCT bit
    positions — capped at m_bits rows no matter how many grams went
    in (positions saturate), so driver memory is O(m_bits), not
    O(grams). Returns uint64[m_bits/64]."""
    pos = (
        grams.select(F.explode(F.array(*_positions(gram_col, m_bits, n_hashes))).alias("p"))
        .distinct()
        .collect()
    )
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    idx = np.array([r["p"] for r in pos], dtype=np.int64)
    np.bitwise_or.at(
        bits, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64)
    )
    return bits


def bloom_maybe_member(
    grams: DataFrame,
    bits: np.ndarray,
    gram_col: str = "g",
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Append ``maybe`` — true iff every hash position's bit is set.
    Map-only; the bit array rides the UDF closure (m/8 bytes)."""

    @F.pandas_udf("boolean")
    def probe(ps: pd.Series) -> pd.Series:
        mat = np.vstack(ps.to_numpy()).astype(np.int64)  # (B, k)
        hit = (
            bits[mat >> 6] >> (mat & 63).astype(np.uint64)
        ).astype(np.uint64) & np.uint64(1)
        return pd.Series(hit.all(axis=1))

    return grams.withColumn(
        "maybe", probe(F.array(*_positions(gram_col, m_bits, n_hashes)))
    )
