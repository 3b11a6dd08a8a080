"""Skew-aware join: key salting.

AQE's skew-join splitting (enabled in session.py) handles most
skew at runtime; explicit salting is the tool when one side's hot
keys are known or AQE can't apply (e.g. aggregations, or joins
under stateful operators). Pattern:

- fact side: append a random-ish salt in [0, buckets) to the key
- dim side: explode each row into all `buckets` salted copies
- join on (key, salt) — the hot key's rows now spread over
  `buckets` reducers instead of one straggler task.

Salt derives from a hash of the whole fact row's key + a
monotonic id, not rand(), so the operator stays deterministic and
retry-safe (a rand() salt changes on task retry — a correctness
hazard with speculative execution).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
    fact_salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Join fact⋈dim on `on` with the fact side salted across
    `buckets` partitions per key.

    ``fact_salt_cols``: columns whose hash spreads the salt
    (defaults to all fact columns — any stable per-row variation
    works). The dim side is exploded `buckets`-fold, which is why
    this is for big-fact ⋈ small-dim shapes; for fact⋈fact skew,
    AQE's runtime splitting is the right tool.
    """
    salt_src = list(fact_salt_cols or fact.columns)
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(buckets))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = salted_fact.join(salted_dim, on=[on, "_salt"], how=how)
    return joined.drop("_salt")
