"""Bit-pattern unit tests for the Morton interleave + a locality
sanity check: z-ordered neighbors share a dimension value more often
than a random order would."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators.zorder import hash16, morton_key


def _z(spark, a, b, bits=16):
    return (
        spark.range(1)
        .select(
            morton_key(
                F.lit(a).cast("long"), F.lit(b).cast("long"), bits=bits
            ).alias("z")
        )
        .collect()[0]["z"]
    )


def test_morton_known_patterns(spark):
    # bit i of a -> position 2i (even), bit i of b -> 2i+1 (odd)
    assert _z(spark, 0, 0) == 0
    assert _z(spark, 1, 0) == 0b01
    assert _z(spark, 0, 1) == 0b10
    assert _z(spark, 0b11, 0) == 0b0101
    assert _z(spark, 0, 0b11) == 0b1010
    assert _z(spark, 0b11, 0b11) == 0b1111
    assert _z(spark, 0xFFFF, 0xFFFF) == 0xFFFFFFFF
    # a=2,b=1 -> a bit1@pos2, b bit0@pos1 -> 0b110
    assert _z(spark, 2, 1) == 0b110


def test_zorder_clusters_both_dimensions(spark, sf_dir):
    """Along the z-curve, adjacent rows agree on lang or source far
    more often than the shuffled baseline — the locality that turns
    into min/max file pruning on either column at write time."""
    from etl_npl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    zkey = morton_key(hash16("lang"), hash16("source"))
    rows = (
        docs.select("lang", "source", zkey.alias("z"))
        .orderBy("z", "lang", "source")
        .collect()
    )

    def adjacency(rs):
        return sum(
            (x["lang"] == y["lang"]) or (x["source"] == y["source"])
            for x, y in zip(rs, rs[1:])
        ) / max(len(rs) - 1, 1)

    z_adj = adjacency(rows)
    import random

    rnd = rows[:]
    random.Random(0).shuffle(rnd)
    assert z_adj > adjacency(rnd) + 0.2, (z_adj, adjacency(rnd))
