#!/usr/bin/env python
"""Density-stationary SimHash scale probe (r11, VERDICT r9 #2 / r10 #6).

The sf1 replication showed dedup_simhash shuffle bytes ×21.7 at ×10
docs — adjudicated (sf1_top30.json) as TRUE near-pair density of the
rotation-cipher replicas: the ×10 corpus has ×42 genuine hamming≤7
pairs, and an exact verifier cannot confirm ×42 real pairs with less
than ×42 verify work. That adjudication makes a testable prediction:
on a ×10 corpus whose true-pair density is HELD at sf0.1's rate, the
byte ratio collapses to ≈×10 (the postings' own linear growth).

This probe builds exactly that corpus and measures it:

1. For each of the 26 rotation ciphers (the sf1 generator's family),
   count the within-replica hamming≤7 pair population with DuckDB's
   brute-force simhash replay (the dedup_simhash oracle's `hammed`
   CTE — no blocking, pure ground truth).
2. Pick the 10 ciphers whose pair counts are CLOSEST to replica 0's
   (identity) count, so each replica contributes ≈ the sf0.1 pair
   population and the ×10 corpus has ≈×10 true pairs. Cross-replica
   pairs are structurally absent (disjoint vocabularies — verified by
   the sf1 build's own adjudication).
3. Materialize documents.parquet from those 10 replicas (same key
   shifts / length-preserving translate as tools_make_sf1.py) into
   .tmp/sf1_density, alongside symlink-free copies of the other
   tables dedup_simhash's _docs loader needs.
4. Run dedup_simhash steady-state on the density-stationary build and
   on sf0.1 in the same process, record shuffle bytes, and publish
   the ratio into sf1_top30.json["superlinear_adjudications"]
   ["dedup_simhash_density_probe"].

PASS = byte ratio within [7, 14] (≈×10 with parquet-batch and
partition-count slack), confirming the ×21.7 was data density, not a
quadratic blocking defect.

Run: python tools_simhash_density_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
OUT = "/root/repo/.tmp/sf1_density"
DOC_SHIFT = 1_000_000
MAX_HAMMING = 7
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def cipher(k: int) -> tuple[str, str]:
    """The sf1 generator's length-preserving rotation family."""
    rot = ALPHA[k:] + ALPHA[:k]
    return ALPHA + ALPHA.upper(), rot + rot.upper()


# the dedup_simhash oracle's signature + brute-force hamming stages,
# parameterized by a translate() cipher on text
def _pair_count_sql(k: int) -> str:
    src, dst = cipher(k)
    return f"""
WITH toks AS (
    SELECT doc_id AS doc,
           unnest(regexp_split_to_array(
               trim(translate(text, '{src}', '{dst}')), '\\s+')) AS tok
    FROM read_parquet('{SRC}/documents.parquet')
    WHERE text IS NOT NULL
),
hb AS (
    SELECT doc,
           ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
           ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
    FROM toks
),
bitsums AS (
    SELECT doc, j,
           2 * SUM(CASE WHEN j < 32 THEN (lo >> j) & 1
                        ELSE (hi >> (j - 32)) & 1 END) - COUNT(*) AS s
    FROM hb, range(0, 64) t(j)
    GROUP BY doc, j
),
sigchunks AS (
    SELECT doc, j // 16 AS chunk,
           SUM(CASE WHEN s > 0 THEN 1::BIGINT << (j % 16) ELSE 0 END) AS cv
    FROM bitsums GROUP BY doc, j // 16
)
SELECT COUNT(*) FROM (
    SELECT sa.doc, sb.doc
    FROM sigchunks sa
    JOIN sigchunks sb ON sb.chunk = sa.chunk AND sa.doc < sb.doc
    GROUP BY 1, 2
    HAVING SUM(bit_count(xor(sa.cv, sb.cv))) <= {MAX_HAMMING}
)
"""


def main() -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    # --- 1-2: per-cipher true-pair census, pick the 10 nearest ----
    counts: dict[int, int] = {}
    for k in range(26):
        t0 = time.time()
        counts[k] = con.execute(_pair_count_sql(k)).fetchone()[0]
        print(f"cipher k={k}: {counts[k]} hamming<=7 pairs "
              f"({time.time() - t0:.1f}s)", flush=True)
    base = counts[0]
    chosen = sorted(range(26), key=lambda k: (abs(counts[k] - base), k))[:10]
    chosen.sort()
    if 0 not in chosen:  # replica 0 must stay the identity anchor
        chosen = [0] + chosen[:9]
    total = sum(counts[k] for k in chosen)
    print(f"base(k=0)={base}; chosen={chosen}; "
          f"total={total} ({total / base:.2f}x base, target 10x)",
          flush=True)

    # --- 3: materialize the density-stationary build --------------
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    selects = []
    for i, k in enumerate(chosen):
        src, dst = cipher(k)
        selects.append(
            f"SELECT doc_id + {i * DOC_SHIFT} AS doc_id, "
            f"translate(text, '{src}', '{dst}') AS text, "
            "lang, source, n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO "
        f"'{OUT}/documents.parquet' (FORMAT PARQUET)"
    )
    print(f"wrote {OUT}/documents.parquet", flush=True)

    # --- 4: measure ------------------------------------------------
    # Two readings per corpus: the DEFAULT plan (what bench/sf1
    # harnesses record) and with broadcast joins DISABLED. The
    # default baseline at sf0.1 is tiny enough that AQE broadcasts
    # the verify-stage token joins — their bytes never hit the
    # shuffle counters — while the x10 corpus crosses the threshold
    # and shuffles them, so the default ratio mixes data growth with
    # a join-STRATEGY transition. The forced-shuffle reading is the
    # apples-to-apples scaling measurement.
    import __spark_entry__ as entrymod
    from etl_npl_pipeline_spark.metrics import run_with_metrics
    from etl_npl_pipeline_spark.session import get_spark

    spark = get_spark("simhash-density-probe")
    fn = entrymod.queries()["dedup_simhash"]

    def steady(sf_dir: str) -> dict:
        run_with_metrics(spark, fn(spark, sf_dir))  # cold
        return run_with_metrics(spark, fn(spark, sf_dir))

    readings: dict[str, dict] = {}
    for mode, thresh in [("default", None), ("no_broadcast", "-1")]:
        if thresh is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", thresh
            )
        m01 = steady(SRC)
        mden = steady(OUT)
        readings[mode] = {
            "shuffle_bytes_sf01": m01["shuffle_write_bytes"],
            "shuffle_bytes_density_x10": mden["shuffle_write_bytes"],
            "shuffle_byte_ratio_x10": round(
                mden["shuffle_write_bytes"]
                / max(1, m01["shuffle_write_bytes"]), 2
            ),
            "wall_sf01_sec": m01["wall_sec"],
            "wall_density_sec": mden["wall_sec"],
        }
        print(mode, json.dumps(readings[mode]), flush=True)
    ratio = readings["no_broadcast"]["shuffle_byte_ratio_x10"]
    result = {
        "question": "is dedup_simhash's x21.7 sf1 byte growth data "
                    "density or a quadratic blocking defect?",
        "method": "x10 corpus from the 10 rotation ciphers whose "
                  "within-replica hamming<=7 pair counts are closest "
                  "to replica 0's (DuckDB brute-force census), so "
                  "true-pair density is stationary at sf0.1's rate; "
                  "measured with default AQE joins AND with broadcast "
                  "disabled (uniform join strategy at both scales)",
        "pair_counts_by_cipher": {str(k): counts[k] for k in sorted(counts)},
        "chosen_ciphers": chosen,
        "true_pairs_base": base,
        "true_pairs_density_corpus": total,
        "true_pairs_ratio": round(total / base, 2),
        "readings": readings,
        "prediction": "uniform-strategy ratio ~ true_pairs_ratio "
                      "(postings + verify both linear) if the r9 "
                      "adjudication is right",
        "verdict": (
            "density_confirmed_linear" if 7.0 <= ratio <= 14.0
            else "UNEXPECTED - investigate blocking"
        ),
    }
    print(json.dumps(result, indent=1), flush=True)

    top30 = "/root/repo/sf1_top30.json"
    doc = json.load(open(top30))
    doc.setdefault("superlinear_adjudications", {})[
        "dedup_simhash_density_probe"
    ] = result
    json.dump(doc, open(top30, "w"), indent=1, sort_keys=True)
    print("published into sf1_top30.json", flush=True)


if __name__ == "__main__":
    main()
