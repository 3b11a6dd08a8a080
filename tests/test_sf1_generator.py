"""Invariants of the sf1 replication generator (tools_make_sf1.py):
the scale point in sf1_top10.json / sf1_correctness.json is only
meaningful if the 10x dataset keeps FK integrity within replicas,
scales fact cardinalities exactly 10x, keeps fixed dims fixed, and
actually decorrelates document text across replicas. Pure-DuckDB
checks on a tiny 2-replica build — no Spark session needed."""

from __future__ import annotations

import importlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def sf1dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf1gen"))
    mod = importlib.import_module("tools_make_sf1")
    old_out, old_reps, old_src = mod.OUT, mod.REPLICAS, mod.SRC
    mod.OUT, mod.REPLICAS, mod.SRC = out, 2, "/root/testdata/sf0.001"
    try:
        mod.main()
    finally:
        mod.OUT, mod.REPLICAS, mod.SRC = old_out, old_reps, old_src
    return out


def _con(sf1dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "orders", "lineitem",
              "documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf1dir}/{t}.parquet'"
        )
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    return con


def test_cardinalities_scale_and_dims_stay_fixed(sf1dir):
    con = _con(sf1dir)
    for t in ("customer", "orders", "lineitem", "documents", "events"):
        n1 = con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        n0 = con.execute(f"SELECT COUNT(*) FROM src_{t}").fetchone()[0]
        assert n1 == 2 * n0, t
    for t in ("region", "nation"):
        n1 = con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        n0 = con.execute(f"SELECT COUNT(*) FROM src_{t}").fetchone()[0]
        assert n1 == n0, t


def test_fk_integrity_within_replicas(sf1dir):
    con = _con(sf1dir)
    orphans = con.execute(
        "SELECT COUNT(*) FROM orders o LEFT JOIN customer c "
        "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0
    orphans = con.execute(
        "SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"
    ).fetchone()[0]
    assert orphans == 0


def test_keys_unique_across_replicas(sf1dir):
    con = _con(sf1dir)
    for t, k in (("orders", "o_orderkey"), ("customer", "c_custkey"),
                 ("documents", "doc_id"), ("events", "event_id")):
        n, nd = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT {k}) FROM {t}"
        ).fetchone()
        assert n == nd, t


def test_documents_decorrelated_but_length_preserved(sf1dir):
    con = _con(sf1dir)
    # replica 1 text differs from replica 0 (cipher applied) ...
    same = con.execute(
        "SELECT COUNT(*) FROM documents a JOIN documents b "
        "ON b.doc_id = a.doc_id + 1000000 AND b.text = a.text "
        "WHERE a.doc_id < 1000000 AND length(a.text) > 0"
    ).fetchone()[0]
    total = con.execute(
        "SELECT COUNT(*) FROM documents WHERE doc_id < 1000000 "
        "AND length(text) > 0"
    ).fetchone()[0]
    assert same < total * 0.05, (same, total)
    # ... but n_chars stays truthful (cipher is length-preserving)
    bad = con.execute(
        "SELECT COUNT(*) FROM documents WHERE length(text) <> n_chars"
    ).fetchone()[0]
    base_bad = con.execute(
        "SELECT COUNT(*) FROM src_documents WHERE length(text) <> n_chars"
    ).fetchone()[0]
    assert bad == 2 * base_bad  # no new length drift introduced
