"""Invariants of the driver contract the CORRECTNESS check depends
on. The driver grades exactly the FIRST 50 entries of queries()
each round — an accidental reorder can silently drop a query's only
chance at driver evidence (nearly happened in round 4 when a new
entry displaced mm_decode_jpeg mid-session).
"""

from __future__ import annotations

import ast

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_window_holds_all_rows_only_queries():
    """The 6 rows-only queries get only the weaker rows-only driver
    check — they must sit INSIDE the 50-slot window this round so
    each has driver evidence at least once."""
    first50 = set(list(QUERIES)[:50])
    rows_only = {k for k in QUERIES if k not in ORACLES}
    assert rows_only <= first50, rows_only - first50


def test_every_oracle_has_a_query_and_vice_versa_is_explicit():
    assert set(ORACLES) <= set(QUERIES)
    # every rows-only omission is one of the declared ones
    # (dedup_simhash graduated to a full equality oracle in r8;
    # dedup_semantic followed via in-query assertion booleans)
    declared = {"ann_lsh", "ann_ivf", "ann_pq"}
    assert {k for k in QUERIES if k not in ORACLES} == declared


def test_no_duplicate_keys_in_source_dict():
    """dict literals silently keep the LAST duplicate — a paste error
    can shadow a query without any runtime signal."""
    src = open(entrymod.__file__).read()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, dupes


def test_bench_headline_is_subset_of_queries():
    import bench

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
