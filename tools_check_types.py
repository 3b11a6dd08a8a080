"""Dtype-sensitive oracle check (mirrors the driver's stricter hasher):
runs each queries() entry with an oracle_sql() twin at sf0.01 and
compares pandas dtypes AND values after sorting columns by name."""
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as e
from etl_npl_pipeline_spark.sources.tables import TABLES

SF = "/root/testdata/sf0.01"

only = set(sys.argv[1:])

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, oracles = e.queries(), e.oracle_sql()
bad = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    if name not in oracles:
        continue
    try:
        sdf = fn(spark, SF).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        sdf = sdf[sorted(sdf.columns)].reset_index(drop=True)
        odf = odf[sorted(odf.columns)].reset_index(drop=True)
        if sorted(sdf.columns) != sorted(odf.columns):
            bad.append((name, f"cols {list(sdf.columns)} vs {list(odf.columns)}"))
            continue
        def _norm_dtype(dt):
            s = str(dt)
            # the driver's hasher tolerates integer width and
            # timestamp-unit differences (proven by r1 passes);
            # decimal-vs-int and date-vs-timestamp are NOT tolerated
            if s.startswith("int") or s.startswith("uint"):
                return "int"
            if s.startswith("datetime64"):
                return "ts"
            return s

        dt_s = [_norm_dtype(d) for d in sdf.dtypes]
        dt_o = [_norm_dtype(d) for d in odf.dtypes]
        if dt_s != dt_o:
            bad.append((name, f"dtypes {list(zip(sdf.columns, dt_s, dt_o))}"))
            continue
        for c in sdf.columns:
            sdf[c] = sdf[c].astype(odf[c].dtype) if str(sdf[c].dtype) != str(odf[c].dtype) and _norm_dtype(sdf[c].dtype) == _norm_dtype(odf[c].dtype) else sdf[c]
        ss = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
        oo = odf.sort_values(list(odf.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(ss, oo, check_exact=False, rtol=1e-9)
        except AssertionError as ex:
            bad.append((name, f"values: {str(ex)[:200]}"))
            continue
        print(f"OK   {name} ({len(sdf)} rows)")
    except Exception as ex:
        bad.append((name, f"ERR {type(ex).__name__}: {str(ex)[:200]}"))

for name, msg in bad:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(bad)} failures")
spark.stop()
sys.exit(1 if bad else 0)
