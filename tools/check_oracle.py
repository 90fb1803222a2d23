#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run the
matching oracle SQL (from oracle_sql.json) in DuckDB over the sfDir tables,
sort columns by name + rows by all columns, and compare values exactly.
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def norm_type(t: pa.DataType) -> str:
    """Canonical type label, calibrated to the driver's hash (r6 evidence):
    int32 vs int64 passed the driver, int64 vs HUGEINT (arrow decimal128)
    failed — so widths within a kind collapse, but KIND changes (int vs
    float vs decimal vs string, e.g. DuckDB SUM/AVG widening) stay visible."""
    if pa.types.is_dictionary(t):
        return norm_type(t.value_type)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(
            f"{f.name}:{norm_type(f.type)}" for f in t) + ">"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    return str(t)


def schema_types(schema: pa.Schema) -> dict:
    return {f.name: norm_type(f.type) for f in schema}


def main(sf_dir: str, out_dir: str) -> int:
    import os
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # multi-file fixture layout (MakeFixture): <name>.parquet/ is a
        # DIRECTORY of clustered part files — the reference's
        # register-a-file-set table shape
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    # mirror Tables.normalizeEventsTs: a fixture written from a session
    # with nanosAsLong carries events.ts as BIGINT nanos — convert with
    # the same ns→us floor division the Spark loader applies
    ts_type = con.execute(
        "SELECT typeof(ts) FROM events LIMIT 1").fetchone()
    if ts_type and ts_type[0] == "BIGINT":
        p = f"{sf_dir}/events.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(
            f"CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
            f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet({src})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        spark_types = schema_types(pq.read_schema(files[0]))
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            want_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        duck_types = schema_types(want_tbl.schema)
        want = canon(want_tbl.to_pandas())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        # HARD FAIL on any decimal128 output column on EITHER side: the
        # driver's hash distinguishes Spark DECIMAL(38,0) from DuckDB
        # HUGEINT even when labels and values agree (r10 verdict —
        # doc_interleave/q_mann_whitney shipped green here, red at the
        # driver). Wide-integer results must be emitted as strings or
        # range-checked BIGINTs; this replica must never under-report.
        dec_cols = [c for c in got.columns
                    if spark_types[c].startswith("decimal")
                    or duck_types[c].startswith("decimal")]
        if dec_cols:
            detail = ", ".join(
                f"{c}: spark={spark_types[c]} duck={duck_types[c]}"
                for c in dec_cols)
            print(f"FAIL {name}: decimal output column ({detail}) — "
                  f"driver hash distinguishes decimal128 representations; "
                  f"cast to string or bigint")
            n_bad += 1
            continue
        type_bad = [c for c in got.columns if spark_types[c] != duck_types[c]]
        if type_bad:
            detail = ", ".join(
                f"{c}: spark={spark_types[c]} duck={duck_types[c]}" for c in type_bad)
            print(f"FAIL {name}: type mismatch ({detail})")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = np.array_equal(a.astype(float), b.astype(float), equal_nan=True)
            else:
                eq = list(map(str, a)) == list(map(str, b))
            if not eq:
                bad_cols.append(c)
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                m = got[c].to_numpy() != want[c].to_numpy()
                i = int(np.argmax(m))
                print(f"   {c}[{i}]: spark={got[c].iloc[i]!r} duck={want[c].iloc[i]!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} oracle queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
