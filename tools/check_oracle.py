"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares it
against oracle_sql() via DuckDB: row count, column-name set, and an
order-insensitive exact value comparison (rows sorted after
stringifying). Usage:

    python tools/check_oracle.py [query ...]
    python tools/check_oracle.py --json CORRECTNESS_LOCAL_r04.json

With --json, writes a driver-shaped artifact covering EVERY registry
entry (VERDICT r3 ask #3) — including the ones past the external
driver's 50-entry recording window — so each query has committed,
diffable evidence each round: oracle-backed entries get
rows/schema/values verdicts, rows-only entries get spark_rows.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from bdqc_spark.session import build_session  # noqa: E402
from bdqc_spark.sources.tables import TABLE_NAMES  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if isinstance(v, float):
            return f"{v:.9g}"
        if v is None or v != v:  # NaN/None
            return "<NULL>"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(str(x) for x in v) + "]"
        return str(v)

    out = df.map(cell)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = set(args)
    report: dict[str, dict] = {}
    spark = build_session(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spark_pd = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            report[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                            "spark_rows": None, "oracle_rows": None, "err": "spark_raised"}
            n_fail += 1
            continue
        # The driver canonicalizer sorts cells via pandas; list/array cells are
        # unhashable and crash it (r1: clips_pipeline_decisions). Flag them in
        # every query, oracle-checked or rows-only.
        listcols = [
            c
            for c in spark_pd.columns
            if spark_pd[c].dtype.kind == "O"
            and spark_pd[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "__array__")).any()
        ]
        if listcols:
            print(f"FAIL {name}: list-valued cells in {listcols} would crash the driver canonicalizer")
            report[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                            "spark_rows": len(spark_pd), "oracle_rows": None, "err": "list_cells"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spark_pd)} rows  ({time.time()-t0:.1f}s)")
            report[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                            "spark_rows": len(spark_pd), "oracle_rows": None, "err": "no_oracle"}
            n_rows_only += 1
            continue
        try:
            duck_pd = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            report[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                            "spark_rows": len(spark_pd), "oracle_rows": None, "err": "oracle_raised"}
            n_fail += 1
            continue
        problems = []
        if len(spark_pd) != len(duck_pd):
            problems.append(f"rowcount {len(spark_pd)} vs {len(duck_pd)}")
        if sorted(spark_pd.columns) != sorted(duck_pd.columns):
            problems.append(f"columns {sorted(spark_pd.columns)} vs {sorted(duck_pd.columns)}")
        else:
            # The driver hashes str(cell); int64 5 renders "5" but float64
            # renders "5.0" — same values, different hash. Flag any column
            # where one side is float and the other is integer (the DuckDB
            # SUM(INT)->HUGEINT->float64 artifact that caused 3 r1 reds).
            for c in spark_pd.columns:
                sk, dk = spark_pd[c].dtype.kind, duck_pd[c].dtype.kind
                if {sk, dk} == {"i", "f"} or {sk, dk} == {"u", "f"}:
                    problems.append(
                        f"dtype mismatch on '{c}': spark {spark_pd[c].dtype} vs duck "
                        f"{duck_pd[c].dtype} (driver hash would differ)"
                    )
        if not problems:
            a, b = canon(spark_pd), canon(duck_pd)
            if not a.equals(b):
                neq = (a != b).any(axis=1)
                problems.append(f"values differ in {int(neq.sum())}/{len(a)} rows")
                ex = a[neq].head(3).to_dict("records"), b[neq].head(3).to_dict("records")
                problems.append(f"spark={ex[0]}\n  duck={ex[1]}")
        rows_ok = len(spark_pd) == len(duck_pd)
        schema_ok = sorted(spark_pd.columns) == sorted(duck_pd.columns)
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": not problems, "spark_rows": len(spark_pd),
                        "oracle_rows": len(duck_pd), "err": None}
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for prob in problems[1:]:
                print("  " + prob)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spark_pd)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_path} ({len(report)} entries)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
