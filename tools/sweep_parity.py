"""Standalone replica of the driver's correctness gate at an arbitrary SF.

Usage: python tools/sweep_parity.py [SF_DIR]

Runs every key present in BOTH __spark_entry__.queries() and .oracle_sql()
through Spark and DuckDB on the same parquet tables and compares row count,
column names, and order-insensitive values (the driver's contract). Keys in
queries() without an oracle get a rows-only check (runs, >=0 rows).

Prints one line per key and a final summary; exit code 1 on any failure.
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from adk_noui_vectordb_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _canon(rows, colnames):
    """EXACT replica of the driver's canonicalizer: a pandas DataFrame with
    columns sorted by name, rows sorted by ``sort_values`` over ALL columns.
    ``sort_values`` raises ``TypeError: unhashable type`` on list/array
    cells — deliberately NOT worked around, so any query emitting a bare
    array column fails here the same way it fails the driver (the round-2
    ``embed_quantize_int8`` crash class)."""
    df = pd.DataFrame(rows, columns=list(colnames))
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _cells(df):
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(
            "NaN" if isinstance(v, float) and math.isnan(v) else v
            for v in row
        ))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # optional key filter (argv[2:]): spot-check just-edited keys without
    # paying for the full 600 s sweep — the full no-args sweep stays the
    # round-close gate.
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(queries)
        if unknown:
            print(f"unknown keys: {sorted(unknown)}", flush=True)
            return 1
        queries = {k: queries[k] for k in only}
    failures = []
    t_all = time.time()
    for key in sorted(queries):
        t0 = time.time()
        try:
            sdf = queries[key](spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            if key not in oracles:
                # still canonicalize, so rows-only queries with a shape the
                # driver's pandas path cannot sort fail here too
                _canon(spark_rows, spark_cols)
                print(f"ROWSONLY {key}: {len(spark_rows)} rows "
                      f"({time.time() - t0:.1f}s)", flush=True)
                continue
            res = duck.execute(oracles[key])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            problems = []
            if sorted(spark_cols) != sorted(duck_cols):
                problems.append(f"cols spark={spark_cols} duck={duck_cols}")
            if len(spark_rows) != len(duck_rows):
                problems.append(
                    f"rows spark={len(spark_rows)} duck={len(duck_rows)}")
            if not problems:
                s_norm = _cells(_canon(spark_rows, spark_cols))
                d_norm = _cells(_canon(duck_rows, duck_cols))
                bad = [(i, a, b) for i, (a, b) in
                       enumerate(zip(s_norm, d_norm)) if a != b]
                if bad:
                    problems.append(f"{len(bad)} value mismatches; "
                                    f"first: {bad[:2]}")
            if problems:
                failures.append(key)
                print(f"FAIL {key}: {'; '.join(problems)}", flush=True)
            else:
                print(f"PASS {key}: {len(spark_rows)} rows "
                      f"({time.time() - t0:.1f}s)", flush=True)
        except Exception:
            failures.append(key)
            print(f"ERROR {key}:\n{traceback.format_exc()}", flush=True)

    print(f"\n{len(queries) - len(failures)}/{len(queries)} green at {sf_dir} "
          f"in {time.time() - t_all:.0f}s", flush=True)
    if failures:
        print("failures:", failures, flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
