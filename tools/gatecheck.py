"""Local replica of the driver's correctness gate: run each
__spark_entry__ query AND its DuckDB oracle at a given sf, compare
row-count, schema (column names), and order-insensitive values."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark(app_name="gatecheck", master="local[8]", shuffle_partitions=8)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = normalize(fn(spark, sf_dir).toPandas())
        if name not in oracles:
            print(f"{name:14s} rows-only: {len(got)} rows")
            continue
        want = normalize(con.execute(oracles[name]).fetchdf())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            ok_vals = True
            for c in got.columns:
                g, w = got[c].to_numpy(), want[c].to_numpy()
                if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
                    same = np.allclose(
                        g.astype(float), w.astype(float), atol=0, rtol=0, equal_nan=True
                    )
                else:
                    same = np.array_equal(g, w)
                if not same:
                    ok_vals = False
                    bad = np.nonzero(g != w)[0][:5] if len(g) == len(w) else []
                    print(f"    col {c} mismatch; first bad idx {bad}")
                    if len(bad):
                        print("    got :", g[bad])
                        print("    want:", w[bad])
        status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:14s} {status} rows={len(got)}/{len(want)} cols_match={ok_cols} "
            f"cols={list(got.columns)}"
        )
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # query names: any mix of comma- and space-separated trailing args
    only = [n for arg in sys.argv[2:] for n in arg.split(",") if n] or None
    sys.exit(1 if main(sf, only) else 0)
