"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query at sf0.01 through Spark AND its DuckDB oracle,
compare row count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(bool)
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from tits_spark.session import get_spark

    spark = get_spark("check-oracles", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            assert len(got) >= 0
            continue
        want = con.execute(oracles[name]).df()
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if pd.api.types.is_float_dtype(g[c]):
                af, bf = a.astype(float), b.astype(float)
                bad = ~((a == b) | (np.isnan(af) & np.isnan(bf)))
                # the driver compares BYTES: -0.0 vs +0.0 is value-equal but
                # hash-unequal, so treat a signbit divergence on zeros as a fail
                bad |= (af == 0.0) & (bf == 0.0) & (
                    np.signbit(af) != np.signbit(bf))
            else:
                bad = ~(pd.Series(a).fillna("<NA>").astype(str)
                        == pd.Series(b).fillna("<NA>").astype(str)).to_numpy()
            if bad.any():
                i = int(np.argmax(bad))
                mismatch = (c, int(bad.sum()), g.iloc[i].to_dict(), w.iloc[i].to_dict())
                break
        if mismatch:
            c, nbad, ga, wa = mismatch
            print(f"FAIL {name}: col {c} {nbad} mismatches; first: spark={ga} duckdb={wa}")
            failures += 1
        else:
            print(f"ok   {name}: {len(g)} rows exact")
    print(f"\n{n_run - failures}/{n_run} exact, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
