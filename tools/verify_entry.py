"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
in DuckDB over the same parquet, compares row count, sorted column names,
and an order-insensitive multiset of stringified rows.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

import __spark_entry__ as e
from sifter_mrc_search_engine_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def norm_rows(cols, rows):
    """Mirror the DRIVER's canonicalizer: pandas sort_values over all
    columns sorted by name. Crucially this THROWS on unhashable cells
    (lists/arrays), exactly like the driver — r1 shipped three
    array-column queries because the old stringify here masked that.
    """
    import pandas as pd

    order = sorted(cols)
    pdf = pd.DataFrame(list(rows), columns=list(cols))[order]
    pdf = pdf.sort_values(order).reset_index(drop=True)  # raises on list cells
    return sorted(
        "|".join(norm_cell(r[c]) for c in order) for _, r in pdf.iterrows()
    )


def main():
    spark = get_spark("verify-entry", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    res = e.entry(spark)
    rows = res.collect()
    print(f"entry: {len(rows)} rows, schema={res.columns}")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        # Driver-hash hazard: raw timestamp outputs with sub-second
        # precision hash differently between Arrow (ns) and DuckDB (µs)
        # even for equal instants (r2's rel_user_sessions red cell).
        # Entry queries must emit epoch-micros BIGINT or strings instead.
        ts_cols = [c for c, t in sdf.dtypes if t.startswith("timestamp")]
        if ts_cols:
            import datetime as _dt

            hazard = any(
                isinstance(v, _dt.datetime) and v.microsecond != 0
                for r in srows
                for v in r
            )
            if hazard:
                failures += 1
                print(
                    f"{name:32s} FAIL hash-hazard: µs-precision timestamp "
                    f"column(s) {ts_cols} — emit epoch micros BIGINT instead"
                )
                continue
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(srows)} rows")
            continue
        dres = con.execute(oracles[name])
        dcols = [d[0] for d in dres.description]
        drows = dres.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = norm_rows(scols, srows) == norm_rows(dcols, drows)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name:32s} {status} cols={ok_cols}({scols} vs {dcols}) count={ok_count}({len(srows)} vs {len(drows)}) vals={ok_vals}")
            if ok_cols and ok_count and not ok_vals:
                a, b = norm_rows(scols, srows), norm_rows(dcols, drows)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"   spark={x[:120]}\n   duck ={y[:120]}")
        else:
            print(f"{name:32s} OK ({len(srows)} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
