"""Local simulation of the driver's correctness gate: run every
queries() entry at a given sf and compare with oracle_sql() via DuckDB
(row count + column names + order-insensitive value hash).

Usage: python scripts/check_harness.py [sf_dir] [op ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[dict], cols: list[str]) -> str:
    cols = sorted(cols)
    lines = sorted(
        "\x1f".join(norm_cell(r[c]) for c in cols) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from kgx.harness import OPS
    from kgx.spark.session import get_spark

    spark = get_spark("harness-check", cores=8, shuffle_partitions=16)

    con = duckdb.connect()
    for tname in TABLES:
        p = os.path.join(sf, f"{tname}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{p}')"
            )

    n_pass = n_fail = n_rows_only = 0
    for name, (fn, sql) in OPS.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            cols = df.columns
            rows = [r.asDict() for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"rows {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = [dict(zip(d_cols, r)) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(rows) != len(d_rows):
            problems.append(f"rowcount {len(rows)} vs {len(d_rows)}")
        if sorted(cols) != sorted(d_cols):
            problems.append(f"cols {sorted(cols)} vs {sorted(d_cols)}")
        else:
            hs, hd = value_hash(rows, cols), value_hash(d_rows, d_cols)
            if hs != hd:
                problems.append(f"value-hash {hs} vs {hd}")
                # show first differing line
                ls = sorted("\x1f".join(norm_cell(r[c])
                            for c in sorted(cols)) for r in rows)
                ld = sorted("\x1f".join(norm_cell(r[c])
                            for c in sorted(d_cols)) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  spark: {a[:120]}")
                        problems.append(f"  duck : {b[:120]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("   " + p)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
