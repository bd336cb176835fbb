#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet tables,
sorts columns by name + rows by all columns, and compares values.
Dev-only tool — NOT part of the shipped Scala library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — mismatch in last ULP must surface
    return str(v)


def type_key(cols, types):
    """Normalized DuckDB result-column types, ordered by column name.

    The driver's hash gate is type-sensitive: DuckDB HUGEINT (from an uncast
    SUM(BIGINT)) vs Spark BIGINT hash-mismatches even when values are
    identical, and str(v) normalization hides it locally.  So compare type
    names too (via the relation API — DBAPI `description` collapses every
    numeric to 'NUMBER').  Only normalizations the driver itself tolerates
    are applied (timestamp tz-ness differs between Spark parquet and DuckDB
    literals on ops that are driver-green today).
    """
    def canon(t):
        t = str(t).upper()
        if t.startswith("TIMESTAMP"):
            return "TIMESTAMP"
        # The int64-and-under family hashes identically in the driver (both
        # engines surface plain Python ints); HUGEINT does NOT — it stays
        # distinct so an uncast SUM(BIGINT) fails here like it fails there.
        if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
            return "INT"
        return t
    pairs = sorted(zip(cols, types), key=lambda p: p[0])
    return [canon(t) for _, t in pairs]


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result dumped")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_rows, got_cols = got.fetchall(), list(got.columns)
            gt = type_key(got.columns, got.types)
            want = con.sql(sql)
            want_rows, want_cols = want.fetchall(), list(want.columns)
            wt = type_key(want.columns, want.types)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, gr = frame_key(got_rows, got_cols)
        wc, wr = frame_key(want_rows, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif gt != wt:
            print(f"FAIL {name}: column types spark={gt} != oracle={wt}")
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
        elif gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:\n  spark={gr[bad]}\n  duck ={wr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
