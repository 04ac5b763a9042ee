"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on sf0.01 and compares
against ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded to 9 significant places before hashing).

Usage: python tools/check_entry.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\\N"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # the DRIVER's canonicalizer sort_values() crashes on unhashable
        # list cells — registered queries must return scalar columns
        # only, so the local gate fails the same way (round-2 lesson:
        # normalizing lists here masked two driver-red rows)
        raise TypeError("array-valued cell: driver canon would crash (return scalars only)")
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _has_array_cells(df: pd.DataFrame) -> bool:
    # scan a prefix of rows, not just row 0 — a NULL cell in the first
    # row of an array column must not let the column slip through
    for _, row in df.head(50).iterrows():
        if any(
            isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
            for v in row
        ):
            return True
    return False


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = ["\x1f".join(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def _dtype_kind(s: pd.Series) -> str:
    """Collapse pandas dtype kinds into the classes the driver's
    canonicalizer renders differently: int (i/u), float (f), other."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    return "other"


def _cross_dtype_cols(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    """Columns where one side is integer-typed and the other float-typed.

    The driver canonicalizer stringifies int64 21 and float64 21.0
    differently, so such a column ALWAYS hash-mismatches driver-side even
    when values are numerically identical (round-3 lesson: DuckDB returns
    windowed integer sum() as HUGEINT -> pandas float64 while Spark
    returns int64; _norm_cell's integral-float collapse masked it locally
    for two straight rounds)."""
    bad = []
    for c in a.columns:
        ka, kb = _dtype_kind(a[c]), _dtype_kind(b[c])
        if {ka, kb} == {"int", "float"}:
            bad.append(f"{c} ({ka} vs {kb})")
    return bad


def main(names: list[str] | None = None) -> int:
    import __spark_entry__ as entry
    from movex_cdc_spark.session import get_spark

    spark = get_spark(cpus=8, extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = names or list(qs)
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spdf)} rows (no oracle — rows-only check)")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rows {len(spdf)} != {len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(f"cols {sorted(spdf.columns)} != {sorted(opdf.columns)}")
        elif _has_array_cells(spdf) or _has_array_cells(opdf):
            problems.append("array-valued column (driver canon crashes on lists)")
        else:
            cross = _cross_dtype_cols(spdf, opdf)
            if cross:
                problems.append(
                    "cross-dtype column(s) " + ", ".join(cross)
                    + " — driver canon renders 21 vs 21.0 (cast the oracle, e.g. ::BIGINT)"
                )
            try:
                mismatch = value_hash(spdf) != value_hash(opdf)
            except TypeError:
                # array cell deeper than the _has_array_cells scan prefix —
                # report the real cause, never compare opaque sentinels
                problems.append("array-valued column past row-50 scan (driver canon crashes on lists)")
                mismatch = False
            if mismatch:
                problems.append("value hash mismatch")
                s = spdf[sorted(spdf.columns)].astype(str).sort_values(list(sorted(spdf.columns))).reset_index(drop=True)
                o = opdf[sorted(opdf.columns)].astype(str).sort_values(list(sorted(opdf.columns))).reset_index(drop=True)
                diff = (s != o).any(axis=1) if len(s) == len(o) else None
                if diff is not None and diff.any():
                    i = diff.idxmax()
                    problems.append(f"first diff row {i}: spark={s.iloc[i].tolist()} oracle={o.iloc[i].tolist()}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK    {name}: {len(spdf)} rows")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:] or None) else 0)
