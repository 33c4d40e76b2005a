"""Local mimic of the driver's CORRECTNESS check: run every queries()
entry and its oracle_sql() on the same sf dir, compare schema + rowcount
+ order-insensitive values. Usage: python tools/check_entry.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from lsearch_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    # Floats compare at 12 SIGNIFICANT digits — strict enough to catch
    # the 1e-6-scale divergences the driver's exact-value hash flags
    # (r6's source_doc_stats red was masked by the old round-to-9-DECIMALS
    # here), loose enough to ignore 1-ulp cross-engine noise the driver
    # demonstrably tolerates (media_image_features was driver-green in r6
    # with 1-ulp mean-channel diffs). Everything becomes a string so row
    # tuples sort without mixed-type '<' errors. The canonical form is
    # TYPE-CLASS-TAGGED (ADVICE r7): "n:" for anything numeric (ints,
    # floats, bools, Decimals — intended numeric widenings still compare
    # equal) vs "s:" for strings, so a bigint column coming back as a
    # STRING on one engine is a visible divergence instead of a silent
    # pass. numpy scalars and duckdb Decimals normalize into the same
    # numeric class first (both sides arrive via pandas).
    if v is None:
        return "\x00null"
    tname = type(v).__name__
    if tname != "ndarray" and hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if tname == "Decimal":
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "n:nan"
        if v.is_integer():
            return "n:" + str(int(v))  # hugeint->float64 artifact; 1351.0 == 1351
        return "n:" + f"{v:.12g}"
    if isinstance(v, bool):
        return "n:" + str(int(v))
    if isinstance(v, int):
        return "n:" + str(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, str):
        return "s:" + v
    return "s:" + str(v)


def rowset(df_pandas):
    cols = sorted(df_pandas.columns)
    return sorted(tuple(canon(r[c]) for c in cols) for _, r in df_pandas.iterrows()), cols


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(app="check-entry", cores=8, shuffle_partitions=8, driver_memory="4g")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # the twin-based oracles (simhash/LSH VALUES lists) compute expected
    # rows from the parquet testdata — point them at the same dir the
    # views read so local checks at any sf stay self-consistent
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    fails, rows_only = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        g, gc = rowset(got)
        w, wc = rowset(want)
        if gc != wc:
            fails.append((name, f"schema {gc} != {wc}"))
            print(f"FAIL  {name}: schema {gc} != {wc}")
        elif len(g) != len(w):
            fails.append((name, f"rows {len(g)} != {len(w)}"))
            print(f"FAIL  {name}: rowcount {len(g)} != {len(w)}")
        elif g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            fails.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ e.g. {diff}")
        else:
            print(f"OK    {name}: {len(g)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(fails) - len(rows_only)} ok, {len(rows_only)} rows-only, {len(fails)} FAILED")
    if fails:
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
