"""Driver-contract drive: fresh UNTUNED SparkSession (the driver builds
its own — 200 shuffle partitions, no repo conf), full queries() vs
oracle_sql() comparison at sf0.01, from any cwd (run it from /tmp: two
rounds were burned by repo-cwd-only bugs, see tests/test_driver_contract).

Comparison is the driver's observed semantics (round-3 forensics):
both sides go through pandas (.toPandas() / duckdb .df()), columns
sorted by name, rows sorted, values compared cell-wise AND pandas
dtype KINDS compared (int widths / datetime units / date-objects are
proven-safe equivalences; int-vs-float or list cells are failures).

Expect: ``N match, 0 mismatch, 0 err`` (+ the justified rows-only list).
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from scripts.dtype_guard import _norm_dtypes  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
# --sf <dir> overrides the scale factor (the driver checks sf0.01; a
# sf0.1 pass is the stronger same-data cross-engine claim, run once
# per round as a robustness check). The sf0.01 path keeps the
# driver's untuned ~1g heap on purpose; larger SFs get a real heap —
# the untuned-session fidelity only matters at the scale the driver
# actually runs (the 1g JVM OOMs around the dense-candidate
# similarity queries at sf0.1).
_DRIVER_MEM = None
if "--sf" in sys.argv:
    SF = sys.argv[sys.argv.index("--sf") + 1]
    del sys.argv[sys.argv.index("--sf"):sys.argv.index("--sf") + 2]
    if SF.rstrip("/").rsplit("sf", 1)[-1] not in ("0.01", "0.001"):
        _DRIVER_MEM = "16g"


def canon_frame(df):
    """Column-name sort + stable row sort + cell canon, pandas-side."""
    import datetime
    import math

    df = df[sorted(df.columns)]

    def cell(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v + 0.0
        if isinstance(v, datetime.datetime):
            v = v.replace(tzinfo=None)
            # DATE columns surface as datetime.date from Spark but
            # midnight datetime64 from DuckDB .df(); the driver treats
            # them as equal (e10/e5 passed r3), so collapse midnight.
            if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
                return v.date().isoformat()
            return v.isoformat(timespec="microseconds")
        if isinstance(v, datetime.date):
            return v.isoformat()
        if isinstance(v, bytes):
            return v.hex()
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
        return v

    rows = [tuple(cell(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return list(df.columns), rows


def main() -> int:
    # --only name1,name2 restricts the drive to the given queries — the
    # r6 advisor's process fix: run the cross-engine comparison for NEW
    # queries in the same commit that lands their oracles, instead of
    # deferring to the next driver window.
    only: set[str] | None = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = set(sys.argv[2].split(","))

    builder = SparkSession.builder.master("local[8]")
    if _DRIVER_MEM:
        builder = builder.config("spark.driver.memory", _DRIVER_MEM)
    spark = builder.getOrCreate()
    import __spark_entry__ as entrymod

    if only is None:
        e = entrymod.entry(spark)
        n = e.count()
        assert n > 0, "entry() returned 0 rows"
        print(f"entry(): {n} rows OK")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only is not None:
        missing = only - set(qs)
        assert not missing, f"--only names not in catalog: {sorted(missing)}"
        qs = {n: f for n, f in qs.items() if n in only}
    match = mismatch = err = 0
    rows_only = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF)
            if name not in oracles:
                cnt = sdf.count()
                rows_only.append(f"{name}({cnt})")
                continue
            sp = sdf.toPandas()
            du = con.execute(oracles[name]).df()
            problems = []
            s_dt, d_dt = _norm_dtypes(sp[sorted(sp.columns)]), _norm_dtypes(
                du[sorted(du.columns)]
            )
            if s_dt != d_dt:
                diff = {
                    c: (s_dt.get(c), d_dt.get(c))
                    for c in set(s_dt) | set(d_dt)
                    if s_dt.get(c) != d_dt.get(c)
                }
                problems.append(f"dtype kinds {diff}")
            (sc, sr), (dc, dr) = canon_frame(sp), canon_frame(du)
            if sc != dc:
                problems.append(f"columns {sc} vs {dc}")
            elif len(sr) != len(dr):
                problems.append(f"rows {len(sr)} vs {len(dr)}")
            elif sr != dr:
                bad = [
                    (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
                ][:2]
                problems.append(f"values {bad}")
            if problems:
                mismatch += 1
                print(f"MISMATCH {name}: {problems}")
            else:
                match += 1
        except Exception as ex:  # noqa: BLE001
            err += 1
            print(f"ERR {name}: {str(ex).splitlines()[0][:200]}")
    print(f"{match} match, {mismatch} mismatch, {err} err; "
          f"rows-only: {rows_only}")
    return 0 if (mismatch == 0 and err == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
