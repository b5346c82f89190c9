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


#: The sf0.1 QUADRATIC tier (round 9, VERDICT r8 next-step #4): these
#: queries' DuckDB oracles recompute exact all-pairs / all-shingle
#: ground truth single-threadedly — O(n²) in corpus size BY DESIGN
#: (they are the audit twins that certify the banded/bucketed
#: production paths' recall) — and dominate a full sf0.1 sweep's
#: wall-clock (multi-hour). The routine per-round sf0.1 sweep runs
#: with ``--tier sf01`` (everything EXCEPT this list); the tier
#: itself stays verified at sf0.01 where exact truth is cheap, plus
#: any member can be spot-run at sf0.1 with --only. Membership is
#: MEASURED (r9 timing sweep, recorded in BASELINE.md), not guessed.
SF01_QUADRATIC_TIER = {
    # l2_jaccard_near_dup was REMOVED from this tier (round-9
    # spot-run: 315.3 s total at sf0.1, match — the df-capped
    # inverted-index truth join, like l2n's, is near-linear; the
    # multi-hour members are the ones that CLUSTER or edit-compare
    # the pair relation, not the pair relation itself).
    # l2c_minhash_lsh was REMOVED from this tier in round 11: its
    # Spark-ML twin (the measured 44.5-min single-core grind at
    # sf0.1) now runs on a deterministic ¼ doc shard (subset-sound —
    # pairs(shard) = pairs(corpus) ∩ shard², llm_dedup.py docstring);
    # round-11 sf0.1 spot-run: 215.0 s, match — cheaper than routine
    # members l2i (420 s) and l2 (315 s).
    "l2d_dedup_clusters",        # clusters from the all-pairs relation
    "l2d2_cc_two_phase",         # same pair relation, two-phase CC
    # l2e_embedding_dedup (6.7 s) and l2f_blocked_fuzzy_pairs (6.6 s)
    # were REMOVED from this tier after round-9 sf0.1 spot-runs, both
    # match: l2e's cosine oracle pairs only same-bucket vectors and
    # l2f compares only within its blocking key, so neither is
    # corpus-quadratic in practice.
    # l2g_ngram_jaccard was REMOVED from this tier (round-9 spot-run:
    # 282.6 s at sf0.1, match — same inverted-index shape as l2/l2n).
    # l2n_banding_recall_audit was REMOVED from this tier (round-9
    # spot-run: 158.7 s total at sf0.1, match): its truth side is
    # JACCARD_ORACLE_SQL's hot-token-capped inverted-index join (pairs
    # only share-a-token docs, MAX_TOKEN_DF bounds the fan-out), not a
    # brute all-pairs loop — so the routine sweep now re-certifies
    # banding recall at sf0.1 every round for ~2.6 min.
    # lm6_negative_pair_audit was REMOVED from this tier (round-9
    # spot-run: 5.8 s at sf0.1, match — its LCG partner sampling is
    # O(n) pairs, never all-pairs; original tier placement was a
    # misread of its name, not a measurement).
    # the near-dup GRAPH family builds its edge list from the same
    # jaccard pair operator (g5's DuckDB twin timed out a 13-min
    # spot-run box even after the round-9 edge-checkpoint fix — 4
    # unrolled LPA mode votes over the pair CTE, single-threaded).
    # g2_pagerank was REMOVED (round-9 spot-run: 20.9 s at sf0.1,
    # match — its oracle iterates over the DEDUPED edge list with
    # simple sum aggregates, no per-round pair recomputation).
    # g1_triangle_counts STAYS in the tier, adjudicated by round-10
    # measurement (an earlier round-10 note briefly claimed a 5.5 s
    # sf0.1 spot-run — that run was accidentally at sf0.01: this
    # script takes --sf, NOT the $SPARK_GRAFT_SF_DIR env var bench.py
    # uses). The real sf0.1 picture: the SPARK side is fixed — the
    # degree-oriented broadcast-closing plan runs 245 s with evenly
    # distributed tasks where r9's id-ordered plan sat >20 min in one
    # straggler — but the DUCKDB oracle is single-box infeasible at
    # sf0.1: the fixture's 2934-doc near-clique makes the wedge
    # stream ~1.9e9 rows, DuckDB's EC:0 estimate builds a hash table
    # ON that stream (~85 GB RSS / few-hundred-GB spill; three
    # formulations measured, see operators/graph.py).
    "g1_triangle_counts",
    # g3_recursive_bfs was REMOVED from this tier in round 11: the
    # r10 sf0.1 spot-run (545.3 s) was dominated by the recursive CTE
    # re-executing the UN-CUT jaccard-pairs relation per reference
    # (3 static references + one per recursion level); the r11
    # localCheckpoint cut (graph_queries.py, the same e0 cut g1
    # landed in r10) re-measured at 205.3 s, match — cheaper than
    # routine members l2i (420 s) and l2 (315 s).
    # g4_kcore was REMOVED after its first real sf0.1 spot-run
    # (round 10, --sf): 126.2 s total, match — the peel rounds
    # iterate the DEDUPED edge list with degree aggregates, cheaper
    # than routine-sweep members l2i (420 s) and l2 (315 s).
    # g5_label_propagation was REMOVED in the r11 OPTIMIZATION round:
    # its rotation-slot sf0.1 box (the one the interrupted build
    # session never landed) completed in 220.9 s, match — the
    # r11-build AS MATERIALIZED oracle hygiene fixed what timed out
    # r9's 13-min box; cheaper than routine members l2i/l2, so it
    # joins the routine sweep by the g3/g4 precedent.
}


def main() -> int:
    # --only name1,name2 restricts the drive to the given queries — the
    # r6 advisor's process fix: run the cross-engine comparison for NEW
    # queries in the same commit that lands their oracles, instead of
    # deferring to the next driver window.
    # --skip name1,name2 excludes queries; --tier sf01 is shorthand for
    # skipping SF01_QUADRATIC_TIER (the routine sf0.1 sweep).
    # --timing prints per-query wall seconds (Spark+oracle+compare).
    only: set[str] | None = None
    skip: set[str] = set()
    timing = "--timing" in sys.argv
    if timing:
        sys.argv.remove("--timing")
    if "--tier" in sys.argv:
        i = sys.argv.index("--tier")
        assert sys.argv[i + 1] == "sf01", "only --tier sf01 exists"
        skip |= SF01_QUADRATIC_TIER
        del sys.argv[i:i + 2]
    if "--skip" in sys.argv:
        i = sys.argv.index("--skip")
        skip |= set(sys.argv[i + 1].split(","))
        del sys.argv[i:i + 2]
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
    if skip:
        qs = {n: f for n, f in qs.items() if n not in skip}
    match = mismatch = err = 0
    rows_only = []
    import time as _time

    for name, fn in qs.items():
        t0 = _time.monotonic()
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
                if timing:
                    print(f"OK {name} {_time.monotonic() - t0:.1f}s",
                          flush=True)
        except Exception as ex:  # noqa: BLE001
            err += 1
            print(f"ERR {name}: {str(ex).splitlines()[0][:200]}")
    skipped = f"; skipped: {len(skip)}" if skip else ""
    print(f"{match} match, {mismatch} mismatch, {err} err; "
          f"rows-only: {rows_only}{skipped}")
    return 0 if (mismatch == 0 and err == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
