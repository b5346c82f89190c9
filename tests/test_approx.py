"""Error-bound tests for the approximate aggregates (SURVEY.md §5.2.4):
the oracle can't hash-match them (A4 is rows-only), so assert the
published accuracy contracts against exact answers instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_programming_spark.sources.loaders import load
from tests.conftest import SF_DIR


def test_approx_count_distinct_within_rsd(spark):
    """HLL++ at rsd=0.02 must land within ±5·rsd of the exact count
    (HLL error is gaussian-ish around the exact value; 5 sigma keeps
    the test deterministic-in-practice while still catching a broken
    sketch, which is off by orders of magnitude)."""
    li = load(spark, SF_DIR, "lineitem")
    exact_parts, exact_orders = li.agg(
        F.count_distinct("l_partkey"), F.count_distinct("l_orderkey")
    ).collect()[0]
    approx_parts, approx_orders = li.agg(
        F.approx_count_distinct("l_partkey", 0.02),
        F.approx_count_distinct("l_orderkey", 0.02),
    ).collect()[0]
    assert abs(approx_parts - exact_parts) <= 0.1 * exact_parts
    assert abs(approx_orders - exact_orders) <= 0.1 * exact_orders


def test_approx_quantile_within_relative_error(spark):
    """approxQuantile(relativeError=e) guarantees rank error ≤ e·n:
    the returned value's true rank must be within [r-en, r+en]."""
    o = load(spark, SF_DIR, "orders")
    vals = sorted(v[0] for v in o.select("o_totalprice").collect())
    n = len(vals)
    eps = 0.01
    for q in (0.25, 0.5, 0.9):
        (got,) = o.approxQuantile("o_totalprice", [q], eps)
        import bisect

        lo = bisect.bisect_left(vals, got)
        hi = bisect.bisect_right(vals, got)
        target = q * n
        assert lo - eps * n <= target <= hi + eps * n, (q, got, lo, hi, n)


def test_percentile_approx_matches_exact_on_coarse_grid(spark):
    """percentile_approx with a high accuracy parameter must agree with
    the exact percentile on a modest dataset (where the sketch can hold
    everything) — guards against silently swapped semantics."""
    d = load(spark, SF_DIR, "documents")
    exact, approx = d.agg(
        F.percentile("n_chars", 0.5).alias("e"),
        F.percentile_approx("n_chars", 0.5, 10000).alias("a"),
    ).collect()[0]
    # exact interpolates; the sketch returns an observed value adjacent
    # to the true median — allow one observed-value step
    vals = sorted(v[0] for v in d.select("n_chars").collect())
    assert approx in vals
    assert abs(vals.index(approx) - len(vals) // 2) <= max(2, 0.001 * len(vals))


def test_hll_sketch_rollup_bounds_and_mergeability(spark):
    """a15's two-level sketch rollup: (1) the merged estimate lands
    within HLL error bounds of the exact per-type distinct user count;
    (2) union-of-daily-sketches equals the single-pass whole-history
    sketch exactly (same lgK, same items → identical sketch state) —
    the associativity that makes pre-aggregated rollups trustworthy."""
    e = load(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["exact"]
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged = {
        r["event_type"]: r["est"]
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
        .collect()
    }
    single = {
        r["event_type"]: r["est"]
        for r in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert set(merged) == set(exact)
    for t, ex in exact.items():
        assert abs(merged[t] - ex) <= 0.1 * ex, (t, merged[t], ex)
        # merge path and single-pass path must agree to float precision
        assert abs(merged[t] - single[t]) <= 1e-6 * max(single[t], 1.0), t


def test_l5k_sigmoid_boundary_margin():
    """The l5k docstring's residual risk (r8 advice), pinned with a
    measured margin instead of hope: the one libm call in the training
    loop is EXP inside p = round(1/(1+exp(-z)), 8); a cross-engine
    hash mismatch requires some document's RAW sigmoid to sit within
    ~1 ulp of a .xxxxxxxx5 rounding boundary. Recompute the raw
    sigmoids the way the oracle does (DuckDB, from the shared l5k CTE
    chain, WITHOUT the final 8dp round) at both fixture SFs and assert
    every document is at least 1e-4 eighth-decimal units away from
    the boundary — ~1e12 ulps of margin, so the fixture hash-match is
    deterministic in practice, not probabilistic."""
    import duckdb

    from big_data_programming_spark.queries.llm_text import _l5k_ctes

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        # distance of p*1e8's fractional part from the .5 rounding cut
        (margin,) = con.execute(
            f"""WITH {_l5k_ctes()}
            SELECT MIN(ABS((1.0 / (1.0 + EXP(-z))) * 1e8
                           - FLOOR((1.0 / (1.0 + EXP(-z))) * 1e8) - 0.5))
            FROM z"""
        ).fetchone()
        assert margin > 1e-4, (sf, margin)


def test_l5k2_prior_logodds_boundary_margin():
    """l5k2's round-10 prior-shifted keep threshold adds ONE new libm
    call to the gate: thr = ROUND(LN(n_en/n_rest), 8). Same residual
    risk class as the l5k sigmoid (a cross-engine flip requires the
    raw LN to sit within ~1 ulp of a .xxxxxxxx5 boundary), pinned the
    same way: measure the raw value's distance from the 8dp rounding
    cut at every fixture SF and demand ~1e12 ulps of margin. (The
    logit-vs-thr comparison itself has no risk — the fold canon makes
    the logits bit-identical doubles in both engines, and identical
    doubles compare identically however close they are.)"""
    import duckdb

    for sf in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        (margin,) = con.execute(
            """
            WITH r AS (
              SELECT LN(CAST(COUNT(*) FILTER (lang = 'en') AS DOUBLE)
                     / CAST(COUNT(*) FILTER (lang <> 'en') AS DOUBLE)) AS raw
              FROM documents
            )
            SELECT ABS(ABS(raw) * 1e8 - FLOOR(ABS(raw) * 1e8) - 0.5) FROM r
            """
        ).fetchone()
        assert margin > 1e-4, (sf, margin)


def test_l5k2_degenerate_corpus_raises(spark, tmp_path):
    """r10 advice: a single-class corpus makes ln(n_en/n_rest) either
    a div-by-zero or log(0), where Spark (NULL) and DuckDB (-inf)
    diverge. The guard must fail LOUDLY in-plan instead of gating on a
    NULL threshold — and it must survive column pruning (it lives
    inside thr's expression tree, not a separate assert column)."""
    import pytest

    from big_data_programming_spark.queries.llm_text import (
        l5k2_trained_quality_gate,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    degen = str(tmp_path / "degen")
    d.filter("lang = 'en'").write.parquet(degen + "/documents.parquet")
    with pytest.raises(Exception) as exc:
        l5k2_trained_quality_gate(spark, degen).limit(1).collect()
    assert "degenerate corpus" in str(exc.value)
