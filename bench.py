"""Headline benchmark (driver contract): run the flagship query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing protocol (BASELINE.md): one warm-up pass of the flagship to pay
JVM/codegen startup, then per-query wall-clock of a full plan+execute
drained through the JVM-side noop sink (executes the complete plan,
writes nothing, no driver collect, no JVM→Python row serialization —
mirrors how a cluster job would sink results).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_programming_spark.registry import catalog
from big_data_programming_spark.session import DEFAULT_CPUS, DEFAULT_SF_DIR, get_spark

#: Headline suite — one representative per operator family; the full
#: catalog runs in the driver's correctness pass, not here.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "w4_running_sum",
    "e1_hourly_event_stats",
    "e3_sessionization",
    "l1_exact_dedup",
    "l2b_simhash",
    "l3_cosine_topk",
    "l3b_bucketed_near_pairs",
    "l4_text_stats",
    "l4c_tfidf_top_terms",
    "st1_watermark_tumbling",
    "ud2_pandas_scalar",
]

# NOT in the headline: the pairwise near-dup ops (l2_jaccard_near_dup,
# l2c_minhash_lsh). The synthetic fixture corpus is pathologically
# dense — ~40% of ALL doc pairs are true near-duplicates at J>=0.5
# (500 docs -> ~90k qualifying pairs), so any correct pairwise output
# is Θ(n²) rows ON THIS DATA and the bench would measure fixture
# density, not engine speed. Real corpora are sparse, which is what the
# LSH banding exploits; the ops run in the sf0.01 correctness gate.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bdps-bench", cpus=DEFAULT_CPUS)
    cat = catalog()
    suite = [n for n in HEADLINE if n in cat]

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JVM, codegen, parquet footer caches. Best-effort — a
    # broken flagship must not zero the whole round's numbers.
    try:
        drain(cat["q1_pricing_summary"].fn(spark, sf_dir))
    except Exception:
        pass

    # Per-query isolation: one broken query records an "err" entry and
    # the rest of the suite still produces timings; the JSON line is
    # ALWAYS emitted (driver contract — BENCH_r{N}.json must parse).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in suite:
        t0 = time.perf_counter()
        try:
            drain(cat[name].fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — bench must survive anything
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
