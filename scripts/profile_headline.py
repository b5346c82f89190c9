"""Phase-decomposed profiling of the headline bench queries (r11
optimization round, guide §1).

For each headline query at $SPARK_GRAFT_SF_DIR this records, on a warm
session:

* ``construct_s`` — Python-side DataFrame build (plan assembly);
* ``plan_s``      — analysis + optimization + physical planning
  (forcing ``queryExecution().executedPlan()`` on a fresh build);
* ``drain1_s`` / ``drain2_s`` — two full noop-sink evaluations of
  fresh builds (drain1 ≈ bench's timed number; drain2 shows
  run-to-run variance);
* ``jobs`` / ``stages`` / ``tasks`` — scheduler work for drain2, via
  the status tracker deltas (how many AQE sub-jobs the query pays);
* the formatted plan, written to plans/r11/<name>_before.txt (or
  ``_after.txt`` with --after).

Usage: python scripts/profile_headline.py [--after] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from big_data_programming_spark.plans.explain import (  # noqa: E402
    formatted_plan,
)
from big_data_programming_spark.registry import catalog  # noqa: E402
from big_data_programming_spark.session import (  # noqa: E402
    DEFAULT_CPUS,
    DEFAULT_SF_DIR,
    get_spark,
)

PLANS_DIR = "/root/repo/plans/r11"


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "_before"
    if "--after" in args:
        suffix = "_after"
        args.remove("--after")
    no_plans = "--no-plans" in args
    if no_plans:
        args.remove("--no-plans")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("profile-headline", cpus=DEFAULT_CPUS)
    cat = catalog()

    import bench

    names = args or [n for n in bench.HEADLINE if n in cat]
    os.makedirs(PLANS_DIR, exist_ok=True)
    tracker = spark.sparkContext.statusTracker()

    def drain(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up pass (bench protocol); report failures instead of letting
    # them resurface as confusing timed-drain errors (r11 advisor)
    for n in names:
        try:
            drain(cat[n].fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"warm-up FAILED for {n}: {type(exc).__name__}: {exc}",
                  file=sys.stderr)

    out = {}
    for n in names:
        rec: dict[str, object] = {}
        spark.sparkContext.setJobDescription(f"profile:{n}")
        t0 = time.perf_counter()
        df = cat[n].fn(spark, sf_dir)
        rec["construct_s"] = round(time.perf_counter() - t0, 3)

        # fresh build so planning is not warm from construct's side effects
        t0 = time.perf_counter()
        df2 = cat[n].fn(spark, sf_dir)
        df2._jdf.queryExecution().executedPlan()
        rec["plan_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        drain(cat[n].fn(spark, sf_dir))
        rec["drain1_s"] = round(time.perf_counter() - t0, 3)

        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        drain(cat[n].fn(spark, sf_dir))
        rec["drain2_s"] = round(time.perf_counter() - t0, 3)
        jobs1 = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs1 - jobs0)
        stages = tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    stages += 1
                    tasks += si.numTasks
        rec["jobs"] = len(new_jobs)
        rec["stages"] = stages
        rec["tasks"] = tasks

        if not no_plans:
            try:
                with open(f"{PLANS_DIR}/{n}{suffix}.txt", "w") as fh:
                    fh.write(formatted_plan(cat[n].fn(spark, sf_dir)))
            except Exception as exc:  # streaming drains return memory-sink
                rec["plan_note"] = f"{type(exc).__name__}: {exc}"[:120]
        out[n] = rec
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "queries": out}, indent=1))


if __name__ == "__main__":
    main()
