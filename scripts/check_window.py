"""Rotation sanity gate: the central ``_WINDOW_PROMOTE`` set must be
exactly the first 50 ``catalog()`` entries, every name must exist, and
(when CORRECTNESS ledgers are present) the window should consist of
queries that most need a driver row — it prints how many window slots
go to never-driver-checked queries so a wasted-slot rotation (the r6
verdict's finding) is visible before the round runs.

Run after every rotation edit: ``python scripts/check_window.py``.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_programming_spark.registry import _WINDOW_PROMOTE, catalog  # noqa: E402


def main() -> int:
    cat = list(catalog())
    first = cat[:50]
    assert len(_WINDOW_PROMOTE) == 50, (
        f"window set has {len(_WINDOW_PROMOTE)} names, driver checks 50"
    )
    unknown = _WINDOW_PROMOTE - set(cat)
    assert not unknown, f"window names not in catalog: {sorted(unknown)}"
    assert set(first) == _WINDOW_PROMOTE, (
        f"first-50 != window set; missing={sorted(_WINDOW_PROMOTE - set(first))} "
        f"extra={sorted(set(first) - _WINDOW_PROMOTE)}"
    )

    checked: set[str] = set()
    last_round: dict[str, int] = {}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        names = set(json.load(open(f)))
        checked |= names
        for n in names:
            last_round[n] = max(last_round.get(n, 0), rnd)
    fresh = [n for n in first if n not in checked]
    stale = [n for n in first if n in checked]
    never = [n for n in cat if n not in checked]
    print(f"catalog: {len(cat)}; window: 50 "
          f"({len(fresh)} never-driver-checked, {len(stale)} re-checks)")
    if stale:
        print(f"re-check slots: {stale}")
    rollover = [n for n in never if n not in _WINDOW_PROMOTE]
    print(f"never-checked outside window (next-round rollover): "
          f"{len(rollover)} {rollover}")

    # Suggested NEXT-round window: every never-checked query first
    # (minus the ones the current window will cover this round), then
    # the stalest re-checks — ordered by (last checked round, catalog
    # position) so coverage ages out evenly. Copy/paste aid for the
    # next rotation; the human still owns the decision.
    will_be_checked = checked | set(first)
    next_fresh = [n for n in cat if n not in will_be_checked]
    stale_pool = sorted(
        (n for n in cat if n in will_be_checked),
        key=lambda n: (last_round.get(n, 99), cat.index(n)),
    )
    suggestion = (next_fresh + [n for n in stale_pool if n not in next_fresh])[:50]
    n_re = 50 - len(next_fresh[:50])
    print(f"\nsuggested next window ({len(next_fresh)} fresh + {n_re} stalest "
          f"re-checks, oldest first):")
    for n in suggestion:
        tag = f"last driver row: r{last_round[n]}" if n in last_round else "never"
        print(f"  {n}  ({tag})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
