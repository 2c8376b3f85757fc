"""Compose the next round's DRIVER_WINDOW from the recorded correctness
history — the steady-state rotation the staleness budget assumes
(tests/test_registry_contract.py::test_staleness_budget).

Policy (encoded, not prose):
  * 3 fixed canaries first (t01/t09/t17 — trip-wires for systemic
    breakage, checked every round);
  * never-driver-checked oracle-bearing entries next, registration
    order (evidence debt beats staleness);
  * then the stalest oracle-bearing entries by union last-checked round
    (ties broken by registration order) until the window holds 50;
  * rows-only specs are excluded — a slot can never buy them a hash row
    (their invariant twins rotate on their own merits).

Usage: python tools/window_planner.py            # print the 50 names
       python tools/window_planner.py --verify   # exit 1 if the current
                                                 # DRIVER_WINDOW differs

Paste the output into DRIVER_WINDOW in queries.py at the start of each
round, or run --verify to prove the committed window IS the policy's
output. Run --verify at ROUND START (right after recomposing): queries
registered mid-round after the window locks legitimately diverge until
the next recomposition picks them up (never-checked first).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.queries import DRIVER_WINDOW, REGISTRY  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANARIES = ["t01_word_count", "t09_revenue_per_region", "t17_exact_dedup"]
WINDOW_SIZE = 50


def registration_order() -> list[str]:
    """Source order of ``name=`` literals — REGISTRY iteration order is
    window-first, so re-derive the original registration sequence."""
    with open(os.path.join(REPO, "mapreduce_google_spark", "queries.py")) as fh:
        names = re.findall(r"name=['\"]([^'\"]+)['\"]", fh.read())
    seen: set[str] = set()
    return [n for n in names if n in REGISTRY and not (n in seen or seen.add(n))]


def last_checked() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        with open(f) as fh:
            for name in json.load(fh):
                last[name] = max(last.get(name, 0), rnd)
    return last


def plan_window() -> list[str]:
    last = last_checked()
    reg = registration_order()
    oracle_bearing = [
        n
        for n in reg
        if REGISTRY[n].oracle is not None
        and not REGISTRY[n].retired  # retired twins ceded their slots
        and n not in CANARIES
    ]
    never = [n for n in oracle_bearing if n not in last]
    stale = sorted(
        (n for n in oracle_bearing if n in last),
        key=lambda n: (last[n], reg.index(n)),
    )
    window = CANARIES + never + stale
    return window[:WINDOW_SIZE]


def main() -> int:
    planned = plan_window()
    if "--verify" in sys.argv:
        current = list(DRIVER_WINDOW)
        if current == planned:
            print("DRIVER_WINDOW matches the rotation policy")
            return 0
        drop = [n for n in current if n not in planned]
        add = [n for n in planned if n not in current]
        print("DRIVER_WINDOW diverges from the rotation policy:")
        print(f"  should drop: {drop}")
        print(f"  should add:  {add}")
        return 1
    for name in planned:
        print(f'    "{name}",')
    return 0


if __name__ == "__main__":
    sys.exit(main())
