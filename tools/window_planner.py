"""Debugging view of the self-rotating DRIVER_WINDOW.

Since r9 the window is COMPUTED AT IMPORT inside
``mapreduce_google_spark/queries.py`` (``_compose_driver_window``) from
the committed ``CORRECTNESS_r*.json`` history — there is no hand-pasted
tuple to rotate, and the r7/r8 round-boundary staleness alarm can no
longer fire. This tool remains as the human-readable view of what the
policy composed, plus a paranoia check that the live tuple equals a
fresh recomposition (it always should — both run the same function).

Policy (encoded in queries._compose_driver_window):
  * 3 fixed canaries first (t01/t09/t17 — trip-wires for systemic
    breakage, checked every round);
  * never-driver-checked oracle-bearing entries next, registration
    order (evidence debt beats staleness);
  * then the stalest oracle-bearing entries by union last-checked round
    (ties broken by registration order) until the window holds 50;
  * rows-only and retired specs are excluded.

Usage: python tools/window_planner.py            # print the 50 names
       python tools/window_planner.py --verify   # exit 1 if the live
                                                 # DRIVER_WINDOW differs
                                                 # from a recomposition
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.queries import (  # noqa: E402
    DRIVER_WINDOW,
    _compose_driver_window,
)


def main() -> int:
    planned = list(_compose_driver_window())
    if "--verify" in sys.argv:
        current = list(DRIVER_WINDOW)
        if current == planned:
            print("DRIVER_WINDOW matches the rotation policy (self-rotating)")
            return 0
        drop = [n for n in current if n not in planned]
        add = [n for n in planned if n not in current]
        print("DRIVER_WINDOW diverges from a fresh recomposition:")
        print(f"  should drop: {drop}")
        print(f"  should add:  {add}")
        return 1
    for name in planned:
        print(f'    "{name}",')
    return 0


if __name__ == "__main__":
    sys.exit(main())
