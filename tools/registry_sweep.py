"""Timing sweep of the active registry at a scale tier — the instrument
that found the r17 dedup/similarity tail cliff, promoted from the r17
ad-hoc script to a reusable tool so sweep coverage is a flag, not a
rewrite.

One timed run per entry (builder + collect of the result to pandas,
shared on-disk stores warm from whatever ran before — the same
methodology as BENCH_registry_sweep_r17.json, so numbers are
comparable). NOT flip evidence: single-pass sweep numbers rank
suspects; any actual flip needs an interleaved shootout.

Usage:
    python tools/registry_sweep.py [sf_dir] [--only a,b] [--skip a,b]
        [--after NAME] [--timeout SEC] [--json PATH]

``--after NAME`` starts the sweep at the entry AFTER the given name in
registration order (resume support: the r17 sweep stopped at t179).
``--timeout SEC`` (default 600) arms a WATCHDOG TIMER that cancels the
entry's job group; the builder itself always runs on the MAIN thread.
The inversion matters: Python DataSource lookup resolves through the
JVM's thread-local active session, so driving a builder from a worker
thread fails any ``format("kvtext")`` entry with DATA_SOURCE_NOT_FOUND
(diagnosed r18 — see ``kvtext.ensure_registered``'s thread caveat).
A cancelled entry surfaces as the Py4J cancellation error and is
recorded as a timeout.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.queries import REGISTRY  # noqa: E402
from mapreduce_google_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]

    def opt(flag, default=None):
        if flag in argv:
            i = argv.index(flag)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    only = opt("--only")
    skip = set((opt("--skip") or "").split(",")) - {""}
    after = opt("--after")
    timeout_s = float(opt("--timeout", "600"))
    json_path = opt("--json")
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/mgs_sf1"

    names = list(REGISTRY)  # registration order
    if only:
        names = [n for n in only.split(",") if n in REGISTRY]
    if after:
        names = names[names.index(after) + 1 :]
    names = [n for n in names if n not in skip]

    spark = get_spark(app_name="mgs-registry-sweep")
    sc = spark.sparkContext
    results: dict[str, dict] = {}
    for n in names:
        rec: dict = {}
        timed_out = threading.Event()

        def cancel(name=n, timed_out=timed_out):
            timed_out.set()
            sc.cancelJobGroup(f"sweep-{name}")

        watchdog = threading.Timer(timeout_s, cancel)
        watchdog.daemon = True
        watchdog.start()
        try:
            sc.setJobGroup(f"sweep-{n}", n, interruptOnCancel=True)
            t0 = time.perf_counter()
            df = REGISTRY[n].builder(spark, sf_dir)
            rec["rows"] = len(df.toPandas())
            rec["sec"] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # noqa: BLE001 - recorded, not raised
            if timed_out.is_set():
                rec["error"] = f"TIMEOUT >{timeout_s:.0f}s (jobs cancelled)"
                rec["sec"] = round(timeout_s, 1)
            else:
                rec["error"] = f"{type(e).__name__}: {e}"[:300]
        finally:
            watchdog.cancel()
        results[n] = rec
        print(json.dumps({n: rec}), flush=True)
        spark.catalog.clearCache()
    out = {"sf_dir": sf_dir, "timeout_s": timeout_s, "results": results}
    if json_path:
        with open(json_path, "w") as f:
            json.dump(out, f, indent=1)
    print("FINAL " + json.dumps({k: v.get("sec") for k, v in results.items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
