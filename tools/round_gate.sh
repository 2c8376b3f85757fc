#!/usr/bin/env bash
# One-command round-readiness gate: run before a round closes.
#   bash tools/round_gate.sh
# 1. full pytest suite
# 2. exact driver-window replay at sf0.01 (what CORRECTNESS_rNN checks)
# 3. headline bench at sf0.1 (what BENCH_rNN records)
# 4. same-host drift reference: previous round's tip re-benched next to
#    the current tree (writes BENCH_host_reference_rNN.json) — makes
#    round-over-round bench deltas measurable, not host-noise inference
# 5. plan audit: per-headline plan properties written to PLANS_rNN.md —
#    keeps the r5+ audit trail unbroken as a gate output, not a memory
# 6. gate receipt: ROUND_GATE.json records the source fingerprint the
#    suite was green ON (VERDICT r12: an io.py edit shipped after the
#    gate and turned the committed tree red). Before the snapshot
#    commit, `python tools/gate_fingerprint.py --assert` must pass —
#    and tests/test_round_gate_contract.py turns red next round if a
#    committed receipt disagrees with its own commit's tree.
# Exits nonzero on the first failure.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/6 pytest =="
python -m pytest tests/ -q

echo "== 2/6 driver window replay (sf0.01) =="
python tools/driver_sim.py --window --json /tmp/CORRECTNESS_local.json \
    2>/dev/null | tail -3

echo "== 3/6 bench (sf0.1) =="
python bench.py 2>/dev/null | grep '"metric"'

echo "== 4/6 same-host drift reference =="
python tools/host_reference.py

echo "== 5/6 plan audit =="
ROUND=$(python - <<'PY'
import glob, os, re
rounds = [int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
          for f in glob.glob("CORRECTNESS_r*.json")]
print(max(rounds) + 1 if rounds else 1)
PY
)
python tools/plan_audit.py 2>/dev/null > "PLANS_r${ROUND}.md"
echo "wrote PLANS_r${ROUND}.md"

echo "== 6/6 gate receipt =="
python tools/gate_fingerprint.py --suite-ran > ROUND_GATE.json
python tools/gate_fingerprint.py --assert

echo "ROUND GATE: all green"
