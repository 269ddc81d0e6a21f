#!/usr/bin/env bash
# Run the full CPU suite and pin the result as a driver-style artifact
# (TESTS_rNN.json) so "suite green" claims carry evidence the way
# BENCH_rNN.json / MULTICHIP_rNN.json do (ADVICE r4: pin a test-run
# artifact instead of asserting exit 0).
#   usage: benchmarks/run_tests_artifact.sh [round-tag, e.g. r05]
set -uo pipefail
cd "$(dirname "$0")/.."
TAG="${1:-r05}"
OUT="TESTS_${TAG}.json"
LOG=$(mktemp)
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q 2>&1 | tee "$LOG"
RC=${PIPESTATUS[0]}
TAIL=$(grep -E "[0-9]+ (passed|failed|error)" "$LOG" | tail -1)
[ -n "$TAIL" ] || TAIL=$(tail -1 "$LOG")
python - "$OUT" "$RC" "$TAIL" <<'EOF'
import json, subprocess, sys
out, rc, tail = sys.argv[1], int(sys.argv[2]), sys.argv[3]
head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                      text=True).stdout.strip()
json.dump({"rc": rc, "ok": rc == 0, "summary": tail, "commit": head},
          open(out, "w"), indent=1)
print(f"wrote {out}: rc={rc} {tail}")
EOF
exit "$RC"
