#!/bin/sh
# One TPU window, ordered so a late crash cannot void earlier work:
#   1. triage the chunked DCF-AES kernel at the round-3 crash shape
#      (2^19) in an isolated subprocess (a faulted worker poisons the
#      process backend, CLAUDE.md);
#   2. run the full measurement campaign (gate -> headline -> registry
#      -> roofline -> full verify sweep -> gen sweep), routing around
#      the DCF-AES row iff step 1 failed.
# All artifacts land in scripts/artifacts/. Logs: scripts/artifacts/window_*.log
set -u
cd "$(dirname "$0")/.."
ART=scripts/artifacts
mkdir -p "$ART"

echo "window: triage single@2^19 (chunked dispatch)" >&2
python scripts/triage_dcf_aes.py --step single --log2-batch 19 \
    >"$ART/window_triage.log" 2>&1
TRIAGE_RC=$?
echo "window: triage rc=$TRIAGE_RC" >&2

if [ "$TRIAGE_RC" -ne 0 ]; then
    echo "window: DCF-AES still faults at 2^19 - skipping its row" >&2
    export FSS_BENCH_SKIP=dcf_eval_aes_uint_16bit
fi

python scripts/tpu_campaign.py --sweep scripts/sweeps/gen_sweep.py \
    >"$ART/window_campaign.log" 2>"$ART/window_campaign.err"
RC=$?
echo "window: campaign rc=$RC" >&2
exit $RC
