#!/bin/sh
# One TPU window: the full measurement campaign (gate -> headline ->
# registry -> roofline -> full verify sweep -> sweeps). The pre-headline
# gate golden-checks one config per timed kernel family on-device, so a
# faulting kernel is caught before anything is timed; a raising registry
# row is dropped, not fatal (bench.py _row). Artifacts land in
# scripts/artifacts/. For crash bisection use scripts/triage_dcf_aes.py
# (--bracket, or --step gen/packtile/single/loop) — its 2026-08-19 log
# root-caused the round-3 worker crash.
set -u
cd "$(dirname "$0")/.."
ART=scripts/artifacts
mkdir -p "$ART"

python scripts/tpu_campaign.py "$@" \
    >"$ART/window_campaign.log" 2>"$ART/window_campaign.err"
RC=$?
echo "window: campaign rc=$RC" >&2
exit $RC
