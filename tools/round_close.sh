#!/bin/bash
# End-of-round artifact refresh chain. Run FULLY DETACHED so it survives
# the driving session:
#
#   setsid nohup tools/round_close.sh <round> </dev/null >/tmp/round_close.out 2>&1 &
#
# Regenerates, in order: PLANS.md (plan inventory), VERIFY_LOCAL_r<N>.txt
# (sf0.01), VERIFY_LOCAL_r<N>_sf01.txt (sf0.1), full pytest, and the solo
# sf0.1 bench (BENCH_LOCAL.json + BENCH_LOCAL_r<N>.json). Each stage
# git-commits its own artifact on success, so a mid-chain kill loses at
# most the in-flight stage. Stages run sequentially — the bench stage
# assumes an otherwise-idle box (CLAUDE.md rule 5).
set -u
ROUND="${1:?usage: round_close.sh <round-number>}"
cd "$(dirname "$0")/.."
exec > "/tmp/round_close_r${ROUND}.log" 2>&1
echo "=== chain start $(date)"

# Stage 1: plan inventory. A flag is a '!'-suffixed token in the flags
# column of a table row — prose in the header legend must not match.
python tools/plan_inventory.py /root/testdata/sf0.01 > /tmp/PLANS_rc.md
rc=$?
flags=$(awk -F'|' 'NF>5 && $7 ~ /!/' /tmp/PLANS_rc.md)
if [ $rc -eq 0 ] && [ -z "$flags" ]; then
    cp /tmp/PLANS_rc.md PLANS.md
    git add PLANS.md && git commit -q -m "Regenerate PLANS.md ($(grep -c '^| ' /tmp/PLANS_rc.md)-row inventory, zero flags)

No-Verification-Needed: regenerated plan-inventory artifact"
    echo "=== stage1 PLANS committed $(date)"
else
    echo "=== stage1 PLANS FLAGGED (rc=$rc) — not committed"; echo "$flags"
fi

# Stages 2+3: full verify at both SFs
for sf in 0.01 0.1; do
    suffix=""; [ "$sf" = "0.1" ] && suffix="_sf01"
    out="/tmp/VERIFY_rc${suffix}.txt"
    python tools/verify_local.py "/root/testdata/sf${sf}" > "$out" 2>"/tmp/verify_rc${suffix}.err"
    summary=$(tail -1 "$out")
    if echo "$summary" | grep -q " 0 fail"; then
        cp "$out" "VERIFY_LOCAL_r${ROUND}${suffix}.txt"
        git add "VERIFY_LOCAL_r${ROUND}${suffix}.txt" && git commit -q -m "Refresh sf${sf} verify artifact: ${summary}

No-Verification-Needed: committed output of the verify run itself"
        echo "=== verify sf${sf} committed $(date): ${summary}"
    else
        echo "=== verify sf${sf} HAS FAILURES — not committed: ${summary}"
    fi
done

# Stage 4: full pytest (gate only; result recorded in the log)
python -m pytest tests/ -q > /tmp/pytest_rc.txt 2>&1
echo "=== pytest done $(date): $(tail -2 /tmp/pytest_rc.txt | head -1)"

# Stage 5: solo bench at sf0.1
python bench.py > /tmp/bench_rc.json 2>/tmp/bench_rc.err
summarize() {
    tail -1 /tmp/bench_rc.json | python -c 'import json,sys
d = json.loads(sys.stdin.read())
print("%.1f s / %d queries, spread %.2f, %.0f uploads/s"
      % (d["value"], d["n_queries"], d.get("spread", 0),
         d.get("uploads_per_sec", 0)))'
}
if [ -s BENCH_LOCAL.json ] && summary=$(summarize 2>/dev/null); then
    cp BENCH_LOCAL.json "BENCH_LOCAL_r${ROUND}.json"
    git add BENCH_LOCAL.json "BENCH_LOCAL_r${ROUND}.json" && git commit -q -m "Final round-${ROUND} bench: ${summary}

No-Verification-Needed: committed output of the bench run itself"
    echo "=== bench committed $(date): ${summary}"
else
    echo "=== bench FAILED — not committed"
fi
echo "=== chain done $(date)"
