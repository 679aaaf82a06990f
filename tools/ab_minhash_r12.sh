#!/bin/bash
# Same-window interleaved A/B for the r11 minhash binary-band-key change
# (VERDICT r11 item 3): NEW = HEAD (unhex binary bucket), OLD = worktree
# at HEAD with the bucket reverted to the 32-char hex string. Control
# query dedup_jaccard rides both arms so a host-speed drift between arms
# is visible. 3 alternating rounds, solo noop-sink timing at sf0.1.
set -u
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_BENCH_REPS=3
for round in 1 2 3; do
  echo "== round $round NEW (binary key) =="
  (cd /root/repo && python tools/time_solo.py dedup_minhash_lsh dedup_jaccard 2>/dev/null | tail -4)
  echo "== round $round OLD (hex key) =="
  (cd /tmp/wt_minhash_old && python tools/time_solo.py dedup_minhash_lsh dedup_jaccard 2>/dev/null | tail -4)
done
