#!/bin/bash
# Retry the bench until the shared TPU tunnel exits its degraded window.
# One attempt every ~15 min, up to 20 attempts; stop at first success.
cd /root/repo
for i in $(seq 1 20); do
  echo "[loop] attempt $i at $(date +%H:%M:%S)" >&2
  APD_BENCH_INNER=1 timeout 3600 python bench.py > /tmp/bench_json.txt 2>/tmp/bench_inner_err.txt
  rc=$?
  if [ $rc -eq 0 ] && grep -q '"metric"' /tmp/bench_json.txt; then
    echo "[loop] SUCCESS on attempt $i" >&2
    cat /tmp/bench_json.txt
    exit 0
  fi
  echo "[loop] attempt $i failed rc=$rc: $(tail -1 /tmp/bench_inner_err.txt | cut -c1-100)" >&2
  sleep 900
done
echo "[loop] all attempts failed" >&2
exit 1
