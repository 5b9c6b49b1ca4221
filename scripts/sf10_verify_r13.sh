#!/bin/bash
# Full-inventory sf10 Verify, fixture-family-safe chunks, 3-way parallel.
set -u
cd /root/repo
python3 - <<'PY'
import json
for c, ks in json.load(open('target/sf10_chunks.json')).items():
    open(f'target/chunk_{c}.txt','w').write(' '.join(ks))
PY
run() {
  c=$1
  echo "[gate] chunk $c start $(date +%T)"
  SPARK_GRAFT_CPUS=10 SPARK_DRIVER_MEM=20g SPARK_GRAFT_MAX_RESULT=8g \
    scripts/run_main.sh graft.Verify data/sf10 target/verify_sf10 \
    $(cat target/chunk_$c.txt) > logs/verify_sf10_r13_$c.log 2>&1
  echo "[gate] chunk $c done rc=$? $(date +%T)"
}
export -f run
printf '%s\n' sqlscan dedup sim etl stream rel wingraph | xargs -P3 -I{} bash -c 'run {}'
echo "[gate] all verify chunks done"
grep -h "\[verify\]" logs/verify_sf10_r13_*.log | grep -c " ok in " || true
grep -h "\[verify\].*failed" logs/verify_sf10_r13_*.log || echo "[gate] zero failures"
