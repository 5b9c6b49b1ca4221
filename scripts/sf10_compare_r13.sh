#!/bin/bash
# DuckDB oracle compare over the full sf10 verify dump (run AFTER the
# verify chunks finish and the box is quiet — DuckDB gets 56 GB).
set -u
cd /root/repo
python3 scripts/precheck.py data/sf10 target/verify_sf10 --skip-verify \
  > logs/cmp_sf10_r13_full.log 2>&1
rc=$?
tail -3 logs/cmp_sf10_r13_full.log
exit $rc
