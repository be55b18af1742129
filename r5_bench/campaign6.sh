#!/bin/bash
# Round-5 campaign 6: refresh the CI bench artifact (bench_all) on chip.
cd /root/repo
set -x
python scripts/bench_all.py --batch 4096 --out bench_results.json 2> r5_bench/bench_all.tbl
echo CAMPAIGN6_DONE
