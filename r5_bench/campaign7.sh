#!/bin/bash
# Round-5 campaign 7: re-probe previously rejected opt-in engine flags
# under the new shipped defaults (dedupe + chains 4 + batch 16384 changed
# the schedule; trace-time flags, fresh process each).
cd /root/repo
set -x
RINGZK_MATVEC_TILE=256 python bench.py  > r5_bench/probe_tile256.json 2> r5_bench/probe_tile256.err
RINGZK_FUSED_SCALAR=1 python bench.py   > r5_bench/probe_fusedscalar.json 2> r5_bench/probe_fusedscalar.err
RINGZK_STACKED=2 python bench.py --protocol linear > r5_bench/probe_stacked2_linear.json 2> r5_bench/probe_stacked2_linear.err
echo CAMPAIGN7_DONE
