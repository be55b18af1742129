#!/bin/bash
# Round-5 on-chip campaign 1: headline sanity, colblock A/B at N=1024/2048,
# wide-ring rows. Fresh process per config (RINGZK_* flags are trace-time).
cd /root/repo
set -x
python bench.py                           > r5_bench/headline_default.json 2> r5_bench/headline_default.err
python bench.py --n 1024                  > r5_bench/n1024_colblock.json   2> r5_bench/n1024_colblock.err
RINGZK_PALLAS_MATVEC=0 python bench.py --n 1024 > r5_bench/n1024_xla.json  2> r5_bench/n1024_xla.err
python bench.py --n 2048                  > r5_bench/n2048_colblock.json   2> r5_bench/n2048_colblock.err
RINGZK_PALLAS_MATVEC=0 python bench.py --n 2048 > r5_bench/n2048_xla.json  2> r5_bench/n2048_xla.err
JAX_ENABLE_X64=1 python bench.py --modulus 8589934601 --batch 4096 > r5_bench/wide_pallas.json 2> r5_bench/wide_pallas.err
JAX_ENABLE_X64=1 RINGZK_PALLAS=0 python bench.py --modulus 8589934601 --batch 4096 > r5_bench/wide_xla.json 2> r5_bench/wide_xla.err
echo CAMPAIGN1_DONE
