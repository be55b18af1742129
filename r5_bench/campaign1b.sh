#!/bin/bash
cd /root/repo
set -x
python bench.py --n 2048                  > r5_bench/n2048_colblock.json  2> r5_bench/n2048_colblock.err
JAX_ENABLE_X64=1 python bench.py --modulus 8589934601 --batch 4096 > r5_bench/wide_pallas.json 2> r5_bench/wide_pallas.err
echo CAMPAIGN1B_DONE
