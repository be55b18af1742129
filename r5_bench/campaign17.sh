#!/bin/bash
# Chain-scaling retune for the other scan rows: the N-degree scan and the
# wide-ring row shipped at chains 4; give them the deep-chain treatment
# (per-chain sized to keep per-proof memory x chain count comparable).
cd /root/repo
set -x
python bench.py --n 1024 --batch 49152 --chains 12 > r5_bench/n1024_c12.json 2> r5_bench/n1024_c12.err
python bench.py --n 2048 --batch 24576 --chains 12 > r5_bench/n2048_c12.json 2> r5_bench/n2048_c12.err
JAX_ENABLE_X64=1 python bench.py --modulus 8589934601 --batch 49152 --chains 12 > r5_bench/wide_c12.json 2> r5_bench/wide_c12.err
echo CAMPAIGN17_DONE
