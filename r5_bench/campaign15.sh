#!/bin/bash
# Chain-scaling continues to climb past c12 (c16 752.6k, c24 758.5k,
# both at 4096/chain). Find the knee: c32 and c48, plus a repeat of the
# c24 rung; ship the best robust config as the default.
cd /root/repo
set -x
python bench.py --batch 131072 --chains 32 > r5_bench/b128k_c32.json 2> r5_bench/b128k_c32.err
python bench.py --batch 98304 --chains 24 > r5_bench/b96k_c24_rep.json 2> r5_bench/b96k_c24_rep.err
python bench.py --batch 196608 --chains 48 > r5_bench/b192k_c48.json 2> r5_bench/b192k_c48.err
echo CAMPAIGN15_DONE
