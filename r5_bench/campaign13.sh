#!/bin/bash
# Fixed per-chain size (4096), more chains: 24576x6 measured 714.9k
# (ff 715.8k) vs 696.0-697.6k same-session controls at 16384x4. Probe
# deeper along the chain axis, repeat the winner, and give linear/sum the
# same treatment. (The earlier 32768x8 capture read 734.5k median with a
# 409.5k fetch-forced -- untrustworthy; re-measure.)
cd /root/repo
set -x
python bench.py --batch 32768 --chains 8 > r5_bench/b32k_c8_rep.json 2> r5_bench/b32k_c8_rep.err
python bench.py --batch 24576 --chains 6 > r5_bench/b24k_c6_rep.json 2> r5_bench/b24k_c6_rep.err
python bench.py --batch 49152 --chains 12 > r5_bench/b48k_c12.json 2> r5_bench/b48k_c12.err
python bench.py --protocol linear --batch 24576 --chains 6 > r5_bench/lin_b24k_c6.json 2> r5_bench/lin_b24k_c6.err
python bench.py --protocol sum --batch 6144 --chains 6 > r5_bench/sum_b6k_c6.json 2> r5_bench/sum_b6k_c6.err
echo CAMPAIGN13_DONE
