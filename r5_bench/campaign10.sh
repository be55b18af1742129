#!/bin/bash
# Round-5 session-2 retune probes: the batch/chains scan bracketed the
# optimum coarsely (8192/16384/32768); probe between and above, and give
# linear/sum the same doubled-batch question the open headline got.
cd /root/repo
set -x
python bench.py --batch 24576 > r5_bench/b24k_c4.json 2> r5_bench/b24k_c4.err
python bench.py --chains 6 > r5_bench/b16k_c6.json 2> r5_bench/b16k_c6.err
python bench.py --protocol linear --batch 16384 > r5_bench/lin_b16k_c4.json 2> r5_bench/lin_b16k_c4.err
python bench.py --protocol sum --batch 8192 > r5_bench/sum_b8k_c4.json 2> r5_bench/sum_b8k_c4.err
echo CAMPAIGN10_DONE
