#!/bin/bash
# Round-5 campaign 4: batch x chains scan around the 700k point; per-
# protocol retunes.
cd /root/repo
set -x
python bench.py --batch 16384 --chains 4  > r5_bench/b16k_c4_rep.json  2> r5_bench/b16k_c4_rep.err
python bench.py --batch 16384 --chains 8  > r5_bench/b16k_c8.json      2> r5_bench/b16k_c8.err
python bench.py --batch 32768 --chains 4  > r5_bench/b32k_c4.json      2> r5_bench/b32k_c4.err
python bench.py --batch 32768 --chains 8  > r5_bench/b32k_c8.json      2> r5_bench/b32k_c8.err
python bench.py --protocol linear --batch 8192 --chains 4 > r5_bench/lin_b8k_c4.json 2> r5_bench/lin_b8k_c4.err
python bench.py --protocol sum --batch 4096 --chains 4    > r5_bench/sum_b4k_c4.json 2> r5_bench/sum_b4k_c4.err
echo CAMPAIGN4_DONE
