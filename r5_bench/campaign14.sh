#!/bin/bash
# Chain scaling at fixed 4096/chain keeps climbing (16384x4 697.6k ->
# 24576x6 714.9/717.1k -> 32768x8 731.6k -> 49152x12 740.8k, every
# fetch-forced agreeing). Probe deeper, plus one 2048/chain point to
# check whether the chain SIZE or the chain COUNT is the lever.
cd /root/repo
set -x
python bench.py --batch 65536 --chains 16 > r5_bench/b64k_c16.json 2> r5_bench/b64k_c16.err
python bench.py --batch 32768 --chains 16 > r5_bench/b32k_c16.json 2> r5_bench/b32k_c16.err
python bench.py --batch 98304 --chains 24 > r5_bench/b96k_c24.json 2> r5_bench/b96k_c24.err
# sum needs a same-session control (6144x6 read 74.7k vs the prior
# session's 74.8k at 4096x4) and a deeper chain point
python bench.py --protocol sum > r5_bench/sum_control.json 2> r5_bench/sum_control.err
python bench.py --protocol sum --batch 12288 --chains 12 > r5_bench/sum_b12k_c12.json 2> r5_bench/sum_b12k_c12.err
python bench.py --protocol linear --batch 49152 --chains 12 > r5_bench/lin_b48k_c12.json 2> r5_bench/lin_b48k_c12.err
echo CAMPAIGN14_DONE
