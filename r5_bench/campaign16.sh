#!/bin/bash
# Validate the new shipped defaults exactly as the driver runs them, and
# probe the deeper linear/sum rungs before deciding their defaults.
cd /root/repo
set -x
python bench.py > r5_bench/default_c32_val.json 2> r5_bench/default_c32_val.err
python bench.py --protocol linear --batch 98304 --chains 24 > r5_bench/lin_b96k_c24.json 2> r5_bench/lin_b96k_c24.err
python bench.py --protocol sum --batch 24576 --chains 24 > r5_bench/sum_b24k_c24.json 2> r5_bench/sum_b24k_c24.err
python bench.py --protocol linear > r5_bench/lin_default_val.json 2> r5_bench/lin_default_val.err
python bench.py --protocol sum > r5_bench/sum_default_val.json 2> r5_bench/sum_default_val.err
echo CAMPAIGN16_DONE
