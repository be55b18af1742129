#!/bin/bash
# Round-5 campaign 5: the shipped-default band -- three fresh headline runs
# plus linear/sum at the new defaults (plain `python bench.py ...`).
cd /root/repo
set -x
python bench.py                  > r5_bench/final_open_1.json 2> r5_bench/final_open_1.err
python bench.py                  > r5_bench/final_open_2.json 2> r5_bench/final_open_2.err
python bench.py                  > r5_bench/final_open_3.json 2> r5_bench/final_open_3.err
python bench.py --protocol linear > r5_bench/final_linear.json 2> r5_bench/final_linear.err
python bench.py --protocol sum    > r5_bench/final_sum.json    2> r5_bench/final_sum.err
echo CAMPAIGN5_DONE
