#!/bin/bash
# Round-5 campaign 8: refresh stale scan rows under the shipped defaults.
cd /root/repo
set -x
python bench.py --n 128                   > r5_bench/n128_r5.json  2> r5_bench/n128_r5.err
python bench.py --batch 65536             > r5_bench/b64k_c4.json  2> r5_bench/b64k_c4.err
python bench.py --batch 8192              > r5_bench/b8k_c4_r5.json 2> r5_bench/b8k_c4_r5.err
echo CAMPAIGN8_DONE
