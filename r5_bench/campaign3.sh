#!/bin/bash
# Round-5 campaign 3: decompose CSE vs chains; retry wide kernels; record
# new defaults at N=1024/2048.
cd /root/repo
set -x
python bench.py                  > r5_bench/headline_cse.json   2> r5_bench/headline_cse.err
python bench.py --chains 4       > r5_bench/chains4_b.json      2> r5_bench/chains4_b.err
python bench.py --chains 8       > r5_bench/chains8.json        2> r5_bench/chains8.err
python bench.py --chains 3       > r5_bench/chains3.json        2> r5_bench/chains3.err
JAX_ENABLE_X64=1 python bench.py --modulus 8589934601 --batch 4096 > r5_bench/wide_pallas.json 2> r5_bench/wide_pallas.err
python bench.py --batch 16384 --chains 4 > r5_bench/b16k_c4.json 2> r5_bench/b16k_c4.err
python bench.py --n 1024         > r5_bench/n1024_cse.json      2> r5_bench/n1024_cse.err
python bench.py --n 2048         > r5_bench/n2048_gated.json    2> r5_bench/n2048_gated.err
echo CAMPAIGN3_DONE
