#!/bin/bash
# Shared challenge-transform probe (RINGZK_SHARED_DHAT): create_response
# transforms d at the verifier's prime-subset size so the two Pallas
# forward custom-calls are identical and XLA CSEs one whole plane-set.
# Same-session control: r5s2 697.6k (ff 700.8k).
cd /root/repo
set -x
RINGZK_SHARED_DHAT=1 python bench.py > r5_bench/sharedd_open.json 2> r5_bench/sharedd_open.err
RINGZK_SHARED_DHAT=1 python bench.py --protocol linear > r5_bench/sharedd_linear.json 2> r5_bench/sharedd_linear.err
RINGZK_SHARED_DHAT=1 python bench.py --protocol sum > r5_bench/sharedd_sum.json 2> r5_bench/sharedd_sum.err
python bench.py > r5_bench/sharedd_control2.json 2> r5_bench/sharedd_control2.err
# linear batch retune needs a same-session control (16384x4 read 201.2k
# against the prior session's 196.4k shipped number)
python bench.py --protocol linear --batch 8192 > r5_bench/lin_b8k_control.json 2> r5_bench/lin_b8k_control.err
# same per-chain size as the 16384x4 optimum, more chains
python bench.py --batch 24576 --chains 6 > r5_bench/b24k_c6.json 2> r5_bench/b24k_c6.err
echo CAMPAIGN11_DONE
