#!/bin/bash
cd /root/repo
set -x
RINGZK_STAGGER=1 python bench.py --chains 2 > r5_bench/stagger_fixed.json 2> r5_bench/stagger_fixed.err
python bench.py --chains 2                  > r5_bench/c2_control.json    2> r5_bench/c2_control.err
python bench.py                             > r5_bench/default_control.json 2> r5_bench/default_control.err
echo CAMPAIGN9_DONE
