#!/bin/bash
# Round-5 on-chip campaign 2: MXU-idle levers (stagger, chains, batch),
# trace attribution, baseline configs, per-phase tables.
cd /root/repo
set -x
RINGZK_STAGGER=1 python bench.py          > r5_bench/stagger.json        2> r5_bench/stagger.err
python bench.py --chains 4                > r5_bench/chains4.json        2> r5_bench/chains4.err
python bench.py --batch 16384             > r5_bench/batch16k.json       2> r5_bench/batch16k.err
python scripts/trace_attribution.py       > r5_bench/trace_attr.txt      2> r5_bench/trace_attr.err
python scripts/baseline_configs.py        > r5_bench/baseline_configs.jsonl 2> r5_bench/baseline_configs.err
python bench.py --full                    > r5_bench/full_open.json      2> r5_bench/full_open.tbl
python bench.py --protocol linear --full  > r5_bench/full_linear.json    2> r5_bench/full_linear.tbl
python bench.py --protocol sum --full     > r5_bench/full_sum.json       2> r5_bench/full_sum.tbl
echo CAMPAIGN2_DONE
