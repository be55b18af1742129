#!/bin/bash
# Tile-knob probes under the final c32 default: the NTT kernel's row tile
# was never swept (RINGZK_NTT_TILE landed this session), and the matvec
# tile rejection (tile 256) predates the chain-scaling default.
cd /root/repo
set -x
RINGZK_NTT_TILE=512 python bench.py > r5_bench/ntt_tile512.json 2> r5_bench/ntt_tile512.err
RINGZK_NTT_TILE=128 python bench.py > r5_bench/ntt_tile128.json 2> r5_bench/ntt_tile128.err
RINGZK_MATVEC_TILE=256 python bench.py > r5_bench/mv_tile256_c32.json 2> r5_bench/mv_tile256_c32.err
echo CAMPAIGN18_DONE
