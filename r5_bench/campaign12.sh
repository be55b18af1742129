#!/bin/bash
# NTT kernel row-tile sweep: TILE_B=256 was never probed (the matvec
# kernel's tile was, RINGZK_MATVEC_TILE). Headline config, fresh process
# per tile.
cd /root/repo
set -x
RINGZK_NTT_TILE=512 python bench.py > r5_bench/ntt_tile512.json 2> r5_bench/ntt_tile512.err
RINGZK_NTT_TILE=128 python bench.py > r5_bench/ntt_tile128.json 2> r5_bench/ntt_tile128.err
RINGZK_NTT_TILE=1024 python bench.py > r5_bench/ntt_tile1024.json 2> r5_bench/ntt_tile1024.err
echo CAMPAIGN12_DONE
