#!/bin/bash
cd /root/repo
echo "=== campaign 262k fixed ==="
python examples/run_large.py --n 262144 --epochs 50 --cache-dir .mgp_cache --metrics tools/r5/campaign_262k_metrics.jsonl > tools/r5/campaign_262k_fixed.json 2> tools/r5/campaign_262k_fixed.err
echo "=== campaign 262k fixed rerun (cache demo) ==="
python examples/run_large.py --n 262144 --epochs 50 --cache-dir .mgp_cache > tools/r5/campaign_262k_fixed2.json 2> tools/r5/campaign_262k_fixed2.err
echo "=== spiral full fixed ==="
python examples/run_spiral.py --save-pins > tools/r5/spiral_fixed.json 2> tools/r5/spiral_fixed.err
echo "=== ivf recall 1M ==="
python benchmark/bench_large_scale.py --n 1000000 --k 16 --graph ivf --ivf-recall 10000 > tools/r5/ivf_recall_1m.json 2> tools/r5/ivf_recall_1m.err
echo "=== precond boundary ==="
python tools/r5/precond_boundary.py > tools/r5/precond_boundary.json 2> tools/r5/precond_boundary.err
echo "ALL DONE"
