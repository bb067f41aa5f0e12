#!/bin/bash
cd /root/repo
echo "=== spiral full (10k semisup) ==="
python examples/run_spiral.py --save-pins > tools/r5/spiral_full.json 2> tools/r5/spiral_full.err
echo "=== campaign 262k 50 epochs ==="
python examples/run_large.py --n 262144 --epochs 50 --cache-dir .mgp_cache --metrics tools/r5/campaign_262k_metrics.jsonl > tools/r5/campaign_262k.json 2> tools/r5/campaign_262k.err
echo "=== campaign 262k second invocation (cache demo) ==="
python examples/run_large.py --n 262144 --epochs 50 --cache-dir .mgp_cache > tools/r5/campaign_262k_rerun.json 2> tools/r5/campaign_262k_rerun.err
echo "=== matvec-only 1M bf16 ==="
python benchmark/bench_large_scale.py --n 1000000 --k 16 --batch 128 --graph procedural --matvec-only --reps 5 --dtype bfloat16 > tools/r5/mvonly_1m_bf16.json 2> tools/r5/mvonly_1m_bf16.err
echo "ALL DONE"
