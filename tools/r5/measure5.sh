#!/bin/bash
cd /root/repo
echo "=== campaign 262k chebyshev ==="
python examples/run_large.py --n 262144 --epochs 50 --cache-dir .mgp_cache --metrics tools/r5/campaign_262k_metrics2.jsonl > tools/r5/campaign_262k_cheb.json 2> tools/r5/campaign_262k_cheb.err
echo "=== campaign 262k chebyshev rerun (cache demo) ==="
python examples/run_large.py --n 262144 --epochs 50 --cache-dir .mgp_cache > tools/r5/campaign_262k_cheb2.json 2> tools/r5/campaign_262k_cheb2.err
echo "=== spiral full chunked ==="
python examples/run_spiral.py --save-pins > tools/r5/spiral_chunked.json 2> tools/r5/spiral_chunked.err
echo "ALL DONE"
