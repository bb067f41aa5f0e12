#!/bin/bash
# Round-5 measurement batch 1 (serialized: 2 host CPUs)
cd /root/repo
echo "=== bench.py full ==="
python bench.py > tools/r5/bench_full.json 2> tools/r5/bench_full.err
echo "=== matvec-only 1M k16 procedural ==="
python benchmark/bench_large_scale.py --n 1000000 --k 16 --batch 128 --graph procedural --matvec-only --reps 5 > tools/r5/mvonly_1m_k16.json 2> tools/r5/mvonly_1m_k16.err
echo "=== matvec-only 262k k50 procedural ==="
python benchmark/bench_large_scale.py --n 262144 --k 50 --batch 128 --graph procedural --matvec-only --reps 5 > tools/r5/mvonly_262k_k50.json 2> tools/r5/mvonly_262k_k50.err
echo "=== single-device CG 1M k16 procedural (roofline fields) ==="
python benchmark/bench_large_scale.py --n 1000000 --k 16 --batch 128 --cg-iters 50 --graph procedural --reps 3 > tools/r5/cg_1m_k16.json 2> tools/r5/cg_1m_k16.err
echo "ALL DONE"
