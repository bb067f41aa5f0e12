#!/bin/bash
cd /root/repo
echo "=== ivf recall 1M post-fix ==="
python benchmark/bench_large_scale.py --n 1000000 --k 16 --graph ivf --ivf-recall 10000 > tools/r5/ivf_recall_1m_fixed.json 2> tools/r5/ivf_recall_1m_fixed.err
echo "=== spiral full fixed-2 ==="
python examples/run_spiral.py --save-pins > tools/r5/spiral_fixed2.json 2> tools/r5/spiral_fixed2.err
echo "=== diag basis 262k ==="
python tools/r5/diag_basis_262k.py 50 > tools/r5/diag_basis.json 2> tools/r5/diag_basis.err
echo "=== precond boundary v2 ==="
python tools/r5/precond_boundary.py > tools/r5/precond_boundary2.json 2> tools/r5/precond_boundary2.err
echo "ALL DONE"
