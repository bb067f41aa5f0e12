#!/usr/bin/env python3
"""One-time conversion of the reference mesh assets into this package's
numpy data format (manifold_gp_tpu/data/*.npz).

The geometry (dumbbell 1D mesh, Stanford dragon) is a dataset, not code; we
re-serialize it so the framework is standalone. Run with the reference repo
mounted at /root/reference (or pass paths)."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from manifold_gp_tpu.utils.datasets import parse_msh, parse_stl  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / "manifold_gp_tpu" / "data"


def main():
    ref = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/manifold_gp/data")
    OUT.mkdir(parents=True, exist_ok=True)
    v, e = parse_msh(ref / "dumbbell.msh")
    np.savez_compressed(OUT / "dumbbell.npz", vertices=v, edges=e)
    print("dumbbell:", v.shape, e.shape)
    vv, ff = parse_stl(ref / "dragon.stl")
    np.savez_compressed(OUT / "dragon.npz", vertices=vv, faces=ff)
    print("dragon:", vv.shape, ff.shape)


if __name__ == "__main__":
    main()
