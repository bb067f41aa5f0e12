#!/usr/bin/env python3
"""Convert the reference's pretrained hyperparameter state dicts
(``/root/reference/models/*.pth``, torch state dicts of ~15 scalars) into
this framework's portable ``.npz`` hyperparameter checkpoints under
``manifold_gp_tpu/pretrained/``.

We store the *constrained* values (noise, outputscale, lengthscale,
graphbandwidth, mean_constant) plus the constraint lower bounds; loaders
re-derive raw parameters through the matching constraint transforms
(manifold_gp_tpu.parameters mirrors GPyTorch's softplus semantics, so the
round trip is exact to fp32).

Run once: python tools/convert_reference_states.py
"""

import pathlib
import sys

import numpy as np
import torch
import torch.nn.functional as F

REF = pathlib.Path("/root/reference/models")
OUT = pathlib.Path(__file__).resolve().parent.parent / "manifold_gp_tpu" / "pretrained"

FILES = [
    "1D_manifold_semisupervised",
    "1D_vanilla_semisupervised",
    "srmnist_manifold_supervised",
    "srmnist_manifold_semisupervised",
    "srmnist_vanilla_supervised",
    "srmnist_vanilla_semisupervised",
]


def convert(name: str):
    sd = torch.load(REF / f"{name}.pth", map_location="cpu", weights_only=True)

    def val(raw_key, lb_key=None):
        raw = sd[raw_key].double()
        lb = float(sd[lb_key].item()) if lb_key and lb_key in sd else 0.0
        return float((F.softplus(raw) + lb).item()), lb

    out = {}
    out["noise"], out["noise_lb"] = val(
        "likelihood.noise_covar.raw_noise",
        "likelihood.noise_covar.raw_noise_constraint.lower_bound",
    )
    out["mean_constant"] = float(sd["mean_module.raw_constant"].item())
    out["outputscale"], _ = val("covar_module.raw_outputscale")
    out["lengthscale"], _ = val("covar_module.base_kernel.raw_lengthscale")
    if "covar_module.base_kernel.raw_graphbandwidth" in sd:
        out["graphbandwidth"], out["graphbandwidth_lb"] = val(
            "covar_module.base_kernel.raw_graphbandwidth",
            "covar_module.base_kernel.raw_graphbandwidth_constraint.lower_bound",
        )
    np.savez(OUT / f"{name}.npz", **{k: np.float64(v) for k, v in out.items()})
    print(name, {k: round(v, 6) for k, v in out.items()})


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name in FILES:
        convert(name)


if __name__ == "__main__":
    main()
