"""Speed-of-light (roofline) accounting for the SpMV/CG bench rows.

BASELINE.json's north-star metric is "sparse-Laplacian matvecs/s/chip at
speed-of-light"; this module computes what speed-of-light *is* for each
layout so every bench row can report achieved GB/s and %-of-peak instead of
a bare rate (round-4 VERDICT item 1). Reference analogue: none — the
reference publishes no performance numbers at all (SURVEY §6).

Model
-----
The fused SpMV kernels are HBM-bandwidth-bound (the MXU/VPU work rides under
the operand streams), so the speed-of-light rate for one Laplacian apply is

    SoL sweeps/s = HBM_peak_bytes_per_s / bytes_per_sweep

with bytes_per_sweep the *exact* HBM traffic of one kernel call (the same
formulas the kernels declare in their ``pl.CostEstimate``):

  * DIA   (ops.dia):        band block stream + operand window DMA + output
  * block streaming (ops.pallas_spmv): panel stream + per-block operand
                            slice DMA + output
  * block resident:         panel stream + one full operand read + output

A CG row additionally moves solver vector state ([N, B] passes for the
x/r/p updates, dot products and the randomwalk conjugation) that no SpMV
formulation can avoid paying at least once; ``cg_iter_bytes`` models those
passes (assuming XLA fuses each elementwise chain into one read/write pass)
so the CG rows can report BOTH "% of kernel-only speed-of-light" (strict:
what an implementation streaming only the operator could do) and "% of
solver-model speed-of-light" (the attribution: how much of the residual gap
is CG vector traffic vs kernel inefficiency).
"""

from __future__ import annotations

from typing import Optional

from ..ops.block_sparse import BLOCK, BlockLayout
from ..ops.dia import BAND_WIDTH, TILE, DiaLayout

# Peak HBM bandwidth by TPU generation (bytes/s). Sources: public TPU system
# architecture tables (jax-ml.github.io/scaling-book roofline chapter uses
# the same numbers): v4 1228 GB/s, v5e 819 GB/s, v5p 2765 GB/s, v6e 1640.
_HBM_PEAK = {
    "v4": 1228e9,
    "v5 lite": 819e9,  # device_kind "TPU v5 lite" (v5e)
    "v5e": 819e9,
    "v5p": 2765e9,
    "v5": 2765e9,
    "v6 lite": 1640e9,
    "v6e": 1640e9,
}


# Peak MXU throughput (FLOP/s) at bf16; an f32 matmul at Precision.HIGHEST
# runs the 6-pass bf16x3 emulation, so its effective peak is ~1/6 of this.
_MXU_PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
}
F32_HIGHEST_PASSES = 6


def mxu_peak_flops_per_s(device=None, dtype_bytes: int = 4) -> Optional[float]:
    """Peak MXU FLOP/s for the matmul dtype actually issued (f32 panels run
    the 6-pass HIGHEST emulation; bf16 panels run single-pass)."""
    if device is None:
        import jax

        device = jax.devices()[0]
    if device.platform != "tpu":
        return None
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in _MXU_PEAK_BF16.items():
        if key in kind:
            return bw / (F32_HIGHEST_PASSES if dtype_bytes == 4 else 1)
    return None


def block_matvec_flops(layout, batch: int) -> Optional[int]:
    """MXU FLOPs of one block-panel apply (DIA is VPU work, returns None)."""
    spec = normalize_spec(layout)
    if spec["format"] != "block":
        return None
    return 2 * spec["nrb"] * BLOCK * spec["s_max"] * BLOCK * batch


def hbm_peak_bytes_per_s(device=None) -> Optional[float]:
    """Peak HBM bandwidth of ``device`` (default: first jax device), or None
    when unknown (CPU runs: roofline fields are omitted, not faked)."""
    if device is None:
        import jax

        device = jax.devices()[0]
    if device.platform != "tpu":
        return None
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in _HBM_PEAK.items():
        if key in kind:
            return bw
    return None


def normalize_spec(layout) -> dict:
    """Layout object (DiaLayout / BlockLayout / mesh tables with
    ``s_max``+``nrb``+``rows``) or spec dict -> canonical spec dict."""
    if isinstance(layout, dict):
        return layout
    if isinstance(layout, DiaLayout):
        return {
            "format": "dia",
            "num_padded": layout.num_padded,
            "num_offsets": layout.num_offsets,
            "halfwidth": layout.halfwidth,
        }
    if isinstance(layout, BlockLayout):
        return {
            "format": "block",
            "nrb": layout.num_row_blocks,
            "s_max": layout.max_blocks,
            "num_padded": layout.num_padded,
        }
    # duck-typed mesh tables (parallel.block_spmv.MeshBlockTables)
    return {
        "format": "block",
        "nrb": layout.nrb,
        "s_max": layout.s_max,
        "num_padded": layout.rows,
    }


def matvec_bytes(
    layout,
    batch: int,
    *,
    operand_dtype_bytes: int = 4,
    buf_dtype_bytes: int = 4,
    streaming: Optional[bool] = None,
    packed_band: bool = False,
) -> dict:
    """Exact HBM bytes of ONE fused Laplacian apply for ``layout``.

    Returns a breakdown dict: {"operator", "operand", "output", "total"}.
    ``streaming`` picks the block-kernel schedule (None = the same
    byte-count dispatch make_matvec_ad uses); DIA has one schedule.
    ``packed_band`` accounts the [nt, D, TILE] packed band stream (the
    round-5 kernel); False gives the legacy [Npd, 128]-wide band.

    ``layout`` may also be a plain spec dict (for callers holding mesh
    tables rather than a single-chip layout object):
      {"format": "block", "nrb": ..., "s_max": ..., "num_padded": ...} or
      {"format": "dia", "num_padded": ..., "num_offsets": ..., "halfwidth": ...}
    """
    layout = normalize_spec(layout)
    if layout["format"] == "dia":
        npd, d, w = (
            layout["num_padded"],
            layout["num_offsets"],
            layout["halfwidth"],
        )
        nt = npd // TILE
        if packed_band:
            operator = nt * d * TILE * buf_dtype_bytes  # packed [nt, D, TILE]
        else:
            operator = npd * BAND_WIDTH * buf_dtype_bytes
        operand = nt * (TILE + 2 * w) * batch * operand_dtype_bytes
        output = npd * batch * operand_dtype_bytes
        return {
            "format": "dia",
            "operator": operator,
            "operand": operand,
            "output": output,
            "total": operator + operand + output,
        }
    nrb = layout["nrb"]
    s = layout["s_max"]
    npd = layout["num_padded"]
    operator = nrb * BLOCK * s * BLOCK * buf_dtype_bytes
    if streaming is None:
        # mirror ops.pallas_spmv.make_matvec_ad's physical-VMEM dispatch
        phys = npd * max(batch, BLOCK) * operand_dtype_bytes
        streaming = phys > 8 * 2**20
    if streaming:
        operand = nrb * s * BLOCK * batch * operand_dtype_bytes
    else:
        operand = npd * batch * operand_dtype_bytes  # one HBM->VMEM read
    output = nrb * BLOCK * batch * operand_dtype_bytes
    return {
        "format": "block-stream" if streaming else "block-resident",
        "operator": operator,
        "operand": operand,
        "output": output,
        "total": operator + operand + output,
    }


def cg_iter_bytes(
    layout,
    batch: int,
    nu: int,
    *,
    operand_dtype_bytes: int = 4,
    buf_dtype_bytes: int = 4,
    streaming: Optional[bool] = None,
    randomwalk: bool = True,
    jacobi: bool = False,
    packed_band: bool = False,
) -> dict:
    """Modeled HBM bytes of ONE CG iteration on the Matérn precision
    Q = (shift I + L)^nu (shift folded into the operator buffer, so a
    Q-matvec is nu bare kernel calls + the randomwalk D^{1/2} conjugation).

    Vector-state model (V = one [Npd, B] pass), assuming XLA fuses each
    elementwise chain into one read+write sweep:
      entry conjugation   read p, write t                    2V
      exit  conjugation   read t, write ap (+ fused p.ap)    2V (+1V read p)
      x,r updates + rs    read x,r,p,ap write x,r            6V
      p update            read r,p write p                   3V
      [jacobi] z = r/diag read r,diag write z                +2V
    Reported as "vector" alongside the nu kernel applies; conjugation off
    for symmetric normalization.
    """
    mv = matvec_bytes(
        layout,
        batch,
        operand_dtype_bytes=operand_dtype_bytes,
        buf_dtype_bytes=buf_dtype_bytes,
        streaming=streaming,
        packed_band=packed_band,
    )
    npd = normalize_spec(layout)["num_padded"]
    v_pass = npd * batch * operand_dtype_bytes
    passes = 9.0  # x/r/p updates + p.ap read
    if randomwalk:
        passes += 4.0
    if jacobi:
        passes += 2.0
    vector = passes * v_pass
    total = nu * mv["total"] + vector
    return {
        "format": mv["format"],
        "kernel": nu * mv["total"],
        "kernel_per_apply": mv["total"],
        "operator_per_apply": mv["operator"],
        "vector": vector,
        "total": total,
    }


def roofline_fields(
    layout,
    batch: int,
    nu: int,
    measured_matvecs_per_s: float,
    *,
    operand_dtype_bytes: int = 4,
    buf_dtype_bytes: int = 4,
    streaming: Optional[bool] = None,
    randomwalk: bool = True,
    jacobi: bool = False,
    device=None,
    packed_band: bool = False,
) -> dict:
    """The JSON fields every CG bench row should carry (round-4 VERDICT
    item 1). ``measured_matvecs_per_s`` counts Laplacian-equivalent matvecs
    (batch columns x nu applies per CG iteration — the bench convention).

    * ``bytes_per_matvec_kernel``: exact kernel traffic per apply (per
      batch-column share);
    * ``achieved_gbps``: solver-model bytes moved x measured rate;
    * ``pct_of_hbm_peak``: achieved / peak (the headline SoL number);
    * ``pct_of_sol_kernel``: measured rate / rate a perfect implementation
      paying ONLY kernel traffic would hit — the strict speed-of-light;
    * ``kernel_share``: fraction of modeled bytes that are operator stream
      (the rest is CG vector state — the attribution).
    """
    it = cg_iter_bytes(
        layout,
        batch,
        nu,
        operand_dtype_bytes=operand_dtype_bytes,
        buf_dtype_bytes=buf_dtype_bytes,
        streaming=streaming,
        randomwalk=randomwalk,
        jacobi=jacobi,
        packed_band=packed_band,
    )
    # per Laplacian-equivalent matvec (bench rate = iters * nu * batch / s)
    bytes_per_matvec_solver = it["total"] / (nu * batch)
    bytes_per_matvec_kernel = it["kernel_per_apply"] / batch
    achieved = measured_matvecs_per_s * bytes_per_matvec_solver
    peak = hbm_peak_bytes_per_s(device)
    out = {
        "spmv_format": it["format"],
        "bytes_per_matvec_kernel": round(bytes_per_matvec_kernel, 1),
        "bytes_per_matvec_solver_model": round(bytes_per_matvec_solver, 1),
        "kernel_share": round(it["kernel"] / it["total"], 3),
        "achieved_gbps": round(achieved / 1e9, 1),
    }
    if peak:
        sol_kernel = peak / bytes_per_matvec_kernel
        out["hbm_peak_gbps"] = round(peak / 1e9, 1)
        out["pct_of_hbm_peak"] = round(100.0 * achieved / peak, 1)
        out["sol_matvecs_per_s_kernel"] = round(sol_kernel, 1)
        out["pct_of_sol_kernel"] = round(
            100.0 * measured_matvecs_per_s / sol_kernel, 1
        )
    return out
