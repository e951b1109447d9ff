"""Analytic FLOP/byte accounting + TPU v5e roofline model.

Every benchmark row carries a Work estimate; the harness converts the
measured wall clock into achieved TFLOP/s and %-of-roofline, and REJECTS
any measurement that implies more than the hardware peak (the round-1
table published an MVM at an implied 8,590 TFLOP/s — see VERDICT.md).

Peaks (TPU v5e / "v5 lite", one chip, public spec):
  * MXU:  197 TFLOP/s bf16 (fp32 inputs matmul at the same rate under
    JAX's default one-pass-bf16 precision; fp32 "highest" is ~1/6).
  * VPU:  8x128 lanes x 4 ALUs x 2 (FMA) x ~1.5 GHz = ~12.3 TFLOP/s
    fp32 elementwise (approximate — used for bound labeling only).
  * HBM:  819 GB/s.
Transcendentals (exp, log, ...) run on the VPU at a fraction of FMA
rate; we cost each at ~8 VPU slots (empirically 5-15 on TPU).
"""

from __future__ import annotations

from dataclasses import dataclass, field

PEAK_MXU = 197e12       # bf16 (and default-precision f32) matmul FLOP/s
PEAK_VPU = 12.3e12      # approximate fp32 elementwise FLOP/s
HBM_BW = 819e9          # bytes/s
TRANS_COST = 8.0        # VPU-op equivalents per transcendental


@dataclass
class Work:
    """Algorithmic-minimum work for one application of an op."""
    mxu: float = 0.0         # matmul FLOPs (2*m*n*k per matmul)
    vpu: float = 0.0         # elementwise FLOPs
    trans: float = 0.0       # transcendental evaluations
    hbm_bytes: float = 0.0   # unavoidable HBM traffic
    note: str = ""

    @property
    def flops(self) -> float:
        return self.mxu + self.vpu + self.trans

    def roofline_seconds(self) -> float:
        """Best possible wall clock: each resource at its peak."""
        return max(self.mxu / PEAK_MXU,
                   (self.vpu + TRANS_COST * self.trans) / PEAK_VPU,
                   self.hbm_bytes / HBM_BW)

    def bound(self) -> str:
        """Which resource sets the roofline."""
        t_mxu = self.mxu / PEAK_MXU
        t_vpu = (self.vpu + TRANS_COST * self.trans) / PEAK_VPU
        t_hbm = self.hbm_bytes / HBM_BW
        m = max(t_mxu, t_vpu, t_hbm)
        if m == 0:
            return "latency"
        return {t_mxu: "MXU", t_vpu: "VPU", t_hbm: "HBM"}[m]

    def sanity_floor(self) -> float:
        """Hard lower bound on wall clock; measurements below ~this are
        physically impossible and must be rejected. Uses only the MXU
        peak + HBM bandwidth (the two numbers we trust exactly); the
        approximate VPU peak gets 4x headroom so an aggressive XLA
        fusion can't be misflagged."""
        return max(self.mxu / PEAK_MXU,
                   (self.vpu + self.trans) / (4 * PEAK_VPU),
                   self.hbm_bytes / (1.05 * HBM_BW))


def summarize(work: Work, seconds: float) -> dict:
    """TFLOP/s + %roofline fields for a benchmark row."""
    if seconds <= 0:
        return {"valid": False, "why": "non-positive time"}
    out = {
        "tflops": work.flops / seconds / 1e12,
        "roofline_pct": 100.0 * work.roofline_seconds() / seconds,
        "bound": work.bound(),
        "valid": True,
    }
    if seconds < 0.9 * work.sanity_floor():
        out["valid"] = False
        out["why"] = (f"IMPOSSIBLE: implies {out['tflops']:.0f} TFLOP/s "
                      f"(> hardware peak); floor {work.sanity_floor():.2e}s")
    return out
