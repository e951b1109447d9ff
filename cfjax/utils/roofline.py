"""Analytic FLOP/byte accounting + CALIBRATED TPU v5e roofline model.

Every benchmark row carries a Work estimate; the harness converts the
measured wall clock into achieved TFLOP/s and %-of-roofline, and REJECTS
any measurement that implies more than the hardware peak (the round-1
table published an MVM at an implied 8,590 TFLOP/s — see VERDICT.md).

Peaks (TPU v5e / "v5 lite", one chip, public spec):
  * MXU:  197 TFLOP/s bf16 (fp32 inputs matmul at the same rate under
    JAX's default one-pass-bf16 precision; fp32 "highest" is ~1/6).
    The MXU executes matmuls in 128-granular tiles: a matmul whose
    contraction (K) or output-minor (N) dim is d < 128 runs at the cost
    of d = 128 — `Work.mxu_exec` carries those executed-granularity
    FLOPs so small-d derivative-block MVMs are judged against the bound
    the hardware actually imposes (VERDICT r3: the r2 table called the
    gradient d=16 row "24% of VPU" against a bound 8x below what the
    MXU can deliver for K=16 matmuls).
  * VPU:  8x128 lanes x 4 ALUs x ~1.49 GHz = ~6.1e12 SLOTS/s, where a
    slot is one lane-op (an FMA is 1 slot / 2 FLOPs). Per-op slot costs
    below are MEASURED on the chip by differential fused-MVM timing
    (benchmarks/calibrate_vpu.py): time an n² kernel-tile MVM with and
    without the op in the profile; the delta per element is its slot
    cost in real fused context (standalone elementwise benchmarks are
    HBM-bound and useless for this).
  * HBM:  819 GB/s.

Measured slot costs (v5e, 2026-08, calibrate_vpu.py):
    mul/add/max/cmp/where ~1      exp   3.2       sqrt  10.1
    rsqrt ~6                      distance-tile + vector contraction
                                  base of the blocked iso MVM: 12.4
"""

from __future__ import annotations

from dataclasses import dataclass, field

PEAK_MXU = 197e12       # bf16 (and default-precision f32) matmul FLOP/s
VPU_SLOTS = 6.1e12      # measured lane-op slots/s (FMA = 1 slot)
PEAK_VPU = 12.3e12      # legacy FMA-counted fp32 FLOP/s (2 * VPU_SLOTS)
HBM_BW = 819e9          # bytes/s
TRANS_COST = 8.0        # legacy VPU-op equivalents per transcendental

# measured per-op slot costs (differential fused-MVM calibration)
SLOT = {
    "op": 1.0,       # mul/add/sub/max/cmp/select
    "exp": 3.2,
    "sqrt": 10.1,
    "rsqrt": 6.0,
    "log": 4.0,      # approximate (same class as exp)
    "mvm_base": 12.4,  # iso distance tile + K@a contraction per element
}


@dataclass
class Work:
    """Algorithmic-minimum work for one application of an op.

    Two accounting modes for the VPU:
      * legacy: `vpu` elementwise FLOPs + `trans` transcendental count,
        costed at TRANS_COST each against PEAK_VPU;
      * calibrated: `vpu_slots` measured lane-op slots (see SLOT table),
        costed against VPU_SLOTS. When vpu_slots > 0 it takes precedence.
    `mxu` is the useful matmul FLOP count (reported as TFLOP/s);
    `mxu_exec`, when set, is the executed-granularity FLOP count with
    K/N dims padded to 128 — the bound the MXU actually imposes."""
    mxu: float = 0.0         # useful matmul FLOPs (2*m*n*k per matmul)
    vpu: float = 0.0         # elementwise FLOPs (legacy accounting)
    trans: float = 0.0       # transcendental evaluations (legacy)
    hbm_bytes: float = 0.0   # unavoidable HBM traffic
    vpu_slots: float = 0.0   # measured lane-op slots (calibrated accounting)
    mxu_exec: float = 0.0    # executed MXU FLOPs incl. 128-granularity padding
    note: str = ""

    @property
    def flops(self) -> float:
        return self.mxu + self.vpu + self.trans + (
            2.0 * self.vpu_slots if not (self.vpu or self.trans) else 0.0
        )

    def _t_vpu(self) -> float:
        if self.vpu_slots > 0:
            return self.vpu_slots / VPU_SLOTS
        return (self.vpu + TRANS_COST * self.trans) / PEAK_VPU

    def _t_mxu(self) -> float:
        return max(self.mxu, self.mxu_exec) / PEAK_MXU

    def roofline_seconds(self) -> float:
        """Best possible wall clock: each resource at its peak."""
        return max(self._t_mxu(), self._t_vpu(), self.hbm_bytes / HBM_BW)

    def bound(self) -> str:
        """Which resource sets the roofline."""
        t_mxu = self._t_mxu()
        t_vpu = self._t_vpu()
        t_hbm = self.hbm_bytes / HBM_BW
        m = max(t_mxu, t_vpu, t_hbm)
        if m == 0:
            return "latency"
        name = {t_mxu: "MXU", t_vpu: "VPU", t_hbm: "HBM"}[m]
        if name == "MXU" and self.mxu_exec > self.mxu:
            name = "MXU-pad"   # bound by 128-granularity padding, not math
        return name

    def sanity_floor(self) -> float:
        """Hard lower bound on wall clock; measurements below ~this are
        physically impossible and must be rejected. Uses only the MXU
        peak + HBM bandwidth (the two numbers we trust exactly); the
        VPU estimate gets 4x headroom so an aggressive XLA fusion can't
        be misflagged. mxu_exec is NOT used here (a smarter layout could
        legitimately beat the padded-granularity bound)."""
        vpu_est = (self.vpu_slots / VPU_SLOTS if self.vpu_slots > 0
                   else (self.vpu + self.trans) / PEAK_VPU)
        return max(self.mxu / PEAK_MXU,
                   vpu_est / 4.0,
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
