"""Roofline accounting for compiled XLA programs.

Wraps ``Compiled.cost_analysis()`` (FLOPs + HBM bytes accessed as seen
by the compiler) and converts measured wall-time into MFU and HBM-
bandwidth utilization against the chip's peaks, yielding a roofline
verdict ("compute-bound" vs "memory-bound") per program. This is the
evidence layer behind bench.py's ``mfu_pct`` fields — the reference
publishes img/s only (its eval loop: ``eval_model/__main__.py:117-124``)
so MFU is strictly additional rigor.

Peaks: TPU v5e (v5 lite) = 197 TFLOP/s bf16 / 98.5 TFLOP/s f32 (MXU
passes at half bf16 rate) and 819 GB/s HBM. CPU runs report raw FLOP/s
without a peak (no stable single-core figure to normalize against).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

V5E_PEAK_FLOPS = {"bfloat16": 1.97e14, "float32": 9.85e13}
V5E_HBM_BYTES_PER_S = 8.19e11


def compiled_costs(compiled) -> Optional[Dict[str, float]]:
    """{"flops", "bytes"} from a Compiled object, or None if the backend
    doesn't expose cost analysis."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not isinstance(ca, dict) or not ca:
        return None
    # Pure data-movement programs (e.g. the codec's latent split —
    # reshape/slice only) legitimately report no "flops" key; they still
    # move HBM bytes, which is exactly what the roofline must charge.
    # Rejecting them left BENCH_r04's enc_roofline with an
    # unpriced_stages entry and silently understated encode HBM traffic.
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def costs_of(fn, *args, **kwargs) -> Optional[Dict[str, float]]:
    """Lower+compile ``fn`` (jit-wrapped or plain) and return its costs."""
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    return compiled_costs(jitted.lower(*args, **kwargs).compile())


@dataclass
class RooflineReport:
    flops: float
    bytes: float
    seconds: float
    dtype: str = "float32"
    on_tpu: bool = True

    @property
    def intensity(self) -> float:  # FLOPs per HBM byte
        return self.flops / self.bytes if self.bytes else float("inf")

    @property
    def achieved_flops(self) -> float:
        return self.flops / self.seconds

    @property
    def mfu_pct(self) -> Optional[float]:
        if not self.on_tpu:
            return None
        peak = V5E_PEAK_FLOPS.get(self.dtype, V5E_PEAK_FLOPS["float32"])
        return 100.0 * self.achieved_flops / peak

    @property
    def hbm_pct(self) -> Optional[float]:
        if not self.on_tpu:
            return None
        return 100.0 * (self.bytes / self.seconds) / V5E_HBM_BYTES_PER_S

    @property
    def ridge_intensity(self) -> Optional[float]:
        if not self.on_tpu:
            return None
        peak = V5E_PEAK_FLOPS.get(self.dtype, V5E_PEAK_FLOPS["float32"])
        return peak / V5E_HBM_BYTES_PER_S

    @property
    def verdict(self) -> str:
        """Which roof the program sits under, from the compiler's static
        FLOPs/bytes — then whether the measured time actually reaches it."""
        if not self.on_tpu:
            return "cpu"
        bound = (
            "compute-bound" if self.intensity >= self.ridge_intensity
            else "memory-bound"
        )
        util = self.mfu_pct if bound == "compute-bound" else self.hbm_pct
        return f"{bound} ({util:.0f}% of that roof)"

    def summary(self, per: int = 1) -> Dict[str, Any]:
        out = {
            "gflops_per_item": round(self.flops / per / 1e9, 2),
            "hbm_mb_per_item": round(self.bytes / per / 1e6, 2),
            "intensity_flops_per_byte": round(self.intensity, 1),
            "achieved_tflops": round(self.achieved_flops / 1e12, 3),
            "roofline": self.verdict,
        }
        if self.mfu_pct is not None:
            out["mfu_pct"] = round(self.mfu_pct, 1)
            out["hbm_pct"] = round(self.hbm_pct, 1)
        return out
