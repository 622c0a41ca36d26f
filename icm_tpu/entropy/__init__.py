from .base import (
    EntropyTables,
    pmf_to_quantized_cdf_np,
    quantize,
    dequantize,
)
from .bottleneck import EntropyBottleneck, eb_build_tables
from .gaussian import (
    GaussianConditional,
    gc_build_tables,
    get_scale_table,
    build_indexes,
    SCALES_MIN,
    SCALES_MAX,
    SCALES_LEVELS,
)

__all__ = [
    "EntropyTables",
    "pmf_to_quantized_cdf_np",
    "quantize",
    "dequantize",
    "EntropyBottleneck",
    "eb_build_tables",
    "GaussianConditional",
    "gc_build_tables",
    "get_scale_table",
    "build_indexes",
    "SCALES_MIN",
    "SCALES_MAX",
    "SCALES_LEVELS",
]
