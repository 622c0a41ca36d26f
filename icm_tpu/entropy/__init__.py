from .base import (
    EntropyTables,
    pmf_to_quantized_cdf_np,
    quantize,
    dequantize,
)
from .bottleneck import (
    EntropyBottleneck,
    eb_build_tables,
    eb_tables_from_pmf_data,
)
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
    "eb_tables_from_pmf_data",
    "GaussianConditional",
    "gc_build_tables",
    "get_scale_table",
    "build_indexes",
    "SCALES_MIN",
    "SCALES_MAX",
    "SCALES_LEVELS",
]
