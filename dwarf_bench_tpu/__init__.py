"""dwarf_bench_tpu — a TPU-native vectorized query-execution benchmark
framework with the capabilities of kurapov-peter/dwarf_bench.

Every kernel is written for TPU in JAX/XLA (Pallas for the hot paths):
sort/scan/segment primitives replace device atomics, VMEM-tiled kernels
replace work-group local memory, and the framework scales past the
reference's single-device scope to multi-chip meshes via jax.sharding
(see dwarf_bench_tpu.parallel).
"""

from .api import (
    ApiDeviceType,
    DwarfBench,
    DwarfBenchException,
    DwarfKind,
    Measurement,
    RunConfig,
)
from .common import (
    DeviceType,
    Dwarf,
    GroupByRunOptions,
    Registry,
    RunOptions,
)
from .dwarfs import populate_registry

__version__ = "0.1.0"

__all__ = [
    "ApiDeviceType",
    "DwarfBench",
    "DwarfBenchException",
    "DwarfKind",
    "Measurement",
    "RunConfig",
    "DeviceType",
    "Dwarf",
    "GroupByRunOptions",
    "Registry",
    "RunOptions",
    "populate_registry",
    "__version__",
]
