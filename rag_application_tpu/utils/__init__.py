from .runtime import (
    cdiv,
    default_matmul_dtype,
    on_tpu,
    pad_to_multiple,
    round_up,
    use_interpret,
)
from .observability import METRICS, Metrics, device_trace

__all__ = [
    "cdiv",
    "default_matmul_dtype",
    "on_tpu",
    "pad_to_multiple",
    "round_up",
    "use_interpret",
    "METRICS",
    "Metrics",
    "device_trace",
]
