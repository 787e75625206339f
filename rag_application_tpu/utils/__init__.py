from .runtime import (
    cdiv,
    default_matmul_dtype,
    on_tpu,
    pad_to_multiple,
    round_up,
    use_interpret,
)

__all__ = [
    "cdiv",
    "default_matmul_dtype",
    "on_tpu",
    "pad_to_multiple",
    "round_up",
    "use_interpret",
]
