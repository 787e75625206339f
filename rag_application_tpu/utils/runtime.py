"""Runtime helpers shared by kernels and index code."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to the next multiple of ``m``."""
    return cdiv(x, m) * m


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def use_interpret() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    Pallas TPU kernels only compile on real TPUs; on the CPU test backend
    (and the driver's virtual 8-device CPU mesh) we run them interpreted.
    """
    return not on_tpu()


def default_matmul_dtype() -> jnp.dtype:
    """Storage dtype for corpus matrices fed to the MXU."""
    return jnp.bfloat16 if on_tpu() else jnp.float32


def pad_to_multiple(x: jax.Array, multiple: int, axis: int = 0, value=0):
    """Pad ``x`` along ``axis`` with ``value`` so its size is a multiple.

    Returns the padded array (a no-op when already aligned). Static shapes
    only — this runs at trace time.
    """
    size = x.shape[axis]
    target = round_up(size, multiple)
    if target == size:
        return x
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, target - size)
    return jnp.pad(x, pad_widths, constant_values=value)
