"""Device-mesh construction and sharding rules.

The reference's "distribution" is request-level async fan-out over
microservices (SURVEY §2.6) — there is no tensor/pipeline parallelism to
port. The TPU framework distributes differently:

  * corpus rows shard over the `shard` axis (index + search kernels;
    candidate lists merge with an all-gather + fused top-k),
  * query batches shard over the `data` axis,
  * encoder weights optionally shard over the `model` axis (tensor
    parallelism for encoders larger than one chip's HBM),

all over one `jax.sharding.Mesh` with XLA-inserted ICI collectives.
Pipeline/sequence/expert parallelism intentionally do not exist here:
the reference has no deep pipelined model, no long-attention, and no
MoE (SURVEY §2.6, §5.7) — the corpus axis takes their place.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    data: Optional[int] = None,
    model: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the first n_devices devices.

    The `data` axis doubles as the corpus-shard axis for index kernels
    (one logical axis, two roles — queries and corpus rows never shard
    simultaneously in the same program).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def row_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard corpus rows (dim 0) over the given axis."""
    return NamedSharding(mesh, P(axis))


def param_shardings(mesh: Mesh, params, *, axis: str = "model"):
    """Tensor-parallel sharding rules for encoder parameters.

    Policy: shard the largest dimension of any >=2D parameter over the
    model axis when divisible by its size; replicate everything else.
    With model=1 this degenerates to full replication (pure DP).
    """
    size = mesh.shape[axis]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if size > 1 and len(shape) >= 2:
            best = int(np.argmax(shape))
            if shape[best] % size == 0:
                spec = [None] * len(shape)
                spec[best] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
