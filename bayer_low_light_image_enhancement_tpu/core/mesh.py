"""Device-mesh construction and canonical axis names.

The reference's only parallelism is single-host ``nn.DataParallel``
(``/root/reference/train.py:109-110``). Here parallelism is expressed the TPU
way: a :class:`jax.sharding.Mesh` with named axes and sharding annotations;
XLA inserts the collectives (psum over ICI for gradients, ppermute for halo
exchange in spatial tiling).

Axes:
  * ``data``    — batch data parallelism (gradient all-reduce rides ICI).
  * ``spatial`` — image-height sharding for full-resolution tiled inference
                  (halo exchange + psum'd channel-attention grams).
  * ``tensor``  — Megatron-style tensor parallelism over transformer-block
                  channels (parallel/tensor.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class AxisNames:
    data: str = "data"
    spatial: str = "spatial"      # image H sharding
    spatial_w: str = "spatial_w"  # image W sharding (2D spatial meshes)
    tensor: str = "tensor"        # channel sharding (tensor parallelism)


AXES = AxisNames()


def create_mesh(
    data: int = -1,
    spatial: int = 1,
    spatial_w: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, spatial[, spatial_w], tensor) mesh.

    ``data=-1`` consumes all remaining devices. The mesh is laid out so that
    the ``tensor`` and ``spatial`` axes (which carry per-layer collectives —
    TP all-reduces and halo ppermutes respectively) map to mesh-adjacent
    devices, while ``data`` (one gradient psum per step) varies slowest.
    ``spatial_w > 1`` adds image-width sharding for 2D spatial tiling of
    very large frames.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    inner = spatial * spatial_w * tensor
    if data == -1:
        if n % inner != 0:
            raise ValueError(f"{n} devices not divisible by spatial*tensor={inner}")
        data = n // inner
    if data * inner > n:
        raise ValueError(
            f"mesh {data}x{spatial}x{spatial_w}x{tensor} needs {data * inner} devices, have {n}"
        )
    dev_array = np.asarray(devices[: data * inner]).reshape(data, spatial, spatial_w, tensor)
    return Mesh(dev_array, (AXES.data, AXES.spatial, AXES.spatial_w, AXES.tensor))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host setup (SURVEY.md §5 "distributed comm backend"): one call
    per host before building meshes; ICI carries intra-slice collectives,
    DCN carries cross-host. Arguments default to cluster auto-detection."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard leading (batch) dim over ``data``; replicate the rest."""
    spec = P(AXES.data, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
