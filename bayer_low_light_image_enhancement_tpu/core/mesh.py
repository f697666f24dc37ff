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


AXES = AxisNames()


def create_mesh(
    data: int = -1,
    spatial: int = 1,
    spatial_w: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, spatial[, spatial_w]) mesh.

    ``data=-1`` consumes all remaining devices. The mesh is laid out so that
    the ``spatial`` axes (which carry halo ppermutes every conv layer) map
    to mesh-adjacent devices. ``spatial_w > 1`` adds image-width sharding
    for 2D spatial tiling of very large frames.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    sp = spatial * spatial_w
    if data == -1:
        if n % sp != 0:
            raise ValueError(f"{n} devices not divisible by spatial={sp}")
        data = n // sp
    if data * sp > n:
        raise ValueError(f"mesh {data}x{spatial}x{spatial_w} needs {data * sp} devices, have {n}")
    dev_array = np.asarray(devices[: data * sp]).reshape(data, spatial, spatial_w)
    return Mesh(dev_array, (AXES.data, AXES.spatial, AXES.spatial_w))


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
