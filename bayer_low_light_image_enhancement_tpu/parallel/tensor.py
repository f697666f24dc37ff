"""Megatron-style tensor parallelism for the RawFormer family.

The reference has no tensor parallelism at all (SURVEY.md §2.4: no
``torch.distributed`` anywhere; its only multi-device path is
``nn.DataParallel``, ``/root/reference/train.py:109-110``). On TPU, TP is
expressed the GSPMD way: annotate the *parameters* with ``NamedSharding``
over a ``tensor`` mesh axis and let XLA's SPMD partitioner propagate
shardings through the computation and insert the collectives. No psum is
hand-written here — the partitioner places one all-reduce at each
row-parallel projection, riding ICI.

Sharding rules (classic Megatron column/row pairing, applied to the
transformer blocks where the FLOPs are — `RawFomer_WFB_FFAB/model.py:319-370`
is the reference op being partitioned):

* **column-parallel** (shard output channels, last dim of the HWIO kernel):
  ``attn.qkv`` and its depthwise ``attn.qkv_dwconv``, ``ffn.pointwise1`` and
  its depthwise ``ffn.depthwise``. Their biases shard on dim 0.
* **row-parallel** (shard input channels, dim -2; XLA inserts the finishing
  all-reduce): ``attn.project_out``, ``ffn.pointwise2``. Their biases are
  replicated (applied after the reduce).
* everything else (3x3 spatial convs, embeddings, LayerNorm scales,
  temperatures) is replicated — these models are <=17M params, so weight
  memory is not the motivation; TP here shards the *work* of the widest
  matmuls (the 2C-hidden FFN and the 3C qkv) across chips.

A dim that is not divisible by the TP size falls back to replicated — the
rules are shape-safe for every model in the zoo.

The same rule tree applies to Adam's ``mu``/``nu`` moments automatically:
specs are derived from the *trailing dict-key names* of each leaf's tree
path, and optax moment trees mirror the params tree, so a single
``tree_map_with_path`` covers ``TrainState.params`` and ``opt_state`` alike.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, tree_map_with_path

from bayer_low_light_image_enhancement_tpu.core.mesh import AXES

# Module names whose kernels shard on output channels (column-parallel) /
# input channels (row-parallel). Names are the flax module names declared in
# models/common.py (ChannelAttention, ConvFFN).
COLUMN_PARALLEL = frozenset({"qkv", "qkv_dwconv", "pointwise1", "depthwise"})
ROW_PARALLEL = frozenset({"project_out", "pointwise2"})


def _leaf_spec(names, shape, tp: int, axis: str) -> P:
    if tp <= 1 or len(names) < 2 or len(shape) == 0:
        return P()
    module, param = names[-2], names[-1]
    if module in COLUMN_PARALLEL:
        if param == "kernel" and len(shape) >= 2 and shape[-1] % tp == 0:
            return P(*([None] * (len(shape) - 1)), axis)
        if param == "bias" and len(shape) == 1 and shape[0] % tp == 0:
            return P(axis)
    elif module in ROW_PARALLEL:
        # Depthwise-grouped row kernels have in-dim 1; only dense kernels
        # qualify. Bias stays replicated: it is added after the all-reduce.
        if param == "kernel" and len(shape) >= 2 and shape[-2] % tp == 0:
            return P(*([None] * (len(shape) - 2)), axis, None)
    return P()


def tensor_specs(tree: Any, tp: int, axis: str = AXES.tensor):
    """PartitionSpec pytree for a params / TrainState / variables pytree.

    Works on any pytree whose parameter leaves sit under flax-style nested
    dicts: specs are chosen from the trailing dict-key names of each path,
    so optax moment trees (whose dict structure mirrors params) get the
    matching specs for free. Non-dict leaves (step counters, schedule
    counts) are replicated.
    """

    def f(path, leaf):
        names = [k.key for k in path if isinstance(k, DictKey)]
        return _leaf_spec(names, tuple(getattr(leaf, "shape", ())), tp, axis)

    return tree_map_with_path(f, tree)


def tensor_shardings(tree: Any, mesh: Mesh, axis: str = AXES.tensor):
    """NamedSharding pytree for ``tree`` over ``mesh``'s tensor axis."""
    tp = mesh.shape[axis]
    specs = tensor_specs(tree, tp, axis)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
    )


def shard_tensor_parallel(tree: Any, mesh: Mesh, axis: str = AXES.tensor):
    """Place a pytree with TP shardings applied (replicated elsewhere)."""
    return jax.device_put(tree, tensor_shardings(tree, mesh, axis))
