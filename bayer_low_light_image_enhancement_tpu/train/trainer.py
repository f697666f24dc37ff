"""pjit data-parallel training.

Replaces the reference's ``nn.DataParallel`` scatter/gather loop
(``/root/reference/train.py:109-147``) with the TPU-native pattern: a
``jax.sharding.Mesh`` with a ``data`` axis, batch sharded over it, params
replicated, and the gradient all-reduce inserted by XLA as a ``psum`` over
ICI. The whole train step (forward, loss, backward, Adam update) is one jitted
program with donated state — no host round-trips inside the epoch loop.

bf16 compute / fp32 params replaces CUDA AMP + GradScaler (bf16 needs no loss
scaling). Eval computes PSNR on-device using the reference's uint8 protocol.

Models are called as ``model.apply(vars, x, train=...)``; models carrying
BatchNorm running stats (the WFB rep-conv family) expose a ``batch_stats``
collection which the train step threads through as mutable state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bayer_low_light_image_enhancement_tpu.core.mesh import AXES
from bayer_low_light_image_enhancement_tpu.train.losses import get_loss
from bayer_low_light_image_enhancement_tpu.train.metrics import psnr_uint8
from bayer_low_light_image_enhancement_tpu.train.schedule import warmup_cosine_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any  # {} for models without BatchNorm
    opt_state: Any

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    base_lr: float = 1e-4
    warmup_epochs: int = 20
    total_epochs: int = 3000
    eta_min: float = 1e-5
    steps_per_epoch: int = 1
    loss: str = "charbonnier"
    grad_clip: Optional[float] = None
    # Skip the update on a non-finite loss (the reference's NaN-batch skip,
    # RawFomer_WFB_FFAB/train.py:165-182, made jit-safe: no host sync).
    nan_guard: bool = True
    # Rematerialise the forward during backward (jax.checkpoint): trades
    # ~30% more FLOPs for activation memory, enabling larger per-chip
    # batches on the 512^2-crop workload.
    remat: bool = False
    # Run TransformerBlocks through the fused Pallas forward+backward
    # (kernels/fused_block_bwd.py custom VJP) during training. Saves only
    # x + [C,C]-sized attention state between passes (remat-grade memory)
    # and accumulates weight grads in fp32 in VMEM. Blocks outside the
    # kernel's geometry (C>64, spatial sharding, W-packing) keep XLA.
    fused_blocks: bool = False


def decode_batch(batch):
    """Accept either a host-decoded ``(inp_f32, gt_f32)`` pair or the
    compact-transfer 3-tuple ``(raw_u16 [B,p,p,1], ratio_f32 [B],
    gt_u16 [B,p,p,3])`` (data/native.py ``compact`` mode) and return
    ``(inp, gt)`` in fp32.

    Compact batches ship 16-bit end-to-end — ~5x less H2D than fp32, the
    dominant train-step cost on host-bound transports — and are decoded
    here INSIDE the jitted step with the exact fp32 expressions the host
    path evaluates (csrc/bayer_pipeline.cpp assemble_one: clip to
    [512, 16383], affine normalise, ratio multiply; GT /65535 as in the
    reference ``load_dataset.py:90``). XLA fuses both decodes into the
    embedding conv / loss producers, so device time is unchanged.
    """
    if len(batch) == 2:
        return batch
    from bayer_low_light_image_enhancement_tpu.kernels.bayer_pack import (
        BLACK_LEVEL,
        WHITE_LEVEL,
    )

    raw16, ratio, gt16 = batch
    x = jnp.clip(raw16.astype(jnp.float32), BLACK_LEVEL, WHITE_LEVEL)
    scale = 1.0 / (WHITE_LEVEL - BLACK_LEVEL + 1e-6)
    inp = (x - BLACK_LEVEL) * scale * ratio.astype(jnp.float32)[:, None, None, None]
    gt = gt16.astype(jnp.float32) * (1.0 / 65535.0)
    return inp, gt


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = warmup_cosine_schedule(
        cfg.base_lr,
        cfg.warmup_epochs,
        cfg.total_epochs,
        cfg.eta_min,
        cfg.steps_per_epoch,
    )
    # torch.optim.Adam defaults (train.py:113): betas (0.9, 0.999), eps 1e-8.
    tx = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    if cfg.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


class Trainer:
    """Owns the jitted train/eval steps for a model over a device mesh."""

    def __init__(
        self,
        model,
        cfg: TrainConfig = TrainConfig(),
        mesh: Optional[Mesh] = None,
        loss_fn: Optional[Callable] = None,
    ):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.tx = make_optimizer(cfg)
        self.loss_fn = loss_fn or get_loss(cfg.loss)

        if mesh is not None:
            self._batch_sharding = NamedSharding(mesh, P(AXES.data))
            self._replicated = NamedSharding(mesh, P())
            self._tp = dict(mesh.shape).get(AXES.tensor, 1) > 1
        else:
            self._batch_sharding = None
            self._replicated = None
            self._tp = False
        # Megatron-style param shardings (parallel/tensor.py); built lazily in
        # init() once the state structure exists, then baked into the steps.
        self._state_sharding = None

        self.train_step = self._build_train_step()
        self.eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    def init(self, rng, sample_input) -> TrainState:
        variables = self.model.init(rng, sample_input, train=False)
        state = TrainState.create(variables, self.tx)
        if self.mesh is not None:
            if self._tp:
                from bayer_low_light_image_enhancement_tpu.parallel.tensor import (
                    tensor_shardings,
                )

                self._state_sharding = tensor_shardings(state, self.mesh)
                state = jax.device_put(state, self._state_sharding)
                # Rebuild the jitted steps with the TP layout baked in so the
                # updated state keeps the same sharding step over step
                # (stable donation, no resharding between steps).
                self.train_step = self._build_train_step()
                self.eval_step = self._build_eval_step()
            else:
                state = jax.device_put(state, self._replicated)
        return state

    # ------------------------------------------------------------------
    def _build_train_step(self):
        def step_fn(state: TrainState, batch) -> Tuple[TrainState, jnp.ndarray]:
            inp, gt = decode_batch(batch)
            has_bn = bool(state.batch_stats)

            def loss_fn(params):
                variables = {"params": params}
                if has_bn:
                    variables["batch_stats"] = state.batch_stats
                    pred, mut = self.model.apply(
                        variables, inp, train=True, mutable=["batch_stats"]
                    )
                else:
                    if self.cfg.fused_blocks:
                        from bayer_low_light_image_enhancement_tpu.models.fused_apply import (
                            make_fused_forward,
                        )

                        fwd = make_fused_forward(self.model, trainable=True)
                        apply = lambda v, x: fwd(v, x, train=True)
                    else:
                        apply = lambda v, x: self.model.apply(v, x, train=True)
                    if self.cfg.remat:
                        apply = jax.checkpoint(apply)
                    pred = apply(variables, inp)
                    mut = {}
                pred = jnp.clip(pred, 0.0, 1.0)  # train.py:139 clamps pre-loss
                return self.loss_fn(pred, gt), mut

            (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            if self.cfg.nan_guard:
                # Reference batch-skip semantics (RawFomer_WFB_FFAB/
                # train.py:165-182): a non-finite loss OR any non-finite grad
                # leaf skips the WHOLE batch — params, Adam moments, and the
                # optimizer step count all stay exactly as they were; only the
                # (reported) loss comes from the bad batch.
                ok = jnp.isfinite(loss)
                for g in jax.tree.leaves(grads):
                    ok = ok & jnp.all(jnp.isfinite(g))
                new_params = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_params, state.params
                )
                new_opt = jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new_opt, state.opt_state
                )
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=mut.get("batch_stats", state.batch_stats),
                    opt_state=new_opt,
                ),
                loss,
            )

        kwargs = {"donate_argnums": (0,)}
        if self.mesh is not None:
            state_sharding = (
                self._state_sharding if self._state_sharding is not None
                else self._replicated
            )
            kwargs["in_shardings"] = (
                state_sharding,
                self._batch_sharding,  # pytree prefix: covers any batch arity
            )
            kwargs["out_shardings"] = (state_sharding, self._replicated)
        return jax.jit(step_fn, **kwargs)

    def _build_eval_step(self):
        def eval_fn(variables, batch):
            inp, gt = batch
            pred = jnp.clip(self.model.apply(variables, inp, train=False), 0.0, 1.0)
            # Per-image PSNR on the uint8 grid, like the reference val loop.
            per_image = jax.vmap(psnr_uint8)(pred, gt)
            return pred, per_image

        kwargs = {}
        if self.mesh is not None and self._state_sharding is None:
            kwargs["in_shardings"] = (
                self._replicated,
                self._batch_sharding,  # pytree prefix: covers any batch arity
            )
        # In TP mode the variables arrive committed with their Megatron
        # shardings from init(); jit honours committed layouts directly.
        return jax.jit(eval_fn, **kwargs)

    def eval_variables(self, state: TrainState):
        return state.variables()

    # ------------------------------------------------------------------
    @property
    def batch_sharding(self):
        """Data-axis NamedSharding for input batches (None without a mesh)."""
        return self._batch_sharding

    def shard_batch(self, batch):
        if self.mesh is None:
            return batch
        return jax.device_put(batch, self._batch_sharding)
