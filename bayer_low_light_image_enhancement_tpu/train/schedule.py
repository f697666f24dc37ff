"""Learning-rate schedule: linear warmup -> cosine decay.

Reproduces the semantics of the reference's GradualWarmupScheduler wrapping
CosineAnnealingLR (``/root/reference/RawFomer_WFB_FFAB/warmup_scheduler.py:25-37``
wired at ``/root/reference/train.py:113-115``): with multiplier=1 the LR ramps
linearly 0 -> base over ``warmup_epochs`` (the reference literally trains
epoch 0 at lr=0), then follows cosine annealing to ``eta_min`` with period
``total_epochs``. The reference steps per *epoch*, so the LR is a staircase in
steps; pass ``steps_per_epoch`` to reproduce that, or 1 to treat the unit as
steps.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    base_lr: float = 1e-4,
    warmup_epochs: int = 20,
    total_epochs: int = 3000,
    eta_min: float = 1e-5,
    steps_per_epoch: int = 1,
) -> optax.Schedule:
    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        warm = base_lr * epoch / warmup_epochs
        t = jnp.clip(epoch - warmup_epochs, 0.0, float(total_epochs))
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / total_epochs)
        )
        return jnp.where(epoch <= warmup_epochs, warm, cos)

    return schedule
