"""Predictor: the production RAW->RGB inference API.

The reference's only inference surface is the ``test.py`` script loop
(``/root/reference/test.py:107-131``): hand-rolled padding, clamping and
uint8 conversion inline in a metrics script. This wraps the same contract as
a library object for serving:

* accepts frames of ANY size ([H,W], [H,W,1] or [B,H,W,1]) — pads to the
  model's divisibility requirement and crops the output back;
* routes through the fused TransformerBlock Pallas path on TPU (same gate
  as the eval CLI; BENCHMARKS.md "fused" rows) and plain XLA elsewhere;
* jit-caches per padded shape — steady-state serving on fixed camera
  geometry compiles once.

Checkpoint loading covers both native orbax trees and reference ``.pth``
files (via compat.torch_import), so a reference user can lift their trained
weights straight into a TPU serving process.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


class Predictor:
    def __init__(
        self,
        model,
        variables: Any,
        use_fused: Optional[bool] = None,
        pad_to: int = 16,
        clip01: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        from bayer_low_light_image_enhancement_tpu.models.fused_apply import (
            make_fused_forward,
        )

        self.model = model
        self.variables = variables
        self.pad_to = pad_to
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        apply_fn = make_fused_forward(model) if use_fused else model.apply

        def fwd(v, x):
            y = apply_fn(v, x)
            return jnp.clip(y, 0.0, 1.0) if clip01 else y

        self._fwd = jax.jit(fwd)

    # ------------------------------------------------------------------
    @classmethod
    def from_orbax(cls, model, ckpt_dir: str, **kw) -> "Predictor":
        """Restore the latest step from an orbax checkpoint directory."""
        import jax
        import jax.numpy as jnp

        from bayer_low_light_image_enhancement_tpu.train.checkpoint import (
            CheckpointManager,
        )
        from bayer_low_light_image_enhancement_tpu.train.trainer import (
            TrainConfig,
            Trainer,
            TrainState,
        )

        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
        template = TrainState.create(variables, Trainer(model, TrainConfig()).tx)
        restored, step = CheckpointManager(ckpt_dir).restore(template)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        return cls(model, restored.variables(), **kw)

    @classmethod
    def from_torch(cls, model, pth_path: str, family: str = "rawformer", **kw) -> "Predictor":
        """Import a reference ``.pth`` checkpoint
        (``/root/reference/test.py:88-93`` load path). ``family`` selects the
        importer: ``rawformer`` (canonical tree), ``wfb``
        (``RawFomer_WFB_FFAB/model.py:437-508``), or ``flca``
        (``FrequencyawareLumaChromaAttentionRAWFormer.py``)."""
        import jax
        import jax.numpy as jnp

        from bayer_low_light_image_enhancement_tpu.compat import torch_import as ti

        importer = {
            "rawformer": ti.import_rawformer_state_dict,
            "wfb": ti.import_wfb_state_dict,
            "flca": ti.import_flca_state_dict,
        }[family]
        params = jax.tree.map(
            jnp.asarray, importer(ti.load_torch_checkpoint(pth_path))
        )
        return cls(model, params, **kw)

    # ------------------------------------------------------------------
    def __call__(self, raw: np.ndarray) -> np.ndarray:
        """RAW mosaic in [0,1]*ratio -> RGB in [0,1]; shape-preserving."""
        import jax.numpy as jnp

        x = np.asarray(raw, np.float32)
        squeeze_batch = x.ndim < 4
        if x.ndim == 2:
            x = x[..., None]
        if x.ndim == 3:
            x = x[None]
        if x.ndim != 4 or x.shape[-1] != 1:
            raise ValueError(f"expected [H,W], [H,W,1] or [B,H,W,1], got {raw.shape}")

        h, w = x.shape[1:3]
        ph, pw = (-h) % self.pad_to, (-w) % self.pad_to
        if ph or pw:
            x = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        y = np.asarray(self._fwd(self.variables, jnp.asarray(x)))[:, :h, :w]
        return y[0] if squeeze_batch else y
