"""Test configuration.

Multi-chip behaviour is tested the TPU way without a pod: 8 virtual CPU
devices via ``xla_force_host_platform_device_count`` (SURVEY.md §4).

Some environments force-register a live TPU backend from sitecustomize
before any user code runs (jax is already imported when conftest executes),
which would (a) run every unit test on the one real chip and (b) make a
virtual multi-device mesh impossible. The jax.config updates below override
that at the config level, which works even after import as long as no device
has been touched yet.
"""

import os
import sys
import types

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS above covers older jax versions

# XLA's fastmath conv/dot defaults (bf16 passes) break torch-parity
# tolerances; force exact fp32 in tests.
jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def _make_fake_mamba():
    """A parameter- AND math-faithful stand-in for mamba_ssm.Mamba.

    Declares the exact parameter tree of the CUDA module (so reference
    checkpoints/state_dicts round-trip through compat.torch_import) and
    implements the selective-scan reference math in plain torch (the
    sequential recurrence `selective_scan_ref` from the public mamba_ssm
    repo) so full reference-model forwards are comparable in tests without
    the CUDA kernel.
    """
    import math

    import torch
    import torch.nn.functional as F

    class _FakeMamba(torch.nn.Module):
        def __init__(self, d_model, d_state=16, d_conv=4, expand=2, **_):
            super().__init__()
            d_inner = expand * d_model
            dt_rank = math.ceil(d_model / 16)
            self.d_state, self.d_conv, self.dt_rank = d_state, d_conv, dt_rank
            self.in_proj = torch.nn.Linear(d_model, 2 * d_inner, bias=False)
            self.conv1d = torch.nn.Conv1d(
                d_inner, d_inner, d_conv, groups=d_inner, bias=True
            )
            self.x_proj = torch.nn.Linear(d_inner, dt_rank + 2 * d_state, bias=False)
            self.dt_proj = torch.nn.Linear(dt_rank, d_inner, bias=True)
            self.A_log = torch.nn.Parameter(
                torch.log(torch.arange(1, d_state + 1).float().repeat(d_inner, 1))
            )
            self.D = torch.nn.Parameter(torch.ones(d_inner))
            self.out_proj = torch.nn.Linear(d_inner, d_model, bias=False)

        def forward(self, x):
            """x: [B, L, D] -> [B, L, D]; fp32 recurrence like the kernel."""
            b, l, _ = x.shape
            xz = self.in_proj(x)
            xi, z = xz.chunk(2, dim=-1)
            # Causal depthwise conv over tokens (mamba pads d_conv-1 and
            # truncates to L; equivalent to a pure left pad).
            xc = self.conv1d(F.pad(xi.transpose(1, 2), (self.d_conv - 1, 0)))
            xc = F.silu(xc.transpose(1, 2))
            x_dbl = self.x_proj(xc)
            dt, B, C = torch.split(
                x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1
            )
            dt = F.softplus(self.dt_proj(dt)).float()  # [B, L, d_inner]
            A = -torch.exp(self.A_log.float())  # [d_inner, N]
            u, Bm, Cm = xc.float(), B.float(), C.float()
            h = torch.zeros(b, A.shape[0], self.d_state)
            ys = []
            for t in range(l):
                dA = torch.exp(dt[:, t, :, None] * A)  # [B, d_inner, N]
                dBu = dt[:, t, :, None] * Bm[:, t, None, :] * u[:, t, :, None]
                h = dA * h + dBu
                ys.append(torch.einsum("bdn,bn->bd", h, Cm[:, t]))
            y = torch.stack(ys, dim=1) + u * self.D.float()
            y = y * F.silu(z.float())
            return self.out_proj(y.to(x.dtype))

    return _FakeMamba


def add_reference_to_path():
    """Make the PyTorch reference importable as a parity oracle.

    Stubs the reference's unavailable deps (ptflops, timm, mamba_ssm) with
    inert placeholders — the components we compare against don't use them at
    call time.
    """
    _stub_module("ptflops", get_model_complexity_info=lambda *a, **k: ("0", "0"))
    # timm symbols imported at module scope by reference blocks.py but unused
    # by the blocks under test.
    _stub_module("timm")
    _stub_module("timm.models")
    _stub_module(
        "timm.models.vision_transformer", VisionTransformer=object, _cfg=lambda **k: {}
    )
    _stub_module("timm.models.registry", register_model=lambda f: f)
    _stub_module(
        "timm.models.layers",
        trunc_normal_=lambda *a, **k: None,
        DropPath=object,
        to_2tuple=lambda x: (x, x),
    )

    _stub_module("mamba_ssm", Mamba=_make_fake_mamba())
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    wfb = os.path.join(REFERENCE_ROOT, "RawFomer_WFB_FFAB")
    if wfb not in sys.path:
        sys.path.insert(0, wfb)


def load_reference_root_model():
    """Load /root/reference/model.py under a unique name (the WFB directory
    also has a model.py that would shadow it on sys.path)."""
    import importlib.util

    add_reference_to_path()
    spec = importlib.util.spec_from_file_location(
        "ref_root_model", os.path.join(REFERENCE_ROOT, "model.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
