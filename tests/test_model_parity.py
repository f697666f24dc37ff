"""Full-model parity: JAX RawFormer + .pth importer vs torch oracle, and
component parity vs the importable reference modules in /root/reference."""

import io

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.compat.torch_import import (
    import_rawformer_state_dict,
    load_torch_checkpoint,
)
from bayer_low_light_image_enhancement_tpu.models.rawformer import RawFormer, RawFormerConfig
from bayer_low_light_image_enhancement_tpu.ops.attention import channel_attention

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(42)


def test_attention_parity_vs_reference_root_model():
    """Channel attention vs /root/reference/model.py Attention (root copy)."""
    from conftest import load_reference_root_model

    ref_model = load_reference_root_model()

    dim, heads = 16, 4
    ref_attn = ref_model.Attention(dim, heads).eval()
    x = RNG.standard_normal((2, dim, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_attn(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref_attn.state_dict().items()}
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    # Reference root names: qkv.0 (1x1), qkv.1 (dw), proj, scale.
    from bayer_low_light_image_enhancement_tpu.compat.torch_import import conv_w
    from bayer_low_light_image_enhancement_tpu.ops.conv import conv2d

    q1 = conv2d(x_nhwc, jnp.asarray(conv_w(sd["qkv.0.weight"])), jnp.asarray(sd["qkv.0.bias"]))
    q2 = conv2d(
        q1,
        jnp.asarray(conv_w(sd["qkv.1.weight"])),
        jnp.asarray(sd["qkv.1.bias"]),
        groups=dim * 3,
    )
    q, k, v = jnp.split(q2, 3, axis=-1)
    out = channel_attention(q, k, v, jnp.asarray(sd["scale"].reshape(-1)), heads)
    out = conv2d(out, jnp.asarray(conv_w(sd["proj.weight"])), jnp.asarray(sd["proj.bias"]))
    np.testing.assert_allclose(
        np.asarray(out), ref_out.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


@pytest.fixture(scope="module")
def oracle_pair():
    from torch_oracle import RawFormerOracle

    dim = 16
    torch.manual_seed(0)
    oracle = RawFormerOracle(dim=dim, num_heads=(4, 4, 4, 4)).eval()
    cfg = RawFormerConfig(dim=dim, num_heads=(4, 4, 4, 4))
    model = RawFormer(cfg)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = jax.tree.map(jnp.asarray, import_rawformer_state_dict(sd))
    return oracle, model, params


def test_full_model_parity(oracle_pair):
    oracle, model, params = oracle_pair
    x = RNG.uniform(0, 1, (1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    out = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_full_model_parity_amplified_input(oracle_pair):
    """Inputs >1 (ratio-amplified RAW) exercise the input clamp."""
    oracle, model, params = oracle_pair
    x = (RNG.uniform(0, 1, (1, 1, 32, 32)) * 300.0).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    out = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_pth_checkpoint_roundtrip(tmp_path, oracle_pair):
    """Save the oracle the way the reference does (train.py:168-172, with
    DataParallel 'module.' prefixes) and load through the importer."""
    oracle, model, params = oracle_pair
    path = str(tmp_path / "model_best.pth")
    state = {"module." + k: v for k, v in oracle.state_dict().items()}
    torch.save({"epoch": 7, "state_dict": state, "optimizer": {}}, path)
    sd = load_torch_checkpoint(path)
    params2 = jax.tree.map(jnp.asarray, import_rawformer_state_dict(sd))
    x = jnp.asarray(RNG.uniform(0, 1, (1, 16, 16, 1)).astype(np.float32))
    out1 = model.apply(params, x)
    out2 = model.apply(params2, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=0)


@pytest.mark.parametrize("size,dim", [("S", 32), ("B", 48), ("L", 64)])
def test_model_sizes_construct(size, dim):
    cfg = RawFormerConfig.from_size(size)
    assert cfg.dim == dim


def test_output_shape_and_range():
    cfg = RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2))
    model = RawFormer(cfg)
    x = jnp.asarray(RNG.uniform(0, 5, (2, 32, 48, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 32, 48, 3)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
