"""Round-4 importer matrix: the remaining 7 zoo families round-trip a torch
``.pth`` state_dict through compat.torch_import into our flax trees with
forward agreement.

Every reference model file loads via importlib (conftest stubs unavailable
deps). Three of the reference files contain latent wiring bugs that make
their own forwards unrunnable (documented in SURVEY.md §7 and the model
docstrings); for those the test constructs the REPAIRED torch model — the
same repairs our models ship — exports its state_dict and checks parity
against that, mirroring how tests/torch_oracle.py anchors the canonical
model:

* ``rawformerwithLumma.py``: FLCA applies full-res guidance to downsampled
  features (spatial broadcast error) -> repaired by resizing guidance;
  bottleneck/up3 widths inconsistent -> repaired to the consistent widths.
* ``Attenblock.py``: decoder proj2/proj3 declare concat widths dim*6/dim*3
  inconsistent with the up-projections -> repaired to dim*4/dim*2.
* ``kan_model.py`` runs as-is, but its decoder passes CHANNEL counts as
  head counts; our model reproduces that under
  ``WavKANConfig(ref_decoder_heads=True)``.
"""

import importlib.util

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.compat import torch_import as ti

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(77)


def _load_ref(fname):
    from conftest import add_reference_to_path

    add_reference_to_path()
    spec = importlib.util.spec_from_file_location(
        "ref_" + fname.replace(".py", ""), "/root/reference/" + fname
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tree_spec(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): tuple(np.shape(leaf)) for path, leaf in flat}


def _assert_same_tree(ours, imported):
    a, b = _tree_spec(ours), _tree_spec(imported)
    assert a == b, (
        f"missing from import: {sorted(set(a) - set(b))[:6]}; "
        f"extra in import: {sorted(set(b) - set(a))[:6]}; "
        f"shape diffs: {[(k, a[k], b[k]) for k in a if k in b and a[k] != b[k]][:6]}"
    )


def _sd(ref):
    return {k: v.detach().numpy() for k, v in ref.state_dict().items()}


def _check(model, variables, ref, x_nchw, tol=2e-3, **apply_kw):
    """Tree match + forward parity (torch NCHW vs ours NHWC)."""
    x = x_nchw.astype(np.float32)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_same_tree(init_vars, variables)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), **apply_kw)
    np.testing.assert_allclose(
        np.asarray(got), expected.transpose(0, 2, 3, 1), rtol=tol, atol=tol
    )


class TestFLCAUNetImport:
    def test_round_trip(self):
        mod = _load_ref("Transformer_FLCA_UNet.py")
        from bayer_low_light_image_enhancement_tpu.models.flca_unet import (
            FLCAUNetConfig,
            TransformerFLCAUNet,
        )

        torch.manual_seed(0)
        ref = mod.Transformer_FLCA_UNet(
            in_ch=4, out_ch=4, base=16, blocks=(2, 2, 2), heads=4
        ).eval()
        variables = jax.tree.map(
            jnp.asarray, ti.import_flca_unet_state_dict(_sd(ref), num_blocks=2)
        )
        model = TransformerFLCAUNet(FLCAUNetConfig(base=16, blocks=(2, 2, 2)))
        x = RNG.uniform(0, 1, (1, 4, 32, 32))
        _check(model, variables, ref, x)


class TestUnetLumaDWTImport:
    def test_round_trip(self):
        mod = _load_ref("UnetLummaDWT.py")
        from bayer_low_light_image_enhancement_tpu.models.flca_unet import (
            FLCAUNetConfig,
            TransformerFLCAUNet,
        )

        torch.manual_seed(0)
        ref = mod.Transformer_FLCA_UNet(
            in_ch=4, out_ch=4, base=16, blocks=(2, 2, 2), heads=4
        ).eval()
        variables = jax.tree.map(
            jnp.asarray, ti.import_unet_luma_dwt_state_dict(_sd(ref), num_blocks=2)
        )
        model = TransformerFLCAUNet(
            FLCAUNetConfig(base=16, blocks=(2, 2, 2), guidance="dwt")
        )
        x = RNG.uniform(0, 1, (1, 4, 32, 32))
        _check(model, variables, ref, x)


class TestSimpleFLCAUNetImport:
    def test_round_trip(self):
        import torch.nn.functional as F

        mod = _load_ref("rawformerwithLumma.py")
        from bayer_low_light_image_enhancement_tpu.models.luma_variants import (
            SimpleFLCAUNet,
            SimpleFLCAUNetConfig,
        )

        base = 16
        torch.manual_seed(0)
        ref = mod.Transformer_FLCA_UNet(in_ch=4, out_ch=4, base_ch=base).eval()
        # Repair 1: resize guidance to the feature resolution inside FLCA
        # (the reference broadcasts full-res maps onto pooled features).
        def fixed_flca_forward(self, feat, y, cr, cb):
            h, w = feat.shape[-2:]
            y = F.interpolate(y, size=(h, w), mode="bilinear", align_corners=False)
            cr = F.interpolate(cr, size=(h, w), mode="bilinear", align_corners=False)
            cb = F.interpolate(cb, size=(h, w), mode="bilinear", align_corners=False)
            y_low, y_high = mod.frequency_split(y)
            low_a = self.low_attn(y_low)
            high_a = self.high_attn(y_high)
            chroma_a = self.chroma_attn(torch.cat([cr, cb], dim=1))
            return feat * (1 + low_a) + feat * high_a + feat * chroma_a

        for f in (ref.flca1, ref.flca2, ref.flca3, ref.flca_bottleneck):
            f.forward = fixed_flca_forward.__get__(f)
        # Repair 2: consistent bottleneck widths (the reference declares
        # base*8 for the transformer, FLCA and up3 where the tensor carries
        # base*4).
        torch.manual_seed(1)
        ref.bottleneck = mod.TransformerBlock(base * 4).eval()
        ref.flca_bottleneck = mod.FLCA(base * 4).eval()
        ref.flca_bottleneck.forward = fixed_flca_forward.__get__(ref.flca_bottleneck)
        ref.up3 = torch.nn.ConvTranspose2d(base * 4, base * 4, 2, 2).eval()

        variables = jax.tree.map(
            jnp.asarray, ti.import_simple_flca_unet_state_dict(_sd(ref))
        )
        model = SimpleFLCAUNet(SimpleFLCAUNetConfig(base_ch=base))
        x = RNG.uniform(0, 1, (1, 4, 32, 32))
        _check(model, variables, ref, x)


class TestLumaChromaTransformerImport:
    def test_round_trip(self):
        mod = _load_ref("BayerLumaChromaTransformer.py")
        from bayer_low_light_image_enhancement_tpu.models.lumachroma_transformer import (
            BayerLumaChromaTransformer,
            LumaChromaTransformerConfig,
        )

        torch.manual_seed(0)
        ref = mod.Transformer_FLCA_UNet_Full(in_ch=4, out_ch=4, base=16).eval()
        variables = jax.tree.map(
            jnp.asarray, ti.import_lumachroma_transformer_state_dict(_sd(ref))
        )
        model = BayerLumaChromaTransformer(LumaChromaTransformerConfig(base=16))
        x = RNG.uniform(0, 1, (1, 4, 32, 32))
        _check(model, variables, ref, x)


class TestMultiLvlFLCAImport:
    def test_round_trip(self):
        mod = _load_ref("MultiLvlFrequencyawareLumaChromaAttentionRAWFormer.py")
        from bayer_low_light_image_enhancement_tpu.models.multilvl_flca import (
            MultiLvlFLCAConfig,
            MultiLvlFLCARawFormer,
        )

        torch.manual_seed(0)
        ref = mod.RawFormer(dim=16, num_heads=[2, 2, 2, 2], flca_levels=2).eval()
        variables = jax.tree.map(
            jnp.asarray, ti.import_multilvl_flca_state_dict(_sd(ref))
        )
        model = MultiLvlFLCARawFormer(
            MultiLvlFLCAConfig(dim=16, num_heads=(2, 2, 2, 2))
        )
        x = RNG.uniform(0, 1, (1, 1, 64, 64))
        _check(model, variables, ref, x)


class TestLumaMHSAImport:
    def test_round_trip(self):
        mod = _load_ref("Attenblock.py")
        from bayer_low_light_image_enhancement_tpu.models.luma_variants import (
            LumaMHSAConfig,
            LumaMHSARawFormer,
        )

        dim = 16
        torch.manual_seed(0)
        ref = mod.RawFormer(dim=dim, num_heads=[2, 2, 2, 2]).eval()
        # Repair: consistent decoder projection widths (the reference's
        # proj2/proj3 expect dim*6/dim*3 where the concats carry dim*4/dim*2;
        # its forward cannot run past proj2 as written).
        torch.manual_seed(1)
        ref.proj2 = torch.nn.Conv2d(dim * 4, dim * 2, 1).eval()
        ref.proj3 = torch.nn.Conv2d(dim * 2, dim, 1).eval()

        variables = jax.tree.map(jnp.asarray, ti.import_luma_mhsa_state_dict(_sd(ref)))
        model = LumaMHSARawFormer(LumaMHSAConfig(dim=dim, num_heads=(2, 2, 2, 2)))
        x = RNG.uniform(0, 1, (1, 1, 64, 64))
        _check(model, variables, ref, x)


class TestWavKANImport:
    def test_round_trip(self):
        mod = _load_ref("kan_model.py")
        from bayer_low_light_image_enhancement_tpu.models.wavkan import (
            WavKANConfig,
            WavKANRawFormer,
        )

        torch.manual_seed(0)
        ref = mod.WavKANRawFormer(
            in_ch=1, out_ch=3, dim=16, heads=[2, 2, 2, 2]
        ).eval()
        variables = jax.tree.map(jnp.asarray, ti.import_wavkan_state_dict(_sd(ref)))
        model = WavKANRawFormer(
            WavKANConfig(
                in_ch=1, out_ch=3, dim=16, num_heads=(2, 2, 2, 2),
                ref_decoder_heads=True,
            )
        )
        x = RNG.uniform(0, 1, (1, 1, 64, 64))
        _check(model, variables, ref, x)
