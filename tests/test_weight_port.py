"""Weight-port hardening at REAL checkpoint scale and layout.

The reference runtime loads `seg_clip_model_l.pth` — a whole-module torch
pickle whose state_dict nests the CLIP weights under
`sem_seg_head.predictor.clip_model.` (load_lang_model.py:66-89) with the
vendored open_clip key manifest (timm ConvNeXt-L trunk + mlp proj head,
timm_model.py:125-146; text tower, model.py:159-212) — plus buffers and
unrelated SED submodule keys a converter must tolerate. The HR / AE
checkpoints are Lightning dicts ({"state_dict": {"model.*": ...}},
supervisedNet.py:111, autoencoder/model.py:64).

These tests build random-init checkpoints with EXACTLY those layouts at
full scale, push them through the tools/convert_weights.py CLI, and
assert forward parity against the independent torch oracles — failing on
any key-mapping or transpose mistake a real checkpoint would expose."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from test_language_models import (  # noqa: E402
    TestConvNeXt, TestTextTower,
)
from online_lang_splatting_tpu.models.checkpoints import load_npz_tree  # noqa: E402
from online_lang_splatting_tpu.models.convnext_clip import (  # noqa: E402
    ConvNeXtCLIPVisual,
)
from online_lang_splatting_tpu.models.text_tower import TextTower  # noqa: E402

pytestmark = pytest.mark.slow

PREFIX = "sem_seg_head.predictor.clip_model."


class ConvNeXtL(TestConvNeXt):
    """Full convnext_large_d_320 scale (open_clip config: dims 192..1536,
    depths 3/3/27/3, embed 768)."""

    DEPTHS = (3, 3, 27, 3)
    DIMS = (192, 384, 768, 1536)
    EMBED = 768


class TextL(TestTextTower):
    """Full CLIP text scale (convnext_large_d_320.json text_cfg)."""

    LAYERS, HEADS, WIDTH, EMBED, VOCAB, CTX = 16, 12, 768, 768, 49408, 77


def test_sed_converter_full_scale_manifest(tmp_path):
    g = np.random.default_rng(0)
    vis = ConvNeXtL()
    txt = TextL()
    sd_vis = vis._make_sd(g)
    sd_txt = txt._make_sd(g)

    # The real checkpoint's layout: prefixed CLIP keys + buffers/extras.
    full = {}
    for k, v in {**sd_vis, **sd_txt}.items():
        full[PREFIX + k] = torch.from_numpy(np.asarray(v))
    full[PREFIX + "logit_scale"] = torch.tensor(4.6052)
    full[PREFIX + "attn_mask"] = torch.full((77, 77), float("-inf")).triu(1)
    # Unrelated SED submodule keys the converter must ignore.
    full["sem_seg_head.predictor.fast_layers.0.weight"] = torch.zeros(8, 8)
    full["criterion.empty_weight"] = torch.zeros(4)

    ckpt = tmp_path / "seg_clip_model_l.pth"
    torch.save(full, ckpt)
    subprocess.run(
        [sys.executable, "tools/convert_weights.py", "--sed", str(ckpt),
         "--out", str(tmp_path)],
        check=True, cwd=str(Path(__file__).resolve().parent.parent),
    )

    # Visual forward parity at full channel scale (64² input).
    x = g.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = vis._torch_forward(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd_vis.items()},
            torch.from_numpy(x),
        )
    params = load_npz_tree(tmp_path / "clip_visual.npz")
    # Reference-exact modes regardless of the OLS_GELU/OLS_STEM perf knobs.
    model = ConvNeXtCLIPVisual(
        depths=vis.DEPTHS, dims=vis.DIMS, embed_dim=vis.EMBED,
        stem_mode="conv", gelu_mode="erf",
    )
    got = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    for key in ["stem", "res2", "res3", "res4", "res5", "clip_vis_dense"]:
        r = ref[key].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(got[key]), r, atol=5e-4, rtol=1e-3,
            err_msg=f"mismatch at {key}",
        )

    # Text forward parity at full scale.
    tokens = np.zeros((2, txt.CTX), np.int64)
    tokens[0, :5] = [1, 100, 2000, 30000, 49407]
    tokens[1, :3] = [1, 400, 49407]
    with torch.no_grad():
        ref_t = txt._torch_forward(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd_txt.items()},
            torch.from_numpy(tokens),
        )
    tparams = load_npz_tree(tmp_path / "clip_text.npz")
    tmodel = TextTower(
        vocab_size=txt.VOCAB, context_length=txt.CTX, width=txt.WIDTH,
        heads=txt.HEADS, layers=txt.LAYERS, embed_dim=txt.EMBED,
    )
    got_t = tmodel.apply({"params": tparams}, jnp.asarray(tokens.astype(np.int32)))
    np.testing.assert_allclose(
        np.asarray(got_t), ref_t.numpy(), atol=2e-4, rtol=1e-3
    )


def test_lightning_prefixed_hr_ae_roundtrip(tmp_path):
    """Lightning checkpoints ({"state_dict": {"model.*": ...}} with BN
    running stats) must convert through the CLI and reproduce the torch
    oracles — HR net + the reference-dims offline AE."""
    from test_language_models import TestAutoencoder, TestHRNet

    g = np.random.default_rng(1)
    repo = Path(__file__).resolve().parent.parent

    hr = TestHRNet()
    sd_hr = hr._make_sd(g)
    # TestHRNet's manifest already carries the Lightning "model." prefix.
    light_hr = {
        "state_dict": {k: torch.as_tensor(np.asarray(v))
                       for k, v in sd_hr.items()},
        "epoch": 12, "global_step": 3456,
    }
    torch.save(light_hr, tmp_path / "hr.ckpt")

    # Reference single-stage AE dims (slam_backend.py:117-124).
    enc, dec, clip = (384, 192, 96, 48, 24, 15), (24, 48, 96, 192, 384, 384, 768), 768
    ae = TestAutoencoder()
    sd_ae = ae._make_sd(g, enc=enc, dec=dec, clip=clip)
    light_ae = {
        "state_dict": {k: torch.as_tensor(np.asarray(v))
                       for k, v in sd_ae.items()},
        "epoch": 3,
    }
    torch.save(light_ae, tmp_path / "ae.ckpt")

    subprocess.run(
        [sys.executable, "tools/convert_weights.py",
         "--hr", str(tmp_path / "hr.ckpt"),
         "--ae", str(tmp_path / "ae.ckpt"),
         "--out", str(tmp_path)],
        check=True, cwd=str(repo),
    )

    # HR parity (frozen-BN inference uses running stats — a layout slip in
    # running_mean/var would fail here).
    from online_lang_splatting_tpu.models.hr_net import HighResLanguageFeatureNet

    fv = g.normal(size=(1, 768, 6, 6)).astype(np.float32)
    f3 = g.normal(size=(1, 384, 24, 24)).astype(np.float32)
    f2 = g.normal(size=(1, 192, 48, 48)).astype(np.float32)
    with torch.no_grad():
        ref = hr._torch_forward(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd_hr.items()},
            torch.from_numpy(fv), torch.from_numpy(f3), torch.from_numpy(f2),
        )
    variables = load_npz_tree(tmp_path / "hr_net.npz")
    model = HighResLanguageFeatureNet()
    got = model.apply(
        variables,
        jnp.asarray(fv.transpose(0, 2, 3, 1)),
        jnp.asarray(f3.transpose(0, 2, 3, 1)),
        jnp.asarray(f2.transpose(0, 2, 3, 1)),
    )
    ref_np = ref.numpy().transpose(0, 2, 3, 1)
    scale = np.abs(ref_np).max()
    np.testing.assert_allclose(
        np.asarray(got) / scale, ref_np / scale, atol=5e-4
    )

    # AE parity at reference dims.
    from online_lang_splatting_tpu.models.autoencoder import AutoencoderMLP

    x = g.normal(size=(32, clip)).astype(np.float32)
    with torch.no_grad():
        z_ref, ref_ae = ae._torch_forward(
            {k: torch.as_tensor(np.asarray(v)) for k, v in sd_ae.items()},
            torch.from_numpy(x), enc=enc, dec=dec,
        )
    ae_vars = load_npz_tree(tmp_path / "autoencoder.npz")
    ae_model = AutoencoderMLP(encoder_dims=enc, decoder_dims=dec)
    got_ae = ae_model.apply(ae_vars, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got_ae), ref_ae.numpy(), atol=2e-5, rtol=1e-4
    )
