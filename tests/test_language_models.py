"""Language stack: torch-oracle parity for ConvNeXt/CLIP-text/HR/AE modules.

Each test builds a random torch state_dict with the reference's key layout,
runs an independent torch functional forward, converts the weights with
tools/convert_weights, and compares the Flax module output.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import convert_weights as CW  # noqa: E402

from online_lang_splatting_tpu.models.autoencoder import (  # noqa: E402
    AutoencoderMLP, EncoderDecoderOnline,
)
from online_lang_splatting_tpu.models.convnext_clip import ConvNeXtCLIPVisual  # noqa: E402
from online_lang_splatting_tpu.models.hr_net import HighResLanguageFeatureNet  # noqa: E402
from online_lang_splatting_tpu.models.text_tower import TextTower  # noqa: E402


def _t(shape, g, scale=0.1):
    return torch.from_numpy(g.normal(size=shape).astype(np.float32) * scale)


def _ln_nchw(x, w, b):
    x = x.permute(0, 2, 3, 1)
    x = F.layer_norm(x, (x.shape[-1],), w, b, eps=1e-6)
    return x.permute(0, 3, 1, 2)


class TestConvNeXt:
    DEPTHS = (1, 1, 2, 1)
    DIMS = (8, 16, 24, 32)
    EMBED = 16

    def _make_sd(self, g):
        sd = {}
        d = self.DIMS
        sd["visual.trunk.stem.0.weight"] = _t((d[0], 3, 4, 4), g)
        sd["visual.trunk.stem.0.bias"] = _t((d[0],), g)
        sd["visual.trunk.stem.1.weight"] = 1 + _t((d[0],), g)
        sd["visual.trunk.stem.1.bias"] = _t((d[0],), g)
        for s in range(4):
            if s > 0:
                sd[f"visual.trunk.stages.{s}.downsample.0.weight"] = 1 + _t((d[s - 1],), g)
                sd[f"visual.trunk.stages.{s}.downsample.0.bias"] = _t((d[s - 1],), g)
                sd[f"visual.trunk.stages.{s}.downsample.1.weight"] = _t((d[s], d[s - 1], 2, 2), g)
                sd[f"visual.trunk.stages.{s}.downsample.1.bias"] = _t((d[s],), g)
            for bi in range(self.DEPTHS[s]):
                p = f"visual.trunk.stages.{s}.blocks.{bi}."
                sd[p + "conv_dw.weight"] = _t((d[s], 1, 7, 7), g)
                sd[p + "conv_dw.bias"] = _t((d[s],), g)
                sd[p + "norm.weight"] = 1 + _t((d[s],), g)
                sd[p + "norm.bias"] = _t((d[s],), g)
                sd[p + "mlp.fc1.weight"] = _t((4 * d[s], d[s]), g)
                sd[p + "mlp.fc1.bias"] = _t((4 * d[s],), g)
                sd[p + "mlp.fc2.weight"] = _t((d[s], 4 * d[s]), g)
                sd[p + "mlp.fc2.bias"] = _t((d[s],), g)
                sd[p + "gamma"] = _t((d[s],), g, 1.0)
        sd["visual.trunk.head.norm.weight"] = 1 + _t((d[3],), g)
        sd["visual.trunk.head.norm.bias"] = _t((d[3],), g)
        sd["visual.head.mlp.fc1.weight"] = _t((2 * self.EMBED, d[3]), g)
        sd["visual.head.mlp.fc1.bias"] = _t((2 * self.EMBED,), g)
        sd["visual.head.mlp.fc2.weight"] = _t((self.EMBED, 2 * self.EMBED), g)
        return sd

    def _torch_forward(self, sd, x):
        """Independent NCHW re-derivation of the dense pyramid forward."""
        out = {}
        x = F.conv2d(x, sd["visual.trunk.stem.0.weight"], sd["visual.trunk.stem.0.bias"], stride=4)
        x = _ln_nchw(x, sd["visual.trunk.stem.1.weight"], sd["visual.trunk.stem.1.bias"])
        out["stem"] = x
        for s in range(4):
            if s > 0:
                x = _ln_nchw(
                    x,
                    sd[f"visual.trunk.stages.{s}.downsample.0.weight"],
                    sd[f"visual.trunk.stages.{s}.downsample.0.bias"],
                )
                x = F.conv2d(
                    x,
                    sd[f"visual.trunk.stages.{s}.downsample.1.weight"],
                    sd[f"visual.trunk.stages.{s}.downsample.1.bias"],
                    stride=2,
                )
            for bi in range(self.DEPTHS[s]):
                p = f"visual.trunk.stages.{s}.blocks.{bi}."
                y = F.conv2d(
                    x, sd[p + "conv_dw.weight"], sd[p + "conv_dw.bias"],
                    padding=3, groups=x.shape[1],
                )
                y = y.permute(0, 2, 3, 1)
                y = F.layer_norm(y, (y.shape[-1],), sd[p + "norm.weight"], sd[p + "norm.bias"], eps=1e-6)
                y = F.linear(y, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
                y = F.gelu(y)
                y = F.linear(y, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
                y = (sd[p + "gamma"] * y).permute(0, 3, 1, 2)
                x = x + y
            out[f"res{s + 2}"] = x
        y = x.permute(0, 2, 3, 1)
        y = F.layer_norm(
            y, (y.shape[-1],),
            sd["visual.trunk.head.norm.weight"], sd["visual.trunk.head.norm.bias"],
            eps=1e-6,
        )
        y = F.linear(y, sd["visual.head.mlp.fc1.weight"], sd["visual.head.mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd["visual.head.mlp.fc2.weight"])
        out["clip_vis_dense"] = y.permute(0, 3, 1, 2)
        return out

    def test_parity(self):
        g = np.random.default_rng(0)
        sd = self._make_sd(g)
        x = g.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = self._torch_forward(sd, torch.from_numpy(x))
        params = CW.convert_visual(sd, depths=self.DEPTHS)
        # Torch-oracle parity pins the REFERENCE-EXACT modes regardless of
        # the OLS_GELU/OLS_STEM perf knobs.
        model = ConvNeXtCLIPVisual(depths=self.DEPTHS, dims=self.DIMS,
                                   embed_dim=self.EMBED,
                                   stem_mode="conv", gelu_mode="erf")
        got = model.apply(
            {"params": jax.tree.map(jnp.asarray, params)},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
        )
        for key in ["stem", "res2", "res3", "res4", "res5", "clip_vis_dense"]:
            r = ref[key].numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                np.asarray(got[key]), r, atol=2e-5, rtol=1e-4,
                err_msg=f"mismatch at {key}",
            )


class TestTextTower:
    LAYERS, HEADS, WIDTH, EMBED, VOCAB, CTX = 2, 4, 32, 16, 64, 12

    def _make_sd(self, g):
        w = self.WIDTH
        sd = {
            "token_embedding.weight": _t((self.VOCAB, w), g),
            "positional_embedding": _t((self.CTX, w), g),
            "text_projection": _t((w, self.EMBED), g),
            "ln_final.weight": 1 + _t((w,), g),
            "ln_final.bias": _t((w,), g),
        }
        for i in range(self.LAYERS):
            b = f"transformer.resblocks.{i}."
            sd[b + "attn.in_proj_weight"] = _t((3 * w, w), g)
            sd[b + "attn.in_proj_bias"] = _t((3 * w,), g)
            sd[b + "attn.out_proj.weight"] = _t((w, w), g)
            sd[b + "attn.out_proj.bias"] = _t((w,), g)
            sd[b + "ln_1.weight"] = 1 + _t((w,), g)
            sd[b + "ln_1.bias"] = _t((w,), g)
            sd[b + "ln_2.weight"] = 1 + _t((w,), g)
            sd[b + "ln_2.bias"] = _t((w,), g)
            sd[b + "mlp.c_fc.weight"] = _t((4 * w, w), g)
            sd[b + "mlp.c_fc.bias"] = _t((4 * w,), g)
            sd[b + "mlp.c_proj.weight"] = _t((w, 4 * w), g)
            sd[b + "mlp.c_proj.bias"] = _t((w,), g)
        return sd

    def _torch_forward(self, sd, tokens):
        w, h = self.WIDTH, self.HEADS
        x = F.embedding(tokens, sd["token_embedding.weight"]) + sd["positional_embedding"]
        n, L, _ = x.shape
        mask = torch.full((L, L), float("-inf")).triu(1)
        for i in range(self.LAYERS):
            b = f"transformer.resblocks.{i}."
            y = F.layer_norm(x, (w,), sd[b + "ln_1.weight"], sd[b + "ln_1.bias"], eps=1e-5)
            qkv = F.linear(y, sd[b + "attn.in_proj_weight"], sd[b + "attn.in_proj_bias"])
            q, k, v = qkv.chunk(3, dim=-1)

            def split(t):
                return t.view(n, L, h, w // h).transpose(1, 2)

            attn = torch.softmax(
                split(q) @ split(k).transpose(-1, -2) / np.sqrt(w // h) + mask, dim=-1
            )
            y = (attn @ split(v)).transpose(1, 2).reshape(n, L, w)
            y = F.linear(y, sd[b + "attn.out_proj.weight"], sd[b + "attn.out_proj.bias"])
            x = x + y
            y = F.layer_norm(x, (w,), sd[b + "ln_2.weight"], sd[b + "ln_2.bias"], eps=1e-5)
            y = F.linear(y, sd[b + "mlp.c_fc.weight"], sd[b + "mlp.c_fc.bias"])
            y = F.gelu(y)
            y = F.linear(y, sd[b + "mlp.c_proj.weight"], sd[b + "mlp.c_proj.bias"])
            x = x + y
        x = F.layer_norm(x, (w,), sd["ln_final.weight"], sd["ln_final.bias"], eps=1e-5)
        pooled = x[torch.arange(n), tokens.argmax(dim=-1)]
        return pooled @ sd["text_projection"]

    def test_parity(self):
        g = np.random.default_rng(1)
        sd = self._make_sd(g)
        tokens = np.zeros((2, self.CTX), np.int64)
        tokens[0, :5] = [1, 10, 20, 30, 63]
        tokens[1, :3] = [1, 40, 63]
        with torch.no_grad():
            ref = self._torch_forward(sd, torch.from_numpy(tokens))
        params = CW.convert_text(sd, layers=self.LAYERS, heads=self.HEADS, width=self.WIDTH)
        model = TextTower(
            vocab_size=self.VOCAB, context_length=self.CTX, width=self.WIDTH,
            heads=self.HEADS, layers=self.LAYERS, embed_dim=self.EMBED,
        )
        got = model.apply(
            {"params": jax.tree.map(jnp.asarray, params)},
            jnp.asarray(tokens.astype(np.int32)),
        )
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5, rtol=1e-4)


class TestHRNet:
    def _make_sd(self, g):
        sd = {}

        def conv(name, cin, cout, k):
            sd[name + ".weight"] = _t((cout, cin, k, k), g)
            sd[name + ".bias"] = _t((cout,), g)

        def convT(name, cin, cout):
            sd[name + ".weight"] = _t((cin, cout, 4, 4), g)
            sd[name + ".bias"] = _t((cout,), g)

        def bn(name, c):
            sd[name + ".weight"] = 1 + _t((c,), g)
            sd[name + ".bias"] = _t((c,), g)
            sd[name + ".running_mean"] = _t((c,), g)
            sd[name + ".running_var"] = torch.abs(1 + _t((c,), g))

        conv("model.initial_conv.0", 768, 512, 3); bn("model.initial_conv.1", 512)
        convT("model.upsample1.0", 512, 512); bn("model.upsample1.1", 512)
        conv("model.attention_fusion1.low_res_align", 384, 512, 1)
        conv("model.attention_fusion1.fusion.0", 1024, 512, 3); bn("model.attention_fusion1.fusion.1", 512)
        conv("model.attention_fusion1.attention.0", 512, 512, 3); bn("model.attention_fusion1.attention.1", 512)
        conv("model.attention_fusion1.attention.3", 512, 512, 1)
        convT("model.upsample2.0", 512, 256); bn("model.upsample2.1", 256)
        conv("model.attention_fusion2.low_res_align", 192, 256, 1)
        conv("model.attention_fusion2.fusion.0", 512, 256, 3); bn("model.attention_fusion2.fusion.1", 256)
        conv("model.attention_fusion2.attention.0", 256, 256, 3); bn("model.attention_fusion2.attention.1", 256)
        conv("model.attention_fusion2.attention.3", 256, 256, 1)
        convT("model.upsample3.0", 256, 128); bn("model.upsample3.1", 128)
        conv("model.final_conv", 128, 768, 1)
        return sd

    def _torch_forward(self, sd, fv, f3, f2):
        def cbr(x, conv, bnn, transpose=False):
            if transpose:
                x = F.conv_transpose2d(x, sd[conv + ".weight"], sd[conv + ".bias"], stride=2, padding=1)
            else:
                k = sd[conv + ".weight"].shape[-1]
                x = F.conv2d(x, sd[conv + ".weight"], sd[conv + ".bias"], padding=k // 2)
            x = F.batch_norm(
                x, sd[bnn + ".running_mean"], sd[bnn + ".running_var"],
                sd[bnn + ".weight"], sd[bnn + ".bias"], training=False, eps=1e-5,
            )
            return F.relu(x)

        def fuse(x, low, base):
            low = F.conv2d(low, sd[base + ".low_res_align.weight"], sd[base + ".low_res_align.bias"])
            f = torch.cat([x, low], 1)
            f = cbr(f, base + ".fusion.0", base + ".fusion.1")
            a = cbr(f, base + ".attention.0", base + ".attention.1")
            a = torch.sigmoid(F.conv2d(a, sd[base + ".attention.3.weight"], sd[base + ".attention.3.bias"]))
            return f * a + f

        x = cbr(fv, "model.initial_conv.0", "model.initial_conv.1")
        x = cbr(x, "model.upsample1.0", "model.upsample1.1", transpose=True)
        f3r = F.interpolate(f3, size=x.shape[2:], mode="bilinear", align_corners=False)
        x = fuse(x, f3r, "model.attention_fusion1")
        x = cbr(x, "model.upsample2.0", "model.upsample2.1", transpose=True)
        f2r = F.interpolate(f2, size=x.shape[2:], mode="bilinear", align_corners=False)
        x = fuse(x, f2r, "model.attention_fusion2")
        x = cbr(x, "model.upsample3.0", "model.upsample3.1", transpose=True)
        return F.conv2d(x, sd["model.final_conv.weight"], sd["model.final_conv.bias"])

    def test_parity(self):
        g = np.random.default_rng(2)
        sd = self._make_sd(g)
        fv = g.normal(size=(1, 768, 6, 6)).astype(np.float32)
        f3 = g.normal(size=(1, 384, 24, 24)).astype(np.float32)
        f2 = g.normal(size=(1, 192, 48, 48)).astype(np.float32)
        with torch.no_grad():
            ref = self._torch_forward(
                sd, *(torch.from_numpy(a) for a in (fv, f3, f2))
            ).numpy().transpose(0, 2, 3, 1)
        variables = jax.tree.map(jnp.asarray, CW.convert_hr(sd))
        got = HighResLanguageFeatureNet().apply(
            variables,
            jnp.asarray(fv.transpose(0, 2, 3, 1)),
            jnp.asarray(f3.transpose(0, 2, 3, 1)),
            jnp.asarray(f2.transpose(0, 2, 3, 1)),
        )
        # Random (unscaled) weights amplify magnitudes ~1e3 through ten conv
        # layers; compare with magnitude-relative tolerance.
        scale = np.abs(ref).max()
        np.testing.assert_allclose(
            np.asarray(got) / scale, ref / scale, atol=5e-4
        )


class TestAutoencoder:
    def _make_sd(self, g, enc=(16, 8), dec=(12, 32), clip=32):
        sd = {}
        dims = [clip] + list(enc)
        idx = 0
        for i in range(len(enc)):
            if i > 0:
                sd[f"model.encoder.{idx}.weight"] = 1 + _t((dims[i],), g)
                sd[f"model.encoder.{idx}.bias"] = _t((dims[i],), g)
                sd[f"model.encoder.{idx}.running_mean"] = _t((dims[i],), g)
                sd[f"model.encoder.{idx}.running_var"] = torch.abs(1 + _t((dims[i],), g))
                sd[f"model.encoder.{idx}.num_batches_tracked"] = torch.tensor(0)
                idx += 2  # BN + ReLU
            sd[f"model.encoder.{idx}.weight"] = _t((dims[i + 1], dims[i]), g)
            sd[f"model.encoder.{idx}.bias"] = _t((dims[i + 1],), g)
            idx += 1
        ddims = [enc[-1]] + list(dec)
        idx = 0
        for i in range(len(dec)):
            if i > 0:
                idx += 1  # ReLU
            sd[f"model.decoder.{idx}.weight"] = _t((ddims[i + 1], ddims[i]), g)
            sd[f"model.decoder.{idx}.bias"] = _t((ddims[i + 1],), g)
            idx += 1
        return sd

    def _torch_forward(self, sd, x, enc=(16, 8), dec=(12, 32)):
        idx = 0
        for i in range(len(enc)):
            if i > 0:
                x = F.batch_norm(
                    x, sd[f"model.encoder.{idx}.running_mean"],
                    sd[f"model.encoder.{idx}.running_var"],
                    sd[f"model.encoder.{idx}.weight"], sd[f"model.encoder.{idx}.bias"],
                    training=False,
                )
                x = F.relu(x)
                idx += 2
            x = F.linear(x, sd[f"model.encoder.{idx}.weight"], sd[f"model.encoder.{idx}.bias"])
            idx += 1
        x = x / x.norm(dim=-1, keepdim=True)
        z = x
        idx = 0
        for i in range(len(dec)):
            if i > 0:
                x = F.relu(x)
                idx += 1
            x = F.linear(x, sd[f"model.decoder.{idx}.weight"], sd[f"model.decoder.{idx}.bias"])
            idx += 1
        return z, x / x.norm(dim=-1, keepdim=True)

    def test_parity(self):
        g = np.random.default_rng(3)
        sd = self._make_sd(g)
        x = g.normal(size=(7, 32)).astype(np.float32)
        with torch.no_grad():
            z_ref, out_ref = self._torch_forward(sd, torch.from_numpy(x))
        variables = jax.tree.map(jnp.asarray, CW.convert_ae(sd))
        model = AutoencoderMLP(encoder_dims=(16, 8), decoder_dims=(12, 32))
        z = model.apply(variables, jnp.asarray(x), method=AutoencoderMLP.encode)
        out = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=2e-5, rtol=1e-4)

    def test_online_ae_parity(self):
        g = np.random.default_rng(4)
        sd = {}
        for name, (o, i) in {
            "encoder.0": (24, 32), "encoder.2": (15, 24),
            "decoder.0": (24, 15), "decoder.2": (32, 24),
        }.items():
            sd[name + ".weight"] = _t((o, i), g)
            sd[name + ".bias"] = _t((o,), g)
        x = g.normal(size=(5, 32)).astype(np.float32)
        with torch.no_grad():
            z = F.linear(torch.from_numpy(x), sd["encoder.0.weight"], sd["encoder.0.bias"])
            z = F.linear(F.relu(z), sd["encoder.2.weight"], sd["encoder.2.bias"])
            z = z / z.norm(dim=-1, keepdim=True)
            y = F.linear(z, sd["decoder.0.weight"], sd["decoder.0.bias"])
            y = F.linear(F.relu(y), sd["decoder.2.weight"], sd["decoder.2.bias"])
            y = y / y.norm(dim=-1, keepdim=True)
        variables = jax.tree.map(jnp.asarray, CW.convert_online_ae(sd))
        model = EncoderDecoderOnline()
        zj = model.apply(variables, jnp.asarray(x), method=EncoderDecoderOnline.encode)
        yj = model.apply(variables, jnp.asarray(zj), method=EncoderDecoderOnline.decode)
        np.testing.assert_allclose(np.asarray(zj), z.numpy(), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(yj), y.numpy(), atol=2e-5, rtol=1e-4)


class TestTokenizer:
    def test_known_clip_ids(self):
        from online_lang_splatting_tpu.models.tokenizer import SimpleTokenizer, find_vocab

        if find_vocab() is None:
            pytest.skip("BPE vocab asset not available")
        tok = SimpleTokenizer()
        ids = tok("a photo of a cat")[0]
        expected = [49406, 320, 1125, 539, 320, 2368, 49407]
        np.testing.assert_array_equal(ids[: len(expected)], expected)
        assert ids[len(expected):].sum() == 0


class TestTraining:
    def test_offline_train_step_decreases_loss(self):
        from online_lang_splatting_tpu.models import autoencoder as AE

        model = AutoencoderMLP(encoder_dims=(16, 8), decoder_dims=(12, 32))
        g = np.random.default_rng(5)
        x = jnp.asarray(g.normal(size=(64, 32)), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        variables = model.init(jax.random.key(0), x, train=True)
        optimizer = AE.make_offline_optimizer()
        opt_state = optimizer.init(variables["params"])
        step = jax.jit(AE.offline_train_step(model, optimizer))
        losses = []
        for _ in range(60):
            variables, opt_state, loss = step(variables, opt_state, x)
            losses.append(float(loss))
        assert losses[-1] < losses[2]

    def test_online_train_step_decreases_loss(self):
        from online_lang_splatting_tpu.models import autoencoder as AE

        model = EncoderDecoderOnline()
        g = np.random.default_rng(6)
        x = jnp.asarray(g.normal(size=(128, 32)), dtype=jnp.float32)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        params = model.init(jax.random.key(0), x)["params"]
        optimizer = AE.make_online_optimizer()
        opt_state = optimizer.init(params)
        step = jax.jit(AE.online_train_step(model, optimizer))
        losses = []
        for _ in range(50):
            params, opt_state, loss = step(params, opt_state, x)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestPhaseConvTranspose:
    """PhaseConvTranspose2x (polyphase k4s2 decomposition — 4x fewer
    MACs than XLA's input-dilation lowering) must be numerically
    identical to nn.ConvTranspose under the SAME converted params."""

    def test_matches_xla_convtranspose_fwd_and_grad(self):
        import flax.linen as fnn

        from online_lang_splatting_tpu.models.hr_net import (
            PhaseConvTranspose2x,
        )

        g = np.random.default_rng(5)
        x = jnp.asarray(g.normal(size=(2, 12, 10, 6)), jnp.float32)
        kernel = jnp.asarray(g.normal(size=(4, 4, 5, 6)), jnp.float32)
        bias = jnp.asarray(g.normal(size=(5,)), jnp.float32)
        variables = {"params": {"kernel": kernel, "bias": bias}}

        ref_mod = fnn.ConvTranspose(
            5, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            transpose_kernel=True,
        )

        def f_ref(v, xx):
            return jnp.sum(jnp.sin(ref_mod.apply(v, xx)))

        def f_phase(v, xx):
            return jnp.sum(jnp.sin(PhaseConvTranspose2x(5).apply(v, xx)))

        ref = ref_mod.apply(variables, x)
        got = PhaseConvTranspose2x(5).apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

        gr = jax.grad(f_ref, argnums=(0, 1))(variables, x)
        gp = jax.grad(f_phase, argnums=(0, 1))(variables, x)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
            ),
            gr, gp,
        )

    def test_bf16_activations_f32_params(self):
        """Regression: bf16 activations x f32 params crashed the raw
        lax.conv ("requires arguments to have the same dtypes") in the
        round-4 hardware bench — the promote-then-conv path must accept
        the mixed-precision extractor pipeline."""
        from online_lang_splatting_tpu.models.hr_net import (
            PhaseConvTranspose2x,
        )

        g = np.random.default_rng(7)
        x = jnp.asarray(g.normal(size=(1, 6, 8, 4)), jnp.bfloat16)
        kernel = jnp.asarray(g.normal(size=(4, 4, 3, 4)), jnp.float32)
        bias = jnp.zeros((3,), jnp.float32)
        variables = {"params": {"kernel": kernel, "bias": bias}}
        out = jax.jit(PhaseConvTranspose2x(3).apply)(variables, x)
        assert out.dtype == jnp.float32  # flax promotion semantics
        assert out.shape == (1, 12, 16, 3)
        # And the all-bf16 case (pre-cast trees) stays bf16.
        vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables)
        outb = jax.jit(PhaseConvTranspose2x(3).apply)(vb, x)
        assert outb.dtype == jnp.bfloat16


class TestGELUKnob:
    def test_gelu_tanh_parity(self):
        """OLS_GELU=tanh (VPU-time A/B knob) must stay within the bf16
        tower's own noise floor: full-tower cosine >= 0.9999 and the
        activation function itself within 2e-3 absolute of exact erf."""
        import online_lang_splatting_tpu.models.convnext_clip as cc

        x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
        a = np.asarray(jax.nn.gelu(x, approximate=False))
        b = np.asarray(jax.nn.gelu(x, approximate=True))
        assert np.abs(a - b).max() < 2e-3

        g = np.random.default_rng(3)
        img = jnp.asarray(g.normal(size=(1, 64, 64, 3)), jnp.float32)
        erf_tower = cc.ConvNeXtCLIPVisual(
            depths=(2, 2, 2, 2), dims=(16, 32, 64, 128), embed_dim=32,
            gelu_mode="erf")
        tanh_tower = cc.ConvNeXtCLIPVisual(
            depths=(2, 2, 2, 2), dims=(16, 32, 64, 128), embed_dim=32,
            gelu_mode="tanh")
        params = erf_tower.init(jax.random.key(0), img)["params"]
        ref = np.asarray(erf_tower.apply({"params": params}, img)[
            "clip_vis_dense"]).ravel()
        tanh = np.asarray(tanh_tower.apply({"params": params}, img)[
            "clip_vis_dense"]).ravel()
        cos = float(np.dot(ref, tanh)
                    / (np.linalg.norm(ref) * np.linalg.norm(tanh) + 1e-12))
        assert cos >= 0.9999, cos


class TestStemKnob:
    def test_stem_s2d_matches_conv(self):
        """OLS_STEM=s2d (space-to-depth + matmul stem) is the SAME
        contraction as the 4×4/s4 VALID conv — parity to reassociation
        rounding, with identical parameter shapes/paths."""
        import online_lang_splatting_tpu.models.convnext_clip as cc

        g = np.random.default_rng(7)
        img = jnp.asarray(g.normal(size=(2, 64, 64, 3)), jnp.float32)
        conv_tower = cc.ConvNeXtCLIPVisual(
            depths=(2, 2, 2, 2), dims=(16, 32, 64, 128), embed_dim=32,
            stem_mode="conv",
        )
        params = conv_tower.init(jax.random.key(1), img)["params"]
        assert params["stem_conv"]["kernel"].shape == (4, 4, 3, 16)
        s2d_tower = cc.ConvNeXtCLIPVisual(
            depths=(2, 2, 2, 2), dims=(16, 32, 64, 128), embed_dim=32,
            stem_mode="s2d",
        )
        # Same params apply to both modes (checkpoint compatibility).
        ref = np.asarray(
            conv_tower.apply({"params": params}, img)["clip_vis_dense"])
        alt = np.asarray(
            s2d_tower.apply({"params": params}, img)["clip_vis_dense"])
        np.testing.assert_allclose(alt, ref, rtol=2e-4, atol=2e-5)
        # Stem output itself is near-exact (one matmul vs one conv).
        rs = np.asarray(conv_tower.apply({"params": params}, img)["stem"])
        as_ = np.asarray(s2d_tower.apply({"params": params}, img)["stem"])
        np.testing.assert_allclose(as_, rs, rtol=1e-5, atol=1e-6)

    def test_stem_s2d_bf16(self):
        """bf16 params + bf16 input (the production pre-cast tree) runs
        and stays bf16 through the s2d stem."""
        import online_lang_splatting_tpu.models.convnext_clip as cc

        stem = cc._StemConv(16, mode="s2d")
        x = jnp.ones((1, 16, 16, 3), jnp.bfloat16)
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            stem.init(jax.random.key(0), x)["params"],
        )
        out = jax.jit(stem.apply)({"params": params}, x)
        assert out.dtype == jnp.bfloat16
        assert out.shape == (1, 4, 4, 16)


class TestHeadKnob:
    def test_head_flat_matches_mlp(self):
        """OLS_HEAD=flat (reshape the projection head to one (N*H*W, C)
        GEMM) is mathematically identical to the NHWC form — Dense
        contracts only the last dim; parity is exact up to reassociation
        rounding. Same parameter shapes/paths (checkpoint compat)."""
        import online_lang_splatting_tpu.models.convnext_clip as cc

        g = np.random.default_rng(11)
        img = jnp.asarray(g.normal(size=(2, 64, 64, 3)), jnp.float32)
        mlp_tower = cc.ConvNeXtCLIPVisual(
            depths=(2, 2, 2, 2), dims=(16, 32, 64, 128), embed_dim=32,
            head_mode="mlp",
        )
        params = mlp_tower.init(jax.random.key(3), img)["params"]
        flat_tower = cc.ConvNeXtCLIPVisual(
            depths=(2, 2, 2, 2), dims=(16, 32, 64, 128), embed_dim=32,
            head_mode="flat",
        )
        ref = np.asarray(
            mlp_tower.apply({"params": params}, img)["clip_vis_dense"])
        alt = np.asarray(
            flat_tower.apply({"params": params}, img)["clip_vis_dense"])
        assert alt.shape == ref.shape
        np.testing.assert_allclose(alt, ref, rtol=1e-5, atol=1e-6)
