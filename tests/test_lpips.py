"""LPIPS (AlexNet) parity against a torch re-implementation of the metric
the reference computes via torchmetrics (eval_utils.py:39), plus MS-SSIM
substitute sanity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from online_lang_splatting_tpu.eval import lpips as L  # noqa: E402

SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


class TorchAlexLPIPS(nn.Module):
    """Faithful torch restatement of lpips.LPIPS(net='alex'):
    AlexNet features, taps after each ReLU stage, channel unit-normalize,
    squared diff, 1x1 lin conv, spatial average, sum over stages."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(),          # 0,1
            nn.MaxPool2d(3, 2),                              # 2
            nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(),          # 3,4
            nn.MaxPool2d(3, 2),                              # 5
            nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),         # 6,7
            nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),         # 8,9
            nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),         # 10,11
        )
        self.lins = nn.ModuleList(
            [nn.Conv2d(c, 1, 1, bias=False) for c in (64, 192, 384, 256, 256)]
        )
        self.taps = (1, 4, 7, 9, 11)

    def forward(self, x0, x1):
        def prep(x):
            return (2.0 * x - 1.0 - SHIFT) / SCALE

        def feats(x):
            out = []
            for i, m in enumerate(self.features):
                x = m(x)
                if i in self.taps:
                    out.append(x)
            return out

        def unit(x):
            return x / (x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)

        total = 0.0
        for a, b, lin in zip(feats(prep(x0)), feats(prep(x1)), self.lins):
            d = (unit(a) - unit(b)).pow(2)
            total = total + lin(d).mean(dim=(2, 3))
        return total

    def lpips_state_dict(self):
        """Emit the `lpips` package key layout consumed by the converter."""
        conv_pos = (0, 3, 6, 8, 10)
        sd = {}
        for k, pos in enumerate(conv_pos):
            conv = self.features[pos]
            sd[f"net.slice{k + 1}.{pos}.weight"] = conv.weight.detach()
            sd[f"net.slice{k + 1}.{pos}.bias"] = conv.bias.detach()
        for k, lin in enumerate(self.lins):
            sd[f"lin{k}.model.1.weight"] = lin.weight.detach()
        return sd


def test_lpips_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TorchAlexLPIPS()
    with torch.no_grad():
        for lin in oracle.lins:
            lin.weight.abs_()

    rng = np.random.default_rng(0)
    x0 = rng.uniform(size=(1, 3, 96, 128)).astype(np.float32)
    x1 = np.clip(x0 + rng.normal(size=x0.shape).astype(np.float32) * 0.1, 0, 1)

    with torch.no_grad():
        ref = float(oracle(torch.from_numpy(x0), torch.from_numpy(x1)))

    params = L.params_from_state_dict(
        {k: v.numpy() for k, v in oracle.lpips_state_dict().items()}
    )
    got = float(L.lpips(params, jnp.asarray(x0[0]), jnp.asarray(x1[0])))
    assert abs(got - ref) < 1e-5 * max(1.0, abs(ref)), (got, ref)

    same = float(L.lpips(params, jnp.asarray(x0[0]), jnp.asarray(x0[0])))
    assert abs(same) < 1e-7


def test_lpips_converter_roundtrip(tmp_path):
    """convert_weights --lpips npz → load_params reproduces the params."""
    import subprocess
    import sys

    torch.manual_seed(1)
    oracle = TorchAlexLPIPS()
    ckpt = tmp_path / "lpips_alex.pth"
    torch.save(oracle.lpips_state_dict(), ckpt)
    subprocess.run(
        [sys.executable, "tools/convert_weights.py", "--lpips", str(ckpt),
         "--out", str(tmp_path)],
        check=True,
    )
    params = L.load_params(str(tmp_path / "lpips_alex.npz"))
    direct = L.params_from_state_dict(
        {k: v.numpy() for k, v in oracle.lpips_state_dict().items()}
    )
    for (w1, b1), (w2, b2) in zip(params["convs"], direct["convs"]):
        assert np.allclose(w1, w2) and np.allclose(b1, b2)
    for l1, l2 in zip(params["lins"], direct["lins"]):
        assert np.allclose(l1, l2)


def test_ms_ssim_substitute():
    from online_lang_splatting_tpu.ops import losses

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(size=(3, 64, 96)), jnp.float32)
    noisy = jnp.clip(
        img + jnp.asarray(rng.normal(size=(3, 64, 96)) * 0.1, jnp.float32),
        0, 1,
    )
    v_same = float(losses.ms_ssim(img, img))
    v_noisy = float(losses.ms_ssim(img, noisy))
    assert v_same > 0.999
    assert v_noisy < v_same
    # the LPIPS substitute is a distance: 0 for identical images
    assert 1.0 - v_same < 1e-3
