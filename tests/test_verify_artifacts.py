"""End-to-end drill of the turnkey real-artifact pipeline.

tools/verify_artifacts.py is the one command to run the day real
reference checkpoints (`seg_clip_model_l.pth`, HR/AE Lightning ckpts,
online-AE state_dict — reference create_lang_model.py:90-103,
load_lang_model.py:66-89) become available: discover -> convert ->
torch-oracle parity. No real artifacts exist in this environment, so
this test fabricates a full artifact directory at real layout (reusing
the same generators as tests/test_weight_port.py) and asserts the tool
classifies, converts, and parity-checks every one of them.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _build_artifact_dir(tmp_path: Path) -> Path:
    from test_language_models import TestAutoencoder, TestHRNet
    from test_weight_port import PREFIX, ConvNeXtL, TextL

    g = np.random.default_rng(0)
    art = tmp_path / "artifacts"
    art.mkdir()

    # SED whole-model pickle layout (prefixed CLIP keys + extras).
    full = {}
    for k, v in {**ConvNeXtL()._make_sd(g), **TextL()._make_sd(g)}.items():
        full[PREFIX + k] = torch.from_numpy(np.asarray(v))
    full[PREFIX + "logit_scale"] = torch.tensor(4.6052)
    full["criterion.empty_weight"] = torch.zeros(4)
    torch.save(full, art / "seg_clip_model_l.pth")

    # HR + offline AE as Lightning checkpoints (intentionally unhelpful
    # filenames — discovery must classify by key signature, not name).
    sd_hr = {k: torch.as_tensor(np.asarray(v))
             for k, v in TestHRNet()._make_sd(g).items()}
    torch.save({"state_dict": sd_hr, "epoch": 9}, art / "epoch=9-step=1.ckpt")

    enc, dec, clip = (384, 192, 96, 48, 24, 15), \
        (24, 48, 96, 192, 384, 384, 768), 768
    sd_ae = {k: torch.as_tensor(np.asarray(v))
             for k, v in TestAutoencoder()._make_sd(
                 g, enc=enc, dec=dec, clip=clip).items()}
    torch.save({"state_dict": sd_ae, "epoch": 2}, art / "last.ckpt")

    # Online AE plain state_dict (slam_backend.py:891-897 save format).
    sd_on = {}
    for name, (o, i) in {"encoder.0": (24, 32), "encoder.2": (15, 24),
                         "decoder.0": (24, 15), "decoder.2": (32, 24)}.items():
        sd_on[name + ".weight"] = torch.randn(o, i)
        sd_on[name + ".bias"] = torch.randn(o)
    torch.save(sd_on, art / "online_encoder.pth")

    # A foreign pickle the tool must skip without dying.
    torch.save({"random": torch.zeros(3)}, art / "unrelated.pt")
    return art


def test_verify_artifacts_end_to_end(tmp_path):
    art = _build_artifact_dir(tmp_path)
    out = tmp_path / "converted"
    r = subprocess.run(
        [sys.executable, "tools/verify_artifacts.py",
         "--dir", str(art), "--out", str(out)],
        cwd=str(REPO), capture_output=True, text=True, timeout=1800,
    )
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0
    for kind in ("sed", "hr", "ae", "online_ae"):
        assert f"  {kind:<10} <-" in r.stdout, f"{kind} not discovered"
    for npz in ("clip_visual.npz", "clip_text.npz", "hr_net.npz",
                "autoencoder.npz", "online_ae.npz"):
        assert (out / npz).exists(), npz
    assert "visual parity OK" in r.stdout
    assert "text parity OK" in r.stdout
    assert "HR parity OK" in r.stdout
    assert "AE parity OK" in r.stdout
    assert "online-AE parity OK" in r.stdout
    assert "ALL OK" in r.stdout
