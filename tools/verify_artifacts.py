#!/usr/bin/env python
"""Turnkey real-artifact verification: convert -> parity -> bench.

The day real reference checkpoints appear (`seg_clip_model_l.pth` from
create_lang_model.py:90-103, the HR / autoencoder Lightning ckpts from
load_lang_model.py:66-89 and slam_backend.py:117-152), this ONE command
takes them from torch pickles to verified, benchable Flax weights:

    python tools/verify_artifacts.py --dir /path/to/artifacts \
        [--out /path/to/converted] [--bench] [--skip-parity]

1. **Discover**: probes every .pth/.ckpt/.pt in --dir by state_dict key
   signature (not filename), classifying each as SED/CLIP, HR net,
   offline AE, online AE, or LPIPS.
2. **Convert**: runs the tools/convert_weights.py mappings, writing one
   .npz tree per model into --out.
3. **Parity**: runs each REAL state_dict through the independent torch
   oracles (tests/test_language_models.py) and asserts the converted
   Flax forward matches — the same gate tests/test_weight_port.py pins
   on synthetic real-layout checkpoints, now on the real artifact.
4. **Bench** (--bench): re-runs `python bench.py` with
   OLS_WEIGHTS_DIR=<out> so the headline FPS number is measured on the
   real weights.

Exit code 0 = everything discovered converts and passes parity.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "tests"))

CLIP_PREFIXES = ("sem_seg_head.predictor.clip_model.", "")


def _unwrap(obj):
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def classify(sd: dict) -> str | None:
    """Classify a torch state_dict by key signature."""
    keys = set(sd)
    for pref in CLIP_PREFIXES:
        if pref + "visual.trunk.stem.0.weight" in keys:
            return "sed"
    plain = {k.removeprefix("model.") for k in keys}
    if "initial_conv.0.weight" in plain and "final_conv.weight" in plain:
        return "hr"
    if "encoder.0.weight" in plain and "decoder.0.weight" in plain:
        # Online AE: 2-Linear MLPs, no BatchNorm anywhere.
        has_bn = any(k.endswith("running_mean") for k in plain)
        return "ae" if has_bn else "online_ae"
    if "net.slice1.0.weight" in keys or "lin0.model.1.weight" in keys:
        return "lpips"
    return None


def discover(root: Path):
    import torch

    found: dict[str, Path] = {}
    for p in sorted(root.rglob("*")):
        if p.suffix not in (".pth", ".ckpt", ".pt") or not p.is_file():
            continue
        try:
            sd = _unwrap(torch.load(p, map_location="cpu",
                                    weights_only=False))
        except Exception as e:  # unreadable/foreign pickle: report, skip
            print(f"  skip {p.name}: {type(e).__name__}: {e}")
            continue
        if not isinstance(sd, dict):
            continue
        kind = classify(sd)
        if kind and kind not in found:
            found[kind] = p
            print(f"  {kind:<10} <- {p}")
    return found


def _infer_convnext_arch(sub: dict):
    """(depths, dims, embed) from the real checkpoint's own keys."""
    dims, depths = [], []
    for s in range(4):
        d = 0
        while f"visual.trunk.stages.{s}.blocks.{d}.conv_dw.weight" in sub:
            d += 1
        depths.append(d)
        dims.append(sub[f"visual.trunk.stages.{s}.blocks.0.conv_dw.weight"].shape[0])
    embed = sub["visual.head.mlp.fc2.weight"].shape[0]
    return tuple(depths), tuple(dims), int(embed)


def _infer_text_arch(sub: dict):
    layers = 0
    while f"transformer.resblocks.{layers}.attn.in_proj_weight" in sub:
        layers += 1
    width = sub["token_embedding.weight"].shape[1]
    vocab = sub["token_embedding.weight"].shape[0]
    ctx = sub["positional_embedding"].shape[0]
    embed = sub["text_projection"].shape[1]
    heads = width // 64
    return layers, int(heads), int(width), int(embed), int(vocab), int(ctx)


def _infer_ae_dims(sd: dict):
    plain = {k.removeprefix("model."): v for k, v in sd.items()}
    enc, dec = [], []
    for idx in range(256):
        w = plain.get(f"encoder.{idx}.weight")
        if w is not None and w.ndim == 2:
            enc.append(int(w.shape[0]))
        w = plain.get(f"decoder.{idx}.weight")
        if w is not None and w.ndim == 2:
            dec.append(int(w.shape[0]))
    clip = int(plain["encoder.0.weight"].shape[1])
    return tuple(enc), tuple(dec), clip


def parity_sed(path: Path, out: Path) -> None:
    import torch

    from test_language_models import TestConvNeXt, TestTextTower
    from online_lang_splatting_tpu.models.checkpoints import load_npz_tree
    from online_lang_splatting_tpu.models.convnext_clip import (
        ConvNeXtCLIPVisual,
    )
    from online_lang_splatting_tpu.models.text_tower import TextTower
    import jax.numpy as jnp

    sd = _unwrap(torch.load(path, map_location="cpu", weights_only=False))
    pref = next(p for p in CLIP_PREFIXES
                if p + "visual.trunk.stem.0.weight" in sd)
    sub = {k.removeprefix(pref): v for k, v in sd.items()
           if k.startswith(pref)}

    depths, dims, embed = _infer_convnext_arch(sub)
    vis = TestConvNeXt()
    vis.DEPTHS, vis.DIMS, vis.EMBED = depths, dims, embed
    g = np.random.default_rng(0)
    x = g.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = vis._torch_forward(sub, torch.from_numpy(x))
    # Reference-exact modes regardless of the OLS_GELU/OLS_STEM perf knobs.
    model = ConvNeXtCLIPVisual(depths=depths, dims=dims, embed_dim=embed,
                               stem_mode="conv", gelu_mode="erf")
    got = model.apply({"params": load_npz_tree(out / "clip_visual.npz")},
                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    for key in ["stem", "res2", "res3", "res4", "res5", "clip_vis_dense"]:
        r = ref[key].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(got[key]), r, atol=5e-4, rtol=1e-3,
            err_msg=f"visual parity failed at {key}")
    print(f"  visual parity OK (depths={depths}, dims={dims}, "
          f"embed={embed})")

    layers, heads, width, tembed, vocab, ctx = _infer_text_arch(sub)
    txt = TestTextTower()
    txt.LAYERS, txt.HEADS, txt.WIDTH = layers, heads, width
    txt.EMBED, txt.VOCAB, txt.CTX = tembed, vocab, ctx
    tokens = np.zeros((2, ctx), np.int64)
    tokens[0, :5] = [1, 100, min(2000, vocab - 2), min(30000, vocab - 2),
                     vocab - 1]
    tokens[1, :3] = [1, 400, vocab - 1]
    with torch.no_grad():
        ref_t = txt._torch_forward(sub, torch.from_numpy(tokens))
    tmodel = TextTower(vocab_size=vocab, context_length=ctx, width=width,
                       heads=heads, layers=layers, embed_dim=tembed)
    got_t = tmodel.apply(
        {"params": load_npz_tree(out / "clip_text.npz")},
        jnp.asarray(tokens.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got_t), ref_t.numpy(),
                               atol=2e-4, rtol=1e-3,
                               err_msg="text parity failed")
    print(f"  text parity OK (layers={layers}, width={width})")


def parity_hr(path: Path, out: Path) -> None:
    import torch

    from test_language_models import TestHRNet
    from online_lang_splatting_tpu.models.checkpoints import load_npz_tree
    from online_lang_splatting_tpu.models.hr_net import (
        HighResLanguageFeatureNet,
    )
    import jax.numpy as jnp

    sd = _unwrap(torch.load(path, map_location="cpu", weights_only=False))
    g = np.random.default_rng(1)
    fv = g.normal(size=(1, 768, 6, 6)).astype(np.float32)
    f3 = g.normal(size=(1, 384, 24, 24)).astype(np.float32)
    f2 = g.normal(size=(1, 192, 48, 48)).astype(np.float32)
    hr = TestHRNet()
    with torch.no_grad():
        ref = hr._torch_forward(sd, torch.from_numpy(fv),
                                torch.from_numpy(f3), torch.from_numpy(f2))
    got = HighResLanguageFeatureNet().apply(
        load_npz_tree(out / "hr_net.npz"),
        jnp.asarray(fv.transpose(0, 2, 3, 1)),
        jnp.asarray(f3.transpose(0, 2, 3, 1)),
        jnp.asarray(f2.transpose(0, 2, 3, 1)))
    ref_np = ref.numpy().transpose(0, 2, 3, 1)
    scale = np.abs(ref_np).max()
    np.testing.assert_allclose(np.asarray(got) / scale, ref_np / scale,
                               atol=5e-4, err_msg="HR parity failed")
    print("  HR parity OK")


def parity_ae(path: Path, out: Path) -> None:
    import torch

    from test_language_models import TestAutoencoder
    from online_lang_splatting_tpu.models.checkpoints import load_npz_tree
    from online_lang_splatting_tpu.models.autoencoder import AutoencoderMLP
    import jax.numpy as jnp

    sd = _unwrap(torch.load(path, map_location="cpu", weights_only=False))
    enc, dec, clip = _infer_ae_dims(sd)
    g = np.random.default_rng(2)
    x = g.normal(size=(32, clip)).astype(np.float32)
    ae = TestAutoencoder()
    with torch.no_grad():
        _z, ref = ae._torch_forward(sd, torch.from_numpy(x),
                                    enc=enc, dec=dec)
    got = AutoencoderMLP(encoder_dims=enc, decoder_dims=dec).apply(
        load_npz_tree(out / "autoencoder.npz"), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=2e-5, rtol=1e-4,
                               err_msg="AE parity failed")
    print(f"  AE parity OK (enc={enc}, dec={dec})")


def parity_online_ae(path: Path, out: Path) -> None:
    import torch

    from online_lang_splatting_tpu.models.checkpoints import load_npz_tree
    from online_lang_splatting_tpu.models.autoencoder import (
        EncoderDecoderOnline,
    )
    import jax.numpy as jnp

    sd = _unwrap(torch.load(path, map_location="cpu", weights_only=False))
    in_dim = int(sd["encoder.0.weight"].shape[1])
    g = np.random.default_rng(3)
    x = torch.from_numpy(g.normal(size=(16, in_dim)).astype(np.float32))
    # Reference EncoderDecoderOnline.encode (autoencoder/model.py:314-367):
    # Linear/ReLU/Linear + L2 normalize.
    with torch.no_grad():
        z = torch.relu(x @ sd["encoder.0.weight"].T + sd["encoder.0.bias"])
        z = z @ sd["encoder.2.weight"].T + sd["encoder.2.bias"]
        z = torch.nn.functional.normalize(z, dim=-1)
    got = EncoderDecoderOnline(
        input_dim=in_dim, hidden=int(sd["encoder.0.weight"].shape[0]),
        compressed_dim=int(sd["encoder.2.weight"].shape[0]),
    ).apply(load_npz_tree(out / "online_ae.npz"), jnp.asarray(x.numpy()),
            method="encode")
    np.testing.assert_allclose(np.asarray(got), z.numpy(), atol=2e-5,
                               rtol=1e-4, err_msg="online-AE parity failed")
    print("  online-AE parity OK")


PARITY = {"sed": parity_sed, "hr": parity_hr, "ae": parity_ae,
          "online_ae": parity_online_ae}
CONVERT_FLAG = {"sed": "--sed", "hr": "--hr", "ae": "--ae",
                "online_ae": "--online-ae", "lpips": "--lpips"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True,
                    help="directory holding the real torch artifacts")
    ap.add_argument("--out", default=None,
                    help="output dir for converted .npz (default "
                         "<dir>/converted)")
    ap.add_argument("--bench", action="store_true",
                    help="run bench.py on the converted weights (TPU)")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    # Parity oracles run on CPU; bench (subprocess) gets the TPU.
    import jax

    jax.config.update("jax_platforms", "cpu")

    root = Path(args.dir)
    out = Path(args.out or root / "converted")
    out.mkdir(parents=True, exist_ok=True)

    print(f"[1/3] discovering artifacts under {root}")
    found = discover(root)
    if not found:
        print("no recognizable artifacts found")
        return 1

    print("[2/3] converting")
    cmd = [sys.executable, str(REPO / "tools/convert_weights.py"),
           "--out", str(out)]
    for kind, p in found.items():
        cmd += [CONVERT_FLAG[kind], str(p)]
    subprocess.run(cmd, check=True, cwd=str(REPO))

    if not args.skip_parity:
        print("[3/3] torch-oracle parity")
        for kind, p in found.items():
            fn = PARITY.get(kind)
            if fn:
                fn(p, out)
    else:
        print("[3/3] parity skipped (--skip-parity)")

    if args.bench:
        print(f"benchmarking with OLS_WEIGHTS_DIR={out}")
        env = dict(os.environ, OLS_WEIGHTS_DIR=str(out))
        r = subprocess.run([sys.executable, str(REPO / "bench.py")],
                           cwd=str(REPO), env=env,
                           capture_output=True, text=True)
        print(r.stdout.strip())
        if r.returncode != 0:
            print(r.stderr[-2000:])
            return r.returncode
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if line:
            rec = json.loads(line[-1])
            rec["weights"] = "real"
            (out / "bench_real_weights.json").write_text(json.dumps(rec))
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
