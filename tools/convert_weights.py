#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to Flax parameter trees (.npz).

Inputs (any subset):
  --sed <seg_clip_model_l.pth>        whole-module pickle from
                                      create_lang_model.py (SED meta-arch);
                                      or an open_clip state_dict checkpoint.
  --hr <hr_ckpt.ckpt>                 LangSupervisedNet Lightning ckpt.
  --ae <autoencoder .ckpt>            AutoencoderLight Lightning ckpt.
  --online-ae <online .pth>           EncoderDecoderOnline state_dict.
  --out <dir>                         output directory for npz trees.

The converter runs on CPU torch (no CUDA needed) and writes one .npz per
model with flattened "a/b/c" keys matching the Flax module trees in
online_lang_splatting_tpu.models. Use models.checkpoints.load_npz_tree to
load them back.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _save_tree(path, tree: dict):
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", tree)
    np.savez(path, **flat)
    print(f"wrote {path} ({len(flat)} arrays)")


def _t(x):  # torch tensor -> numpy
    return x.detach().cpu().numpy()


# --- ConvNeXt CLIP visual tower -------------------------------------------


def convert_visual(sd: dict, depths=(3, 3, 27, 3)) -> dict:
    """Map open_clip 'visual.trunk.*' / 'visual.head.*' weights to
    ConvNeXtCLIPVisual param names."""

    def conv(w):  # torch OIHW -> flax HWIO
        return np.transpose(_t(w), (2, 3, 1, 0))

    def dwconv(w):  # torch (C,1,kh,kw) -> flax HWIO with groups=C: (kh,kw,1,C)
        return np.transpose(_t(w), (2, 3, 1, 0))

    p = {}
    pre = "visual.trunk."
    p["stem_conv"] = {"kernel": conv(sd[pre + "stem.0.weight"]),
                      "bias": _t(sd[pre + "stem.0.bias"])}
    p["stem_norm"] = {"scale": _t(sd[pre + "stem.1.weight"]),
                      "bias": _t(sd[pre + "stem.1.bias"])}
    for s in range(4):
        stage = {}
        if s > 0:
            stage["ds_norm"] = {
                "scale": _t(sd[pre + f"stages.{s}.downsample.0.weight"]),
                "bias": _t(sd[pre + f"stages.{s}.downsample.0.bias"]),
            }
            stage["ds_conv"] = {
                "kernel": conv(sd[pre + f"stages.{s}.downsample.1.weight"]),
                "bias": _t(sd[pre + f"stages.{s}.downsample.1.bias"]),
            }
        # Blocks are executed via nn.scan: stack each parameter along a
        # leading depth axis.
        per_block = []
        for b in range(depths[s]):
            bp = pre + f"stages.{s}.blocks.{b}."
            per_block.append({
                "dwconv": {"kernel": dwconv(sd[bp + "conv_dw.weight"]),
                           "bias": _t(sd[bp + "conv_dw.bias"])},
                "norm": {"scale": _t(sd[bp + "norm.weight"]),
                         "bias": _t(sd[bp + "norm.bias"])},
                "mlp_fc1": {"kernel": _t(sd[bp + "mlp.fc1.weight"]).T,
                            "bias": _t(sd[bp + "mlp.fc1.bias"])},
                "mlp_fc2": {"kernel": _t(sd[bp + "mlp.fc2.weight"]).T,
                            "bias": _t(sd[bp + "mlp.fc2.bias"])},
                "gamma": _t(sd[bp + "gamma"]),
            })

        def stack(paths):
            def rec(nodes):
                if isinstance(nodes[0], dict):
                    return {k: rec([n[k] for n in nodes]) for k in nodes[0]}
                return np.stack(nodes, axis=0)

            return rec(paths)

        stage["blocks"] = {"block": stack(per_block)}
        p[f"stage{s}"] = stage
    # trunk head norm (timm NormMlpClassifierHead norm) + open_clip mlp head
    p["head_norm"] = {"scale": _t(sd[pre + "head.norm.weight"]),
                      "bias": _t(sd[pre + "head.norm.bias"])}
    p["head_fc1"] = {"kernel": _t(sd["visual.head.mlp.fc1.weight"]).T,
                     "bias": _t(sd["visual.head.mlp.fc1.bias"])}
    p["head_fc2"] = {"kernel": _t(sd["visual.head.mlp.fc2.weight"]).T}
    return p


# --- CLIP text tower -------------------------------------------------------


def convert_text(sd: dict, layers=16, heads=12, width=768) -> dict:
    p = {
        "token_embedding": _t(sd["token_embedding.weight"]),
        "positional_embedding": _t(sd["positional_embedding"]),
        "text_projection": _t(sd["text_projection"]),
        "ln_final": {"scale": _t(sd["ln_final.weight"]),
                     "bias": _t(sd["ln_final.bias"])},
    }
    head_dim = width // heads
    for i in range(layers):
        b = f"transformer.resblocks.{i}."
        wqkv = _t(sd[b + "attn.in_proj_weight"])  # (3W, W)
        bqkv = _t(sd[b + "attn.in_proj_bias"])
        wq, wk, wv = np.split(wqkv, 3, axis=0)
        bq, bk, bv = np.split(bqkv, 3, axis=0)

        def qkv(w, bias):
            # flax SelfAttention: kernel (W, heads, head_dim)
            return {
                "kernel": w.T.reshape(width, heads, head_dim),
                "bias": bias.reshape(heads, head_dim),
            }

        out_w = _t(sd[b + "attn.out_proj.weight"])  # (W, W): y = W x
        p[f"resblock{i}"] = {
            "ln_1": {"scale": _t(sd[b + "ln_1.weight"]), "bias": _t(sd[b + "ln_1.bias"])},
            "ln_2": {"scale": _t(sd[b + "ln_2.weight"]), "bias": _t(sd[b + "ln_2.bias"])},
            "attn": {
                "query": qkv(wq, bq),
                "key": qkv(wk, bk),
                "value": qkv(wv, bv),
                "out": {
                    "kernel": out_w.T.reshape(heads, head_dim, width),
                    "bias": _t(sd[b + "attn.out_proj.bias"]),
                },
            },
            "mlp_c_fc": {"kernel": _t(sd[b + "mlp.c_fc.weight"]).T,
                         "bias": _t(sd[b + "mlp.c_fc.bias"])},
            "mlp_c_proj": {"kernel": _t(sd[b + "mlp.c_proj.weight"]).T,
                           "bias": _t(sd[b + "mlp.c_proj.bias"])},
        }
    return p


# --- HR net ----------------------------------------------------------------


def _convbnrelu(sd, conv_key, bn_key, transpose=False):
    w = _t(sd[conv_key + ".weight"])
    if transpose:
        # torch ConvTranspose2d weight (in, out, kh, kw) -> flax
        # ConvTranspose(transpose_kernel=True) expects (kh, kw, out, in).
        kernel = np.transpose(w, (2, 3, 1, 0))
    else:
        kernel = np.transpose(w, (2, 3, 1, 0))
    return (
        {"conv": {"kernel": kernel, "bias": _t(sd[conv_key + ".bias"])},
         "bn": {"scale": _t(sd[bn_key + ".weight"]), "bias": _t(sd[bn_key + ".bias"])}},
        {"bn": {"mean": _t(sd[bn_key + ".running_mean"]),
                "var": _t(sd[bn_key + ".running_var"])}},
    )


def convert_hr(sd: dict) -> dict:
    """Map HighResLanguageFeatureNet torch weights (keys 'model.*' in the
    Lightning ckpt) to the Flax tree. Returns {'params':..., 'batch_stats':...}."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    params, stats = {}, {}

    def put(name, p_s):
        params[name], stats[name] = p_s

    put("initial", _convbnrelu(sd, "initial_conv.0", "initial_conv.1"))
    put("up1", _convbnrelu(sd, "upsample1.0", "upsample1.1", transpose=True))
    put("up2", _convbnrelu(sd, "upsample2.0", "upsample2.1", transpose=True))
    put("up3", _convbnrelu(sd, "upsample3.0", "upsample3.1", transpose=True))
    for i, ch in ((1, None), (2, None)):
        base = f"attention_fusion{i}."
        fuse_p, fuse_s = {}, {}
        fuse_p["align"] = {
            "kernel": np.transpose(_t(sd[base + "low_res_align.weight"]), (2, 3, 1, 0)),
            "bias": _t(sd[base + "low_res_align.bias"]),
        }
        p, s = _convbnrelu(sd, base + "fusion.0", base + "fusion.1")
        fuse_p["fusion"], fuse_s["fusion"] = p, s
        p, s = _convbnrelu(sd, base + "attention.0", base + "attention.1")
        fuse_p["attn_conv"], fuse_s["attn_conv"] = p, s
        fuse_p["attn_proj"] = {
            "kernel": np.transpose(_t(sd[base + "attention.3.weight"]), (2, 3, 1, 0)),
            "bias": _t(sd[base + "attention.3.bias"]),
        }
        params[f"fuse{i}"], stats[f"fuse{i}"] = fuse_p, fuse_s
    params["final"] = {
        "kernel": np.transpose(_t(sd["final_conv.weight"]), (2, 3, 1, 0)),
        "bias": _t(sd["final_conv.bias"]),
    }
    return {"params": params, "batch_stats": stats}


# --- Autoencoders ----------------------------------------------------------


def convert_ae(sd: dict) -> dict:
    """AutoencoderMLP (Lightning 'model.encoder.N.*' flat ModuleList)."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    # encoder ModuleList indices: 0=Linear, then per layer (BN, ReLU, Linear).
    enc_p, enc_s = {}, {}
    li = 0
    for idx in range(128):
        if f"encoder.{idx}.running_mean" in sd:  # BatchNorm1d (precedes fc li)
            enc_p[f"bn{li}"] = {"scale": _t(sd[f"encoder.{idx}.weight"]),
                                "bias": _t(sd[f"encoder.{idx}.bias"])}
            enc_s[f"bn{li}"] = {"mean": _t(sd[f"encoder.{idx}.running_mean"]),
                                "var": _t(sd[f"encoder.{idx}.running_var"])}
        elif f"encoder.{idx}.weight" in sd:  # Linear
            enc_p[f"fc{li}"] = {"kernel": _t(sd[f"encoder.{idx}.weight"]).T,
                                "bias": _t(sd[f"encoder.{idx}.bias"])}
            li += 1

    dec_p = {}
    li = 0
    for idx in range(128):
        if f"decoder.{idx}.weight" in sd:
            dec_p[f"fc{li}"] = {"kernel": _t(sd[f"decoder.{idx}.weight"]).T,
                                "bias": _t(sd[f"decoder.{idx}.bias"])}
            li += 1
    return {
        "params": {"encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"encoder": enc_s},
    }


def convert_online_ae(sd: dict) -> dict:
    def lin(k):
        return {"kernel": _t(sd[k + ".weight"]).T, "bias": _t(sd[k + ".bias"])}

    return {"params": {
        "enc1": lin("encoder.0"), "enc2": lin("encoder.2"),
        "dec1": lin("decoder.0"), "dec2": lin("decoder.2"),
    }}


def convert_lpips(sd: dict) -> dict:
    """Flatten a torch LPIPS(alex) state_dict (the `lpips` package layout:
    net.slice{1..5}.{i}.{weight,bias} + lin{0..4}.model.1.weight) to the
    raw-key npz consumed by eval/lpips.py:load_params."""
    return {k: _t(v) for k, v in sd.items() if k.endswith(("weight", "bias"))}


def main():
    import torch

    ap = argparse.ArgumentParser()
    ap.add_argument("--sed")
    ap.add_argument("--hr")
    ap.add_argument("--ae")
    ap.add_argument("--online-ae")
    ap.add_argument("--lpips")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    def load_sd(path):
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        return obj

    if args.sed:
        sd = load_sd(args.sed)
        # SED pickle nests the CLIP model under the predictor.
        pref = next(
            (p for p in ["sem_seg_head.predictor.clip_model.", ""]
             if any(k.startswith(p + "visual.trunk.stem.0.weight") for k in sd)),
            None,
        )
        assert pref is not None, "could not locate CLIP weights in --sed"
        sub = {k.removeprefix(pref): v for k, v in sd.items() if k.startswith(pref)}
        _save_tree(os.path.join(args.out, "clip_visual.npz"), convert_visual(sub))
        _save_tree(os.path.join(args.out, "clip_text.npz"), convert_text(sub))
    if args.hr:
        _save_tree(os.path.join(args.out, "hr_net.npz"), convert_hr(load_sd(args.hr)))
    if args.ae:
        _save_tree(os.path.join(args.out, "autoencoder.npz"), convert_ae(load_sd(args.ae)))
    if args.online_ae:
        _save_tree(
            os.path.join(args.out, "online_ae.npz"),
            convert_online_ae(load_sd(args.online_ae)),
        )
    if args.lpips:
        # Flat keys (dots preserved) — read back by eval/lpips.py:load_params.
        np.savez(
            os.path.join(args.out, "lpips_alex.npz"),
            **convert_lpips(load_sd(args.lpips)),
        )


if __name__ == "__main__":
    sys.exit(main())
