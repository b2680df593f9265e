"""LPIPS perceptual distance — AlexNet variant, pure JAX.

Port of the metric the reference computes with torchmetrics'
LearnedPerceptualImagePatchSimilarity (net_type="alex")
(/root/reference/utils/eval_utils.py:39,186-189):

  d(x,y) = Σ_l  mean_hw  w_l · ‖ f̂_l(x) − f̂_l(y) ‖²

with f_l the post-ReLU activations of the 5 AlexNet conv stages,
channel-unit-normalized (f̂), and w_l ≥ 0 the LPIPS learned 1×1 "lin"
weights. Inputs are RGB in [0,1]; the standard LPIPS scaling layer
(shift/scale on [-1,1] inputs) is applied internally.

Weights: convert a torch checkpoint (the `lpips` package's state_dict
layout `net.sliceK.i.weight` + `linK.model.1.weight`, or torchvision
`features.i.weight` + LPIPS `linK`) with
`tools/convert_weights.py --lpips`, then `load_params(npz)`. Parity is
tested against a torch re-implementation in tests/test_lpips.py.

When no pretrained weights exist (this environment has no network
access), `evaluation.eval_rendering` falls back to the documented
substitute `1 − MS-SSIM` and labels the metric accordingly — see
`online_lang_splatting_tpu/slam/evaluation.py`.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision AlexNet `features` conv layout: (out, in, kh, kw), stride, pad.
_CONVS = (
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
)
# MaxPool(3, stride 2) sits before convs 1 and 2 and after conv 4; LPIPS
# taps the activations AFTER each ReLU (lpips/pretrained_networks.py).
_POOL_BEFORE = (False, True, True, False, False)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_params(rng: np.random.Generator | None = None) -> Dict:
    """Random-initialized parameter pytree (for tests / converters)."""
    rng = rng or np.random.default_rng(0)
    convs = []
    for (o, i, k, _s, _p) in _CONVS:
        w = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05
        b = rng.normal(size=(o,)).astype(np.float32) * 0.05
        convs.append((jnp.asarray(w), jnp.asarray(b)))
    lins = [
        jnp.asarray(np.abs(rng.normal(size=(1, o, 1, 1))).astype(np.float32))
        for (o, *_rest) in _CONVS
    ]
    return {"convs": convs, "lins": lins}


def params_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Build the parameter pytree from a torch state_dict.

    Accepts the `lpips` package layout (`net.slice{1..5}.{i}.weight`,
    `lin{0..4}.model.1.weight`) or a flat torchvision layout
    (`features.{i}.weight` + `lin{k}.weight`)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    feature_idx = (0, 3, 6, 8, 10)  # conv positions in features/slices

    def find(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names)

    # slice module index of each conv within the lpips slices:
    # slice1: [0]=conv0 ; slice2: [2]=pool,[3]=conv1 ... lpips registers the
    # ORIGINAL feature indices as submodule names, so net.slice1.0,
    # net.slice2.3, net.slice3.6, net.slice4.8, net.slice5.10.
    convs = []
    for k, fi in enumerate(feature_idx):
        w = find(
            f"net.slice{k + 1}.{fi}.weight", f"features.{fi}.weight",
        )
        b = find(
            f"net.slice{k + 1}.{fi}.bias", f"features.{fi}.bias",
        )
        convs.append((jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32)))
    lins = []
    for k in range(5):
        w = find(
            f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight",
            f"lin{k}.weight",
        )
        lins.append(jnp.asarray(w, jnp.float32))
    return {"convs": convs, "lins": lins}


def load_params(npz_path: str) -> Dict:
    data = np.load(npz_path)
    return params_from_state_dict({k: data[k] for k in data.files})


def _max_pool_3x3s2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 2, 2),
        padding="VALID",
    )


def _alexnet_feats(params: Dict, x: jax.Array) -> List[jax.Array]:
    """x: (N,3,H,W) in scaled space → 5 post-ReLU feature maps."""
    feats = []
    for (w, b), (_o, _i, _k, s, p), pool in zip(
        params["convs"], _CONVS, _POOL_BEFORE
    ):
        if pool:
            x = _max_pool_3x3s2(x)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(s, s),
            padding=((p, p), (p, p)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b[None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
    return x / (norm + eps)


def lpips(params: Dict, img0: jax.Array, img1: jax.Array) -> jax.Array:
    """LPIPS distance between img0/img1: (3,H,W) or (N,3,H,W) RGB in [0,1]."""
    if img0.ndim == 3:
        img0, img1 = img0[None], img1[None]
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def prep(x):
        return (2.0 * x - 1.0 - shift) / scale

    f0 = _alexnet_feats(params, prep(img0))
    f1 = _alexnet_feats(params, prep(img1))
    total = 0.0
    for a, b, w in zip(f0, f1, params["lins"]):
        diff = jnp.square(_unit_normalize(a) - _unit_normalize(b))
        # 1x1 non-negative "lin" conv == channel-weighted sum; w (1,C,1,1).
        val = jnp.sum(diff * w, axis=1)
        total = total + jnp.mean(val, axis=(1, 2))
    return total[0] if total.shape == (1,) else total


def make_lpips_fn(params: Dict):
    return jax.jit(functools.partial(lpips, params))
