"""Image losses: L1/L2, windowed SSIM, PSNR, Scharr gradients.

Numerics follow the reference losses
(/root/reference/gaussian_splatting/utils/loss_utils.py,
/root/reference/gaussian_splatting/utils/image_utils.py,
/root/reference/utils/slam_utils.py:4-38): 11x11 Gaussian window with
sigma 1.5 and zero padding for SSIM, Scharr 3x3 filters with reflect
padding for the gradient masks. Images are channel-first (C, H, W).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.abs(x - y).mean()


def l2_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.square(x - y).mean()


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-channel-mean PSNR over a (C, H, W) pair, averaged like the
    reference's `psnr(...).mean()` call sites."""
    mse = jnp.square(img1 - img2).reshape(img1.shape[0], -1).mean(axis=1)
    return (20 * jnp.log10(1.0 / jnp.sqrt(mse))).mean()


@functools.lru_cache(maxsize=8)
def _gaussian_window_np(window_size: int, sigma: float):
    # Cached as NUMPY: caching a jnp array here would capture a tracer
    # when first called inside a jit trace and leak it into later traces
    # (UnexpectedTracerError on the second jitted SSIM program).
    import numpy as np

    x = np.arange(window_size, dtype=np.float32)
    g = np.exp(-np.square(x - window_size // 2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)


def _gaussian_window(window_size: int, sigma: float):
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


def _depthwise_conv_same_zero(img: jax.Array, window: jax.Array) -> jax.Array:
    """(C, H, W) depthwise conv with zero 'same' padding (matches F.conv2d
    with padding=window//2 in the reference SSIM)."""
    c = img.shape[0]
    k = window.shape[0]
    lhs = img[None]  # (1, C, H, W)
    rhs = jnp.broadcast_to(window, (c, 1, k, k))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
    )
    return out[0]


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Mean SSIM over a (C, H, W) image pair."""
    window = _gaussian_window(window_size, 1.5)
    conv = functools.partial(_depthwise_conv_same_zero, window=window)
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def _ssim_and_cs(img1, img2, window):
    conv = functools.partial(_depthwise_conv_same_zero, window=window)
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(), cs_map.mean()


def ms_ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
            weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)) -> jax.Array:
    """Multi-scale SSIM (Wang et al. 2003) over a (C, H, W) pair.

    Used as the documented LPIPS substitute when no pretrained AlexNet
    weights are available (see eval/lpips.py). The scale count adapts to
    the image: scales where the downsampled side would drop below the
    window are dropped and the weights renormalized."""
    h, w = img1.shape[-2:]
    max_scales = 1
    while (
        max_scales < len(weights)
        and min(h, w) // (2 ** max_scales) >= window_size
    ):
        max_scales += 1
    ws = jnp.asarray(weights[:max_scales])
    ws = ws / ws.sum()
    window = _gaussian_window(window_size, 1.5)

    def down2(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID"
        ) / 4.0

    vals = []
    for s in range(max_scales):
        ssim_v, cs_v = _ssim_and_cs(img1, img2, window)
        vals.append(ssim_v if s == max_scales - 1 else cs_v)
        if s != max_scales - 1:
            img1, img2 = down2(img1), down2(img2)
    vals = jnp.clip(jnp.stack(vals), 1e-6, 1.0)
    return jnp.prod(vals ** ws)


_SCHARR_X = jnp.array(
    [[3.0, 10.0, 3.0], [0.0, 0.0, 0.0], [-3.0, -10.0, -3.0]], dtype=jnp.float32
)
_SCHARR_Y = jnp.array(
    [[3.0, 0.0, -3.0], [10.0, 0.0, -10.0], [3.0, 0.0, -3.0]], dtype=jnp.float32
)


def _depthwise_conv_reflect(img: jax.Array, kernel: jax.Array) -> jax.Array:
    c = img.shape[0]
    padded = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    rhs = jnp.broadcast_to(kernel, (c, 1, 3, 3))
    out = jax.lax.conv_general_dilated(
        padded[None], rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
    )
    return out[0]


def image_gradient(image: jax.Array):
    """Scharr vertical/horizontal gradients of a (C, H, W) image, with the
    reference's 1/32 normalizer (slam_utils.py:4-21). Returns (grad_v, grad_h)."""
    normalizer = 1.0 / 32.0
    grad_v = normalizer * _depthwise_conv_reflect(image, _SCHARR_X)
    grad_h = normalizer * _depthwise_conv_reflect(image, _SCHARR_Y)
    return grad_v, grad_h


def image_gradient_mask(image: jax.Array, eps: float = 0.01):
    """Valid-neighborhood masks: True where every pixel of the 3x3 reflect
    neighborhood has |value| > eps (slam_utils.py:24-38)."""
    c = image.shape[0]
    indicator = (jnp.abs(jnp.pad(image, ((0, 0), (1, 1), (1, 1)), mode="reflect")) > eps)
    ones = jnp.ones((c, 1, 3, 3), dtype=jnp.float32)
    out = jax.lax.conv_general_dilated(
        indicator[None].astype(jnp.float32), ones, window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )[0]
    mask = out == 9.0
    return mask, mask
