"""Frozen 2D image encoder: ResNet-18 first conv stage.

The reference uses only conv1(7x7, stride 2, 3->64) + BN + ReLU of an
ImageNet-pretrained ResNet-18 — all deeper layers are commented out
(reference: models/layers.py:52-114, models/encoder.py:4-17) — and never
trains it. dnsjax mirrors that stage in NHWC with a frozen-BN fold.

Pretrained ImageNet conv1 weights cannot be downloaded in this environment
(zero egress). The default filter bank is therefore PROCEDURAL: oriented
Gabor pairs + color-opponent center-surround blobs — the structure ImageNet
conv1 filters famously converge to (Krizhevsky et al. 2012 fig. 3) —
deterministic and training-free. ``mode="random"`` keeps the round-1 seeded
He-normal draw for A/B (scripts/ab_quality.py gates the default). If
``DNSJAX_RESNET18_NPZ`` points to an .npz with ``conv1_weight (64,3,7,7),
bn1_{weight,bias,running_mean,running_var}`` (PyTorch layout — see
scripts/export_resnet18.py), the real pretrained stage is folded in instead.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


def _gabor_bank() -> np.ndarray:
    """(7,7,3,64) HWIO: 48 oriented even/odd Gabors (8 orientations x 3
    scales x 2 phases, grayscale) + 16 color-opponent center-surround blobs
    (R-G and B-Y at 2 scales, both signs, 4 offsets). Zero-mean, He-scaled."""
    y, x = np.mgrid[-3:4, -3:4].astype(np.float64)
    filters = []
    for wavelength, sigma in ((3.5, 1.6), (5.0, 2.2), (8.0, 3.0)):
        for k in range(8):
            th = np.pi * k / 8
            xr = x * np.cos(th) + y * np.sin(th)
            yr = -x * np.sin(th) + y * np.cos(th)
            env = np.exp(-(xr**2 + (0.8 * yr) ** 2) / (2 * sigma**2))
            for phase in (0.0, np.pi / 2):
                g = env * np.cos(2 * np.pi * xr / wavelength + phase)
                g -= g.mean()
                filters.append(np.repeat(g[:, :, None], 3, axis=2) / np.sqrt(3))
    # center-surround blobs: color-opponent + luminance DoGs at several scales
    def dog(sigma_c):
        center = np.exp(-(x**2 + y**2) / (2 * sigma_c**2))
        surround = np.exp(-(x**2 + y**2) / (2 * (2.2 * sigma_c) ** 2))
        return center / center.sum() - surround / surround.sum()

    opponents = (
        (1.0, -1.0, 0.0),                # R-G
        (-0.5, -0.5, 1.0),               # B-Y
        (0.577, 0.577, 0.577),           # luminance
    )
    for sigma_c in (1.0, 2.0):
        for opp in opponents:
            for sign in (1.0, -1.0):
                filters.append(sign * dog(sigma_c)[:, :, None]
                               * np.asarray(opp)[None, None, :])
    for sigma_c, sign in ((0.7, 1.0), (0.7, -1.0), (3.0, 1.0), (3.0, -1.0)):
        filters.append(sign * dog(sigma_c)[:, :, None]
                       * np.full(3, 0.577)[None, None, :])
    w = np.stack(filters, axis=-1)  # (7,7,3,64)
    assert w.shape[-1] == 64
    w /= np.sqrt((w**2).sum(axis=(0, 1, 2), keepdims=True)) + 1e-12
    # match the He-normal norm (sqrt(2)) the learned Merge MLP was tuned to
    return (w * np.sqrt(2.0)).astype(np.float32)


def init_encoder_params(seed: int = 0, mode: str = "gabor") -> Dict[str, jnp.ndarray]:
    """Returns {"w": (7,7,3,64) HWIO kernel, "scale": (64,), "bias": (64,)}.

    BN is folded: y = relu(conv(x) * scale + bias). ``mode``: "gabor"
    (default, procedural bank) or "random" (seeded He-normal)."""
    npz_path = os.environ.get("DNSJAX_RESNET18_NPZ", "")
    if npz_path and os.path.exists(npz_path):
        z = np.load(npz_path)
        w = np.transpose(z["conv1_weight"], (2, 3, 1, 0)).astype(np.float32)
        gamma = z["bn1_weight"].astype(np.float32)
        beta = z["bn1_bias"].astype(np.float32)
        mean = z["bn1_running_mean"].astype(np.float32)
        var = z["bn1_running_var"].astype(np.float32)
        scale = gamma / np.sqrt(var + 1e-5)
        bias = beta - mean * scale
    elif mode == "gabor":
        w = _gabor_bank()
        scale = np.ones(64, np.float32)
        bias = np.zeros(64, np.float32)
    else:
        key = jax.random.PRNGKey(seed)
        fan_in = 7 * 7 * 3
        w = np.asarray(
            jax.random.normal(key, (7, 7, 3, 64), jnp.float32)
            * np.sqrt(2.0 / fan_in)
        )
        scale = np.ones(64, np.float32)
        bias = np.zeros(64, np.float32)
    return {
        "w": jnp.asarray(w),
        "scale": jnp.asarray(scale),
        "bias": jnp.asarray(bias),
    }


def encode_images(
    params: Dict[str, jnp.ndarray], images: jnp.ndarray, compute_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """(..., H, W, 3) float images -> (..., ceil(H/2), ceil(W/2), 64).

    Conv 7x7 stride 2, SAME-3 padding, folded BN, ReLU — the reference's
    frozen feature extractor (reference: models/layers.py:95-99).
    """
    batch_shape = images.shape[:-3]
    H, W = images.shape[-3], images.shape[-2]
    x = images.reshape((-1, H, W, 3)).astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(compute_dtype),
        window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jax.nn.relu(y * params["scale"] + params["bias"])
    return y.reshape(batch_shape + y.shape[1:]).astype(jnp.float32)
