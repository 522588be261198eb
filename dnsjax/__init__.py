"""dnsjax — TPU-native dense neural semantic SLAM.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of DNS-SLAM
(reference: li-kunyi/dns-slam, IROS 2024): real-time RGB-D camera tracking
against a learned neural map, incremental mapping (multi-resolution hash grid
+ coarse MLP + per-semantic-class fine MLPs + 2D image-feature conditioning),
keyframe-windowed bundle adjustment, semantic/colored mesh extraction, and a
full evaluation suite (ATE, PSNR/SSIM, mIoU, mesh accuracy/completion).

Unlike the reference (PyTorch + tiny-cuda-nn, two OS processes sharing CUDA
memory), dnsjax is a single-process functional design: the map is a pytree of
parameters, tracking and mapping are jit-compiled pure functions, and the
tracker/mapper interleave deterministically on one device (or shard across a
`jax.sharding.Mesh`).
"""

__version__ = "0.1.0"

from dnsjax.config import load_config  # noqa: F401
