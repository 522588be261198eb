"""Export the ImageNet-pretrained ResNet-18 conv1 stage to the dnsjax npz
schema consumed by dnsjax/models/encoder.py (DNSJAX_RESNET18_NPZ).

Run wherever torchvision and its pretrained weights are available (this
build environment has no egress):

    python scripts/export_resnet18.py /path/out/resnet18_conv1.npz

Reference stage being replaced: /root/reference/models/layers.py:117-131
(conv1 + bn1 of torchvision resnet18, deeper layers commented out).
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import torchvision  # type: ignore

    net = torchvision.models.resnet18(weights="IMAGENET1K_V1")
    out = {
        "conv1_weight": net.conv1.weight.detach().numpy().astype(np.float32),
        "bn1_weight": net.bn1.weight.detach().numpy().astype(np.float32),
        "bn1_bias": net.bn1.bias.detach().numpy().astype(np.float32),
        "bn1_running_mean": net.bn1.running_mean.numpy().astype(np.float32),
        "bn1_running_var": net.bn1.running_var.numpy().astype(np.float32),
    }
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "resnet18_conv1.npz")
