"""Convert the torch ``lpips`` package's AlexNet checkpoint to the dnsjax npz
schema (see dnsjax/eval/render_metrics.py).

Run wherever the ``lpips`` + ``torchvision`` packages and their pretrained
weights are available (this build environment has no egress):

    python scripts/export_lpips.py /path/out/lpips_alex.npz

Then point DNSJAX_LPIPS_NPZ at the output to enable the metric in eval_2d
(reference metric: /root/reference/eval_2d.py:94-96, 304-305).
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips as lpips_pkg  # type: ignore

    model = lpips_pkg.LPIPS(net="alex")
    alex = model.net  # torchvision alexnet features wrapper (slice1..slice5)
    convs = [m for m in alex.modules() if m.__class__.__name__ == "Conv2d"]
    assert len(convs) == 5, f"expected 5 convs, got {len(convs)}"
    out = {}
    for i, c in enumerate(convs):
        out[f"conv{i}_w"] = c.weight.detach().numpy().astype(np.float32)
        out[f"conv{i}_b"] = c.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}_w"] = w.reshape(-1).astype(np.float32)
    out["shift"] = model.scaling_layer.shift.detach().numpy().reshape(3)
    out["scale"] = model.scaling_layer.scale.detach().numpy().reshape(3)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")
