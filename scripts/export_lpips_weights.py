"""Export LPIPS (AlexNet) weights to the pickle format eval expects.

Run this ONCE on any machine with torchvision + lpips installed (this
environment has neither and no egress):

    pip install torch torchvision lpips
    python scripts/export_lpips_weights.py --out lpips_alex.pkl

then point the eval harness at the file:

    SEGS_LPIPS_WEIGHTS=lpips_alex.pkl python -m segs_slam_tpu.eval.harness ...

Format (consumed by segs_slam_tpu/eval/lpips_jax.make_lpips; reference
architecture: lpipsPyTorch/modules/networks.py AlexNet + LinLayers):
  conv{1..5}_w / conv{1..5}_b : torchvision alexnet.features conv weights
  lin{0..4}                   : per-channel LPIPS head weights (C,)
  shift, scale                : ImageNet normalization constants
"""

import argparse
import pickle


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="lpips_alex.pkl")
    args = p.parse_args()

    import numpy as np
    import torch
    import torchvision
    import lpips as lpips_pkg

    alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
    # conv layers sit at indices 0, 3, 6, 8, 10 of alexnet.features
    conv_idx = [0, 3, 6, 8, 10]
    params = {}
    for i, ci in enumerate(conv_idx, start=1):
        params[f"conv{i}_w"] = alex[ci].weight.detach().numpy()
        params[f"conv{i}_b"] = alex[ci].bias.detach().numpy()

    net = lpips_pkg.LPIPS(net="alex")
    for i in range(5):
        lin = getattr(net, f"lin{i}")
        # 1x1 conv weight (1, C, 1, 1) -> per-channel vector (C,)
        params[f"lin{i}"] = (
            lin.model[-1].weight.detach().numpy().reshape(-1)
        )
    # scaling_layer constants (lpips.ScalingLayer): shift/scale on [-1,1] input
    params["shift"] = net.scaling_layer.shift.detach().numpy().reshape(-1)
    params["scale"] = net.scaling_layer.scale.detach().numpy().reshape(-1)

    with open(args.out, "wb") as f:
        pickle.dump({k: np.asarray(v, np.float32) for k, v in params.items()},
                    f)
    print(f"wrote {args.out}: " +
          ", ".join(f"{k}{tuple(v.shape)}" for k, v in params.items()))


if __name__ == "__main__":
    main()
