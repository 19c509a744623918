#!/usr/bin/env python
"""Migrate reference PyTorch checkpoints into this framework.

Usage:
  python tools/convert_reference_checkpoint.py \
      --kind resnet18 --pth /path/best_model.pth --out /path/converted
  python tools/convert_reference_checkpoint.py --kind vgg16 ...
  python tools/convert_reference_checkpoint.py --kind lpips ...
  python tools/convert_reference_checkpoint.py --kind alexnet ...

Converts torchvision/lpips-convention state dicts (reference checkpoints are
torch.save dicts with `model_state_dict`, reference utils/helpers.py:85-103)
into orbax checkpoints loadable by this framework. Requires torch (cpu) to
read the .pth.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", required=True,
                   choices=["resnet18", "resnet34", "resnet50", "vgg16",
                            "lpips", "alexnet"])
    p.add_argument("--pth", required=True, help="Path to the torch .pth")
    p.add_argument("--out", required=True, help="Output orbax checkpoint dir")
    p.add_argument("--image_size", type=int, default=64,
                   help="Dummy init resolution")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from adam_dehaze_tpu.training import checkpoint as ckpt
    from adam_dehaze_tpu.training.checkpoint import (
        load_torch_alexnet,
        load_torch_lpips,
        load_torch_resnet,
        load_torch_vgg16,
    )

    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)

    if args.kind.startswith("resnet"):
        from adam_dehaze_tpu.nn import resnet
        ctor = getattr(resnet, args.kind)
        model = ctor()
        variables = model.init(key, dummy)
        stage_sizes = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
                       "resnet50": (3, 4, 6, 3)}[args.kind]
        params, stats = load_torch_resnet(
            args.pth, variables["params"], variables["batch_stats"],
            stage_sizes=stage_sizes, bottleneck=(args.kind == "resnet50"))
        tree = {"params": params, "batch_stats": stats}
    elif args.kind == "vgg16":
        from adam_dehaze_tpu.nn.vgg import VGG16Features
        net = VGG16Features()
        variables = net.init(key, dummy)
        tree = load_torch_vgg16(args.pth, variables)
    elif args.kind in ("lpips", "alexnet"):
        from adam_dehaze_tpu.losses.lpips import LPIPS
        net = LPIPS()
        variables = net.init(key, dummy, dummy)
        convert = load_torch_lpips if args.kind == "lpips" else load_torch_alexnet
        tree = convert(args.pth, variables)

    out_dir = os.path.dirname(os.path.abspath(args.out)) or "."
    name = os.path.basename(args.out)
    path = ckpt.save_checkpoint(out_dir, name, tree,
                                {"source": 0.0})
    print(f"Converted {args.kind} weights from {args.pth} -> {path}")


if __name__ == "__main__":
    main()
