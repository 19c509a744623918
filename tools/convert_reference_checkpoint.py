#!/usr/bin/env python
"""Migrate reference PyTorch checkpoints into this framework.

Usage:
  python tools/convert_reference_checkpoint.py \
      --kind resnet18 --pth /path/best_model.pth --out /path/converted
  python tools/convert_reference_checkpoint.py --kind vgg16|lpips|alexnet ...
  # The reference's actual trained artifacts:
  python tools/convert_reference_checkpoint.py --kind classifier \
      --pth classifier/best_model.pth --out converted/classifier
  python tools/convert_reference_checkpoint.py --kind branch --level medium \
      --pth dehazing/medium/best_model.pth --out converted/medium
  python tools/convert_reference_checkpoint.py --kind joint \
      --pth joint/best_model.pth --out converted/joint [--config cfg.yaml]

Converts torchvision/lpips-convention state dicts (reference checkpoints are
torch.save dicts with `model_state_dict`; the joint checkpoint holds 5 state
dicts, reference train_joint.py:272-283, utils/helpers.py:85-103) into orbax
checkpoints loadable by this framework. Requires torch (cpu) to read the .pth.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", required=True,
                   choices=["resnet18", "resnet34", "resnet50", "vgg16",
                            "lpips", "alexnet", "classifier", "branch",
                            "joint", "fcos"])
    p.add_argument("--pth", required=True, help="Path to the torch .pth")
    p.add_argument("--out", required=True, help="Output orbax checkpoint dir")
    p.add_argument("--image_size", type=int, default=64,
                   help="Dummy init resolution")
    p.add_argument("--config", default=None,
                   help="Config YAML for classifier/branch/joint kinds "
                        "(defaults to the packaged default.yaml)")
    p.add_argument("--level", default=None, choices=["low", "medium", "high"],
                   help="Branch level for --kind branch")
    args = p.parse_args(argv)

    import jax
    # Conversion is host-side (template init + transposes); never burn a
    # TPU compile on it. The axon sitecustomize ignores JAX_PLATFORMS env,
    # so force the platform through jax.config.
    jax.config.update("jax_platforms", "cpu")
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

    if args.kind in ("classifier", "branch", "joint"):
        from adam_dehaze_tpu.config import load_config
        from adam_dehaze_tpu.training.checkpoint import (
            branch_kind_for,
            load_torch_branch,
            load_torch_classifier,
            load_torch_joint,
        )
        config = load_config(args.config)
        if args.kind == "classifier":
            from adam_dehaze_tpu.models.classifier import create_classifier
            model = create_classifier(config)
            variables = model.init(key, dummy)
            params, stats = load_torch_classifier(
                args.pth, variables["params"], variables["batch_stats"],
                config["classifier"]["model"])
            tree = {"params": params, "batch_stats": stats}
        elif args.kind == "branch":
            if not args.level:
                p.error("--kind branch requires --level")
            from adam_dehaze_tpu.models import branches
            model = {
                "low": branches.create_low_intensity_model,
                "medium": branches.create_medium_intensity_model,
                "high": branches.create_high_intensity_model,
            }[args.level](config)
            variables = model.init(key, dummy)
            bkind = branch_kind_for(
                args.level, config["dehazing"][args.level]["model_type"])
            params, stats = load_torch_branch(
                args.pth, bkind, variables["params"], variables["batch_stats"])
            tree = {"params": params, "batch_stats": stats}
        else:  # joint
            from adam_dehaze_tpu.models.branches import create_branch_models
            from adam_dehaze_tpu.models.classifier import create_classifier
            from adam_dehaze_tpu.models.routing import create_router
            router = create_router(create_branch_models(config),
                                   create_classifier(config), config)
            variables = router.init(key, dummy)
            tree = load_torch_joint(args.pth, variables, config)
    elif args.kind.startswith("resnet"):
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
    elif args.kind == "fcos":
        # torchvision fcos_resnet50_fpn_coco .pth -> our tv-compat detector
        # (models/detection.py FCOSDetector(torchvision_compat=True)). Use
        # with detection.model: tv_fcos_resnet50_fpn and
        # detection.pretrained: <out path> in the config.
        from adam_dehaze_tpu.models.detection import FCOSDetector
        from adam_dehaze_tpu.training.checkpoint import load_torch_fcos
        module = FCOSDetector(num_classes=91,
                              backbone_name="tv_fcos_resnet50_fpn",
                              channels=256, torchvision_compat=True)
        size = max(args.image_size, 128)  # P7 needs >= 128 px
        variables = module.init(
            key, jnp.zeros((1, size, size, 3), jnp.float32))
        tree = load_torch_fcos(args.pth, variables)

    out_dir = os.path.dirname(os.path.abspath(args.out)) or "."
    name = os.path.basename(args.out)
    path = ckpt.save_checkpoint(out_dir, name, tree,
                                {"source": 0.0})
    print(f"Converted {args.kind} weights from {args.pth} -> {path}")


if __name__ == "__main__":
    main()
