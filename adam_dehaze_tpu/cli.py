"""Command-line interface.

Same surface as the reference driver (reference: main.py:29-222):
  python main.py --mode {preprocess, train_classifier, train_dehazing,
                         train_joint, train_all, evaluate, demo}
       [--config PATH] [--exp_name NAME] [--data_dir DIR] [--device DEV]
       [--resume] [--seed N] [--experiment_dir DIR]

Divergences (documented):
- `--resume` actually works (the reference defines but never reads it,
  main.py:50-51).
- `evaluate` takes `--experiment_dir` instead of a hardcoded dev path
  (reference: main.py:144).
- `demo` is implemented (the reference's demo is a TODO stub,
  main.py:210-215); it loads the pipeline, dehazes the test split (or
  --data_dir), and writes comparison grids.
- `serve` (new surface): batch inference over a directory of images
  through any serving engine (soft/hard/spill/stream/queued/device) with
  a routing manifest — the reference has no inference CLI.
- `export` (new surface): write a precompiled serving bundle
  (serving_export.py) so later `serve --precompiled auto` cold-starts
  load already-compiled executables instead of paying XLA compiles —
  the reference has no deployment/export story at all.
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

from adam_dehaze_tpu.config import (
    apply_cli_overrides,
    create_experiment_dir,
    load_config,
    update_checkpoint_paths,
)
from adam_dehaze_tpu.utils.helpers import seed_everything

MODES = ("preprocess", "train_classifier", "train_dehazing", "train_joint",
         "train_all", "train_detection", "evaluate", "demo", "serve",
         "export", "bench")

SERVE_MODES = ("soft", "hard", "spill", "spill_up", "stream", "queued",
               "device")


def parse_args(argv=None):
    """(reference: main.py:29-56)"""
    p = argparse.ArgumentParser(
        description="Adaptive Fog Intensity Dehazing Framework (TPU-native)")
    p.add_argument("--config", type=str, default=None,
                   help="Path to config file (defaults bundled)")
    p.add_argument("--mode", type=str, default="train_all", choices=MODES)
    p.add_argument("--exp_name", type=str, default=None)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--experiment_dir", type=str, default=None,
                   help="Existing experiment to evaluate / resume")
    p.add_argument("--serve_mode", type=str, default="hard",
                   choices=SERVE_MODES,
                   help="serve: which serving engine dehazes the inputs "
                        "(serving.py AdaptiveDehazer modes)")
    p.add_argument("--queue_bucket", type=int, default=16,
                   help="serve --serve_mode queued: same-class bucket size")
    p.add_argument("--max_wait_batches", type=int, default=None,
                   help="serve --serve_mode queued: hard latency bound "
                        "(batches) before a partial bucket dispatches")
    p.add_argument("--out", type=str, default=None,
                   help="serve: output dir (default <experiment>/served)")
    p.add_argument("--detect", action="store_true",
                   help="serve: run the trained detector on the dehazed "
                        "outputs and write detections.json (boxes/scores/"
                        "labels per image)")
    p.add_argument("--precompiled", type=str, default=None,
                   help="serve: precompiled serving bundle dir, or 'auto' "
                        "for <experiment_dir>/precompiled; export: output "
                        "dir (same default)")
    p.add_argument("--lowres", type=str, default="",
                   help="serve hard/spill/stream: comma-separated branch "
                        "levels (low,medium,high) to run at half resolution "
                        "with a guided-filter lift of the correction "
                        "(ops/resolution.py quality/latency dial), or "
                        "'auto' to use the experiment's tuned policy "
                        "(tools/autotune_resolution.py)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg_path = args.config
    if cfg_path is None and args.experiment_dir:
        # Consuming an existing experiment without an explicit --config:
        # prefer the experiment's OWN config (model architecture must match
        # its checkpoints — the default config silently builds default-sized
        # models and the restore shape-mismatches). Mirrors
        # AdaptiveDehazer.from_experiment.
        cand = os.path.join(args.experiment_dir, "config.yaml")
        if os.path.exists(cand):
            cfg_path = cand
    config = load_config(cfg_path)
    config = apply_cli_overrides(config, args)

    # Honor `device: cpu` (config or --device) for the JAX platform. The
    # axon sitecustomize pins the TPU backend regardless of env vars, so this
    # must go through jax.config before the first backend use
    # (reference --device surface: main.py:46-47, config.yaml:85).
    if str(config.get("device", "")).lower().startswith("cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.experiment_dir:
        config = update_checkpoint_paths(config, args.experiment_dir)
        exp_dir = args.experiment_dir
    else:
        exp_dir, config = create_experiment_dir(config, args.exp_name)
    print(f"Experiment directory: {exp_dir}")

    seed_everything(config["seed"])
    print(f"Random seed set to {config['seed']}")

    if args.mode == "preprocess":
        from adam_dehaze_tpu.data.preprocessing import (
            preprocess_dataset,
            split_dataset,
        )
        data_dir = Path(config["dataset"]["train_path"]).parent
        raw_dir = os.path.join(data_dir, "raw")
        processed_dir = os.path.join(data_dir, "processed")
        n = preprocess_dataset(raw_dir, processed_dir,
                               size=config["dataset"]["img_size"])
        counts = split_dataset(processed_dir, seed=config["seed"])
        print(f"Preprocessed {n} triplets; split: {counts}")

    elif args.mode == "train_classifier":
        from adam_dehaze_tpu.training.train_classifier import (
            evaluate_classifier,
            train_classifier,
        )
        model, state = train_classifier(config, resume=args.resume)
        evaluate_classifier(model, state, config)

    elif args.mode == "train_dehazing":
        from adam_dehaze_tpu.training.train_dehazing import (
            evaluate_dehazing_model,
            train_all_dehazing_models,
        )
        models = train_all_dehazing_models(config, resume=args.resume)
        for level, (model, state) in models.items():
            print(f"Evaluating {level} intensity model...")
            evaluate_dehazing_model(model, state, level, config)

    elif args.mode == "train_joint":
        from adam_dehaze_tpu.training.train_joint import (
            evaluate_joint_model,
            train_joint_model,
        )
        router, state = train_joint_model(config, resume=args.resume)
        evaluate_joint_model(router, state, config)

    elif args.mode == "train_all":
        from adam_dehaze_tpu.evaluation.evaluate import run_comprehensive_evaluation
        from adam_dehaze_tpu.training.train_classifier import (
            evaluate_classifier,
            train_classifier,
        )
        from adam_dehaze_tpu.training.train_dehazing import train_all_dehazing_models
        from adam_dehaze_tpu.training.train_joint import train_joint_model

        print("\n===== Step 1: Training Fog Intensity Classifier =====")
        model, state = train_classifier(config, resume=args.resume)
        evaluate_classifier(model, state, config)
        print("\n===== Step 2: Training Dehazing Models =====")
        train_all_dehazing_models(config, resume=args.resume)

        # Adaptive eval on the stage checkpoints BEFORE joint fine-tuning,
        # so the joint stage's measured contribution is an artifact row
        # (pre_joint_adaptive.json) rather than an assumption.
        print("\n===== Step 2b: Adaptive Eval (pre-joint) =====")
        import json as _json

        import jax as _jax

        from adam_dehaze_tpu.evaluation.evaluate import evaluate_joint_model
        from adam_dehaze_tpu.training.train_joint import build_router_state
        pre_router, pre_state, _ = build_router_state(
            config, _jax.random.PRNGKey(config["seed"]))
        pre_joint = evaluate_joint_model(config, pre_router, pre_state)
        os.makedirs(config["evaluation"]["results_dir"], exist_ok=True)
        with open(os.path.join(config["evaluation"]["results_dir"],
                               "pre_joint_adaptive.json"), "w") as f:
            _json.dump(pre_joint, f, indent=2)

        print("\n===== Step 3: Training Joint Model =====")
        router, joint_state = train_joint_model(config, resume=args.resume)
        print("\n===== Step 4: Comprehensive Evaluation =====")
        run_comprehensive_evaluation(config, router, joint_state)

    elif args.mode == "train_detection":
        # Extension beyond the reference surface: fine-tune the TPU-native
        # FCOS detector on the labeled fog corpus so detection eval compares
        # trained weights (the reference downloads COCO-pretrained
        # torchvision weights instead, detection.py:23-51).
        from adam_dehaze_tpu.training.train_detection import train_detection
        train_detection(config, epochs=config["detection"].get("epochs", 1),
                        resume=args.resume,
                        img_size=config["dataset"]["img_size"])

    elif args.mode == "evaluate":
        from adam_dehaze_tpu.evaluation.evaluate import run_comprehensive_evaluation
        run_comprehensive_evaluation(config)

    elif args.mode == "demo":
        run_demo(config, exp_dir)

    elif args.mode == "serve":
        run_serve(config, exp_dir, args)

    elif args.mode == "export":
        run_export(config, exp_dir, args)

    elif args.mode == "bench":
        import subprocess
        import sys
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__), "..", "bench.py")])

    print(f"All tasks completed successfully! Results are available in: {exp_dir}")


def run_demo(config, exp_dir: str, max_batches: int = 2):
    """Load the adaptive pipeline and dehaze sample images, writing
    comparison grids + routing weights (implements the reference's TODO,
    main.py:210-215)."""
    import jax
    import numpy as np

    from adam_dehaze_tpu.data.dataset import get_dataloader
    from adam_dehaze_tpu.evaluation.evaluate import _load_joint
    from adam_dehaze_tpu.utils import visualize

    demo_dir = os.path.join(exp_dir, "demo")
    os.makedirs(demo_dir, exist_ok=True)
    router, state = _load_joint(config)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    apply_fn = jax.jit(lambda x: router.apply(variables, x, train=False))

    loader = get_dataloader(config, "test")
    for bi, batch in enumerate(loader):
        if bi >= max_batches:
            break
        import jax.numpy as jnp
        dehazed, info = apply_fn(jnp.asarray(batch["hazy"]))
        dehazed = np.asarray(dehazed)
        k = min(4, dehazed.shape[0])
        visualize.visualize_comparison(
            batch["hazy"][:k], dehazed[:k], batch["clear"][:k],
            os.path.join(demo_dir, f"demo_batch{bi}.png"))
        weights = info.get("weights")
        if weights is None:
            weights = info.get("gate_weights")
        if weights is not None:
            visualize.visualize_routing_weights(
                np.asarray(weights[:k]),
                os.path.join(demo_dir, f"demo_weights{bi}.png"))
    print(f"Demo completed. Results saved to: {demo_dir}")


def run_serve(config, exp_dir: str, args):
    """Batch-serve a directory of hazy images through a chosen serving
    engine and write dehazed PNGs + a routing manifest.

    User-facing surface over serving.py's engine API (the reference stops
    at a TODO demo stub, main.py:210-215 — it has no inference CLI at all):

      python main.py --mode serve --experiment_dir experiments/X \\
          [--data_dir DIR] [--serve_mode hard|spill|spill_up|stream|queued|device|soft]
          [--queue_bucket N] [--max_wait_batches W] [--out DIR]
          [--lowres high[,medium]] [--detect] [--precompiled DIR|auto]

    Inputs: every .png/.jpg under --data_dir (recursive), else the config
    test split's hazy images. Outputs: <out>/<basename> dehazed +
    <out>/routing.json {filename: {intensity, branch}} for hard modes;
    --detect adds <out>/detections.json from the trained detector run on
    the dehazed outputs.
    """
    import glob
    import json

    import jax.numpy as jnp
    import numpy as np

    from adam_dehaze_tpu.data.dataset import _imread_rgb
    from adam_dehaze_tpu.data.preprocessing import _write_rgb
    from adam_dehaze_tpu.evaluation.evaluate import _load_joint
    from adam_dehaze_tpu.models.routing import INTENSITY_ORDER
    from adam_dehaze_tpu.serving import AdaptiveDehazer

    if args.data_dir:
        files = sorted(
            f for ext in ("png", "jpg", "jpeg")
            for f in glob.glob(os.path.join(args.data_dir, "**", f"*.{ext}"),
                               recursive=True))
    else:
        files = sorted(glob.glob(os.path.join(
            config["dataset"]["test_path"], "test", "*", "hazy", "*.png")))
    if not files:
        raise SystemExit("serve: no input images found (give --data_dir or "
                         "point dataset.test_path at a corpus)")

    img_size = config["dataset"]["img_size"]
    batch = config["dataset"]["batch_size"]
    out_dir = args.out or os.path.join(exp_dir, "served")
    os.makedirs(out_dir, exist_ok=True)

    router, state = _load_joint(config)
    dehazer = AdaptiveDehazer(router, state, config,
                              precompiled=_resolve_bundle(args, exp_dir),
                              resolution_policy=os.path.join(
                                  exp_dir, "resolution_policy.json"))

    def batches():
        for i in range(0, len(files), batch):
            yield jnp.asarray(np.stack(
                [_imread_rgb(f, img_size) for f in files[i:i + batch]]))

    mode = args.serve_mode
    lowres_arg = getattr(args, "lowres", "")
    if lowres_arg == "auto":
        # tuned per-branch policy (tools/autotune_resolution.py); loud when
        # the experiment has no policy file.
        lowres = "auto"
    else:
        lowres = tuple(s for s in lowres_arg.split(",") if s)
        bad = set(lowres) - set(INTENSITY_ORDER)
        if bad:
            raise SystemExit(f"serve: unknown --lowres levels {sorted(bad)} "
                             f"(choose from {list(INTENSITY_ORDER)} or "
                             "'auto')")
    if lowres and mode not in ("hard", "spill", "spill_up", "stream"):
        raise SystemExit("serve: --lowres applies to hard/spill/stream modes")
    results = {}  # global index -> (dehazed HWC float, intensity or None)
    if mode == "queued":
        for out, gidx, cls in dehazer.route_hard_queued(
                batches(), queue_bucket=args.queue_bucket,
                max_wait_batches=args.max_wait_batches):
            for row, g in zip(out, gidx):
                results[int(g)] = (row, cls)
    elif mode == "stream":
        base = 0
        for out, intensity in dehazer.route_hard_stream(batches(),
                                                        lowres=lowres):
            for j, row in enumerate(out):
                results[base + j] = (row, int(intensity[j]))
            base += out.shape[0]
    else:
        base = 0
        for x in batches():
            if mode == "soft":
                out, intensity = dehazer(x), None
            elif mode == "device":
                out, intensity = dehazer.route_device_binned(x)
            else:  # hard / spill / spill_up (quality-guarded)
                spill = {"hard": False, "spill": True,
                         "spill_up": "up"}[mode]
                out, intensity = dehazer.route_hard(x, spill=spill,
                                                    lowres=lowres)
            for j in range(out.shape[0]):
                results[base + j] = (
                    out[j], None if intensity is None else int(intensity[j]))
            base += out.shape[0]

    manifest = {}
    for g, (img, intensity) in sorted(results.items()):
        name = os.path.basename(files[g])
        _write_rgb(os.path.join(out_dir, name), np.asarray(img, np.float32))
        if intensity is not None:
            manifest[name] = {"intensity": intensity,
                              "branch": INTENSITY_ORDER[intensity]}

    if getattr(args, "detect", False):
        _serve_detect(config, files, results, out_dir, batch)
    with open(os.path.join(out_dir, "routing.json"), "w") as f:
        json.dump({"serve_mode": mode,
                   "lowres": ("auto" if lowres == "auto" else list(lowres)),
                   "images": manifest}, f, indent=2)

    hist = {}
    for v in manifest.values():
        hist[v["branch"]] = hist.get(v["branch"], 0) + 1
    print(f"Served {len(results)} images via '{mode}' -> {out_dir} "
          f"(routing: {hist if hist else 'soft blend'})")


def _serve_detect(config, files, results, out_dir: str, batch: int):
    """Run the trained detector on the served (dehazed) images and write
    <out_dir>/detections.json: {filename: {boxes, scores, labels}} in xyxy
    pixel coordinates — the user-facing half of the reference's
    dehaze->detect pipeline (reference: models/detection.py:74-125 wires it
    for eval only; there is no inference output surface)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from adam_dehaze_tpu.evaluation.evaluate import load_detection_model
    from adam_dehaze_tpu.models.detection import IMAGENET_MEAN, IMAGENET_STD

    det_model = load_detection_model(config)
    order = sorted(results)
    detections = {}
    for i in range(0, len(order), batch):
        idx = order[i:i + batch]
        x = jnp.asarray(np.stack(
            [np.asarray(results[g][0], np.float32) for g in idx]))
        for g, det in zip(idx, det_model((x - IMAGENET_MEAN) / IMAGENET_STD)):
            detections[os.path.basename(files[g])] = {
                "boxes": det["boxes"].tolist(),
                "scores": det["scores"].tolist(),
                "labels": det["labels"].tolist()}
    with open(os.path.join(out_dir, "detections.json"), "w") as f:
        json.dump(detections, f, indent=2)
    n = sum(len(v["scores"]) for v in detections.values())
    print(f"Detected {n} objects across {len(detections)} images -> "
          f"{out_dir}/detections.json")


def _resolve_bundle(args, exp_dir: str):
    """--precompiled PATH|auto -> bundle dir (or None when absent)."""
    pre = getattr(args, "precompiled", None)
    if pre == "auto":
        cand = os.path.join(exp_dir, "precompiled")
        return cand if os.path.isdir(cand) else None
    return pre


def run_export(config, exp_dir: str, args):
    """Write a precompiled serving bundle for this experiment.

      python main.py --mode export --experiment_dir experiments/X \\
          [--precompiled OUTDIR] [--batch_size N] [--queue_bucket B]

    One-time cost ≈ a full serving warmup; afterwards `--mode serve
    --precompiled auto` (or `AdaptiveDehazer.from_experiment(...,
    precompiled=...)`) reaches first-batch-served without any XLA
    compile. Bundle is pinned to (backend, device_kind, jax version)."""
    from adam_dehaze_tpu.evaluation.evaluate import _load_joint
    from adam_dehaze_tpu.serving import AdaptiveDehazer

    out = args.precompiled if args.precompiled not in (None, "auto") else \
        os.path.join(exp_dir, "precompiled")
    router, state = _load_joint(config)
    dehazer = AdaptiveDehazer(router, state, config)
    batch = config["dataset"]["batch_size"]
    written = dehazer.export_precompiled(
        out, batch_sizes=(batch,), queue_buckets=(args.queue_bucket,),
        device_buckets=(16, batch), progress=lambda m: print(f"  {m}"))
    print(f"Exported {len(written)} serving programs -> {out}")


if __name__ == "__main__":
    main()
