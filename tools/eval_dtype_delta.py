#!/usr/bin/env python
"""Quantify the serving-dtype quality cost: the SAME trained checkpoint
evaluated at bfloat16 (the serving/compute dtype every BENCH number uses)
vs float32, full adaptive path on the test split.

Answers "does the 16.7x-over-reference latency come at a quality cost?"
with an artifact row instead of an assumption. Patches
`dtype_delta` into the experiment's comprehensive_results.json and the
round artifact.

Usage: python tools/eval_dtype_delta.py --experiment_dir experiments/full_system_r3 \
           [--cpu] [--artifact benchmarks/round_results/full_system_r3.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--artifact", default=None)
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adam_dehaze_tpu.config import load_config, update_checkpoint_paths
    from adam_dehaze_tpu.data.dataset import get_dataloader
    from adam_dehaze_tpu.evaluation.evaluate import _load_joint
    from adam_dehaze_tpu.evaluation.metrics import ImageQualityMetrics

    cfg_path = args.config or os.path.join(args.experiment_dir, "config.yaml")
    base = load_config(cfg_path)
    base = update_checkpoint_paths(base, args.experiment_dir)

    img = base["dataset"]["img_size"]
    rows = {}
    for dtype_name in ("bfloat16", "float32"):
        config = json.loads(json.dumps(base))  # deep copy
        config["tpu"]["compute_dtype"] = dtype_name
        router, state = _load_joint(config)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        apply_fn = jax.jit(lambda v, x: router.apply(v, x, train=False))
        iq = ImageQualityMetrics(image_shape=(1, img, img, 3))
        for batch in get_dataloader(config, "test", shard_per_host=False):
            hazy = jnp.asarray(batch["hazy"])
            dehazed, _ = apply_fn(variables, hazy)
            m = batch["mask"]
            iq.add_batch(np.asarray(dehazed)[m], batch["clear"][m],
                         "overall")
        rows[dtype_name] = iq.compute_averages().get("overall", {})
        print(f"  {dtype_name}: PSNR "
              f"{rows[dtype_name].get('psnr', float('nan')):.4f} SSIM "
              f"{rows[dtype_name].get('ssim', float('nan')):.5f}")

    delta = {
        "bf16": rows["bfloat16"],
        "f32": rows["float32"],
        "psnr_cost_db": rows["float32"].get("psnr", 0.0)
        - rows["bfloat16"].get("psnr", 0.0),
        "ssim_cost": rows["float32"].get("ssim", 0.0)
        - rows["bfloat16"].get("ssim", 0.0),
    }
    print(json.dumps({"dtype_delta": {k: v for k, v in delta.items()
                                      if not isinstance(v, dict)}}))

    for path in [os.path.join(base["evaluation"]["results_dir"],
                              "comprehensive_results.json"),
                 args.artifact]:
        if path and os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
            doc["dtype_delta"] = delta
            with open(path, "w") as f:
                json.dump(doc, f, indent=2)
            print(f"Patched {path}")


if __name__ == "__main__":
    main()
