#!/usr/bin/env python
"""End-to-end learning check on real hardware: train the low branch on
synthetic fog for a few epochs and verify dehazing beats the hazy input on
held-out data. Writes results to benchmarks/round_results/ for the record."""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 128
EPOCHS = 30


def main():
    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.data.dataset import HazyImageDataset
    from adam_dehaze_tpu.data.preprocessing import generate_synthetic_dataset
    from adam_dehaze_tpu.ops.image import psnr
    from adam_dehaze_tpu.training.train_dehazing import (
        evaluate_dehazing_model,
        get_intensity_loader,
        train_dehazing_model,
    )

    tmp = tempfile.mkdtemp(prefix="synthdemo_")
    root = os.path.join(tmp, "data")
    n = generate_synthetic_dataset(root, n_per_class=48, size=SIZE, seed=0)
    print(f"generated {n} triplets at {SIZE}px")

    cfg = default_config()
    on_tpu = jax.default_backend() == "tpu"
    cfg["dataset"].update(train_path=root, val_path=root, test_path=root,
                          img_size=SIZE, batch_size=8, num_workers=4)
    cfg["dehazing"]["epochs"] = EPOCHS
    cfg["dehazing"]["checkpoint_dir"] = os.path.join(tmp, "ck")
    cfg["_logs_dir"] = os.path.join(tmp, "logs")
    cfg["tpu"]["use_pallas"] = on_tpu
    cfg["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"

    model, state = train_dehazing_model("low", cfg)
    test = evaluate_dehazing_model(model, state, "low", cfg)

    # Baseline: PSNR of the raw hazy input against clear.
    loader = get_intensity_loader(cfg, "test", "low")
    tot, cnt = 0.0, 0
    for batch in loader:
        p = psnr(jnp.asarray(batch["hazy"]), jnp.asarray(batch["clear"]))
        m = batch["mask"]
        tot += float(np.asarray(p)[m].sum())
        cnt += int(m.sum())
    hazy_psnr = tot / max(cnt, 1)

    # Learning curve from the trainer's JSONL log.
    curve = []
    log_path = os.path.join(cfg["_logs_dir"], "dehazing", "low",
                            "metrics.jsonl")
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                rec = json.loads(line)
                if "val/psnr" in rec:
                    curve.append(round(rec["val/psnr"], 2))

    result = {
        "hazy_input_psnr": round(hazy_psnr, 2),
        "dehazed_psnr": round(test["psnr"], 2),
        "dehazed_ssim": round(test["ssim"], 4),
        "gain_db": round(test["psnr"] - hazy_psnr, 2),
        "val_psnr_curve": curve,
        "epochs": EPOCHS,
        "backend": jax.default_backend(),
    }
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "round_results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "synthetic_convergence.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
