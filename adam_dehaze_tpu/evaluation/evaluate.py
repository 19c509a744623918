"""Comprehensive evaluation orchestrator.

Counterpart of the reference's evaluation/evaluate.py:
- `evaluate_baseline_models` — oracle routing by ground-truth intensity label
  (reference: evaluate.py:32-92), batched per intensity stream here.
- `evaluate_joint_model` — classifier -> router path with per-category
  metrics and comparison grids (reference: evaluate.py:94-177,385-462).
- `evaluate_object_detection` — detector on hazy vs dehazed images
  (reference: evaluate.py:179-383). The reference's dehazed-mAP path was
  broken (its process_batch returned empty dicts that were silently skipped,
  evaluate.py:297-344); here both paths genuinely produce detections.
- `run_comprehensive_evaluation` — orchestrates everything and writes
  `comprehensive_results.json` with the reference's schema
  (reference: evaluate.py:464-540).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.data.dataset import get_dataloader
from adam_dehaze_tpu.evaluation.metrics import DetectionMetrics, ImageQualityMetrics
from adam_dehaze_tpu.models.detection import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    create_detection_model,
    create_integrated_system,
)
from adam_dehaze_tpu.training import checkpoint as ckpt
from adam_dehaze_tpu.training.common import state_to_tree, tree_to_state
from adam_dehaze_tpu.training.train_joint import build_router_state
from adam_dehaze_tpu.utils import visualize

_CATEGORY_NAMES = {0: "low_intensity", 1: "medium_intensity", 2: "high_intensity"}


def _load_joint(config):
    """Router + state with best joint checkpoint (falling back to the stage
    checkpoints grafted by build_router_state).

    When the joint checkpoint exists the models are NEVER initialised on
    device: the restore target comes from `jax.eval_shape` over the init
    (abstract interpretation — no compile, no device work) and orbax
    restores the checkpoint straight into it. On the remote-compiled TPU
    runtime this removes minutes of init compiles from every serving/eval
    cold start — the init values were discarded anyway."""
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import create_router
    from adam_dehaze_tpu.training.state import TrainState
    from adam_dehaze_tpu.training.train_joint import (
        flax_to_mutable,
        make_optimizer,
    )

    best = ckpt.best_model_path(config["joint_training"]["checkpoint_dir"])
    if os.path.isdir(best):
        router = create_router(create_branch_models(config),
                               create_classifier(config), config)
        img = config["dataset"]["img_size"]
        tx = make_optimizer(config["joint_training"]["learning_rate"])

        def _init():
            variables = router.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(0)},
                jnp.zeros((1, img, img, 3), jnp.float32))
            params = flax_to_mutable(variables["params"])
            return TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                batch_stats=flax_to_mutable(variables["batch_stats"]),
                opt_state=tx.init(params))

        # eval_shape leaves carry no sharding; orbax requires a concrete one
        # to deserialize ("sharding ... Got None"). Pin the local default
        # device — also what makes a TPU-saved checkpoint restore on CPU.
        dev_sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        abstract = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=dev_sharding),
            jax.eval_shape(_init))
        try:
            tree, _ = ckpt.load_checkpoint(best, state_to_tree(abstract))
        except ValueError as e:
            raise ValueError(
                f"Joint checkpoint at {best} does not match the models built "
                "from this config — the experiment was likely trained with "
                "different classifier/dehazing sizes. Pass the experiment's "
                f"own config (experiments/<name>/config.yaml). [{e}]"
            ) from e
        state = tree_to_state(abstract, tree)
        print(f"Loaded joint checkpoint from {best}")
        return router, state
    router, state, _tx = build_router_state(config, jax.random.PRNGKey(0))
    return router, state


def _apply_branch(router, state, level: str):
    """Bound apply fn for one branch submodule inside the router tree."""
    sub = f"models_{level}"
    variables = {"params": state.params[sub],
                 "batch_stats": state.batch_stats[sub]}
    module = router.models[level]
    return jax.jit(lambda x: module.apply(variables, x))


def evaluate_baseline_models(config, router=None, state=None) -> Dict[str, Dict[str, float]]:
    """Oracle routing: each test image goes to the branch matching its GT
    label (reference: evaluate.py:32-92)."""
    if router is None:
        router, state = _load_joint(config)
    iq = ImageQualityMetrics(
        image_shape=(1, config["dataset"]["img_size"],
                     config["dataset"]["img_size"], 3),
        lpips_weights=config.get("loss", {}).get("lpips_weights") or None)
    branch_fns = {lvl: _apply_branch(router, state, lvl)
                  for lvl in ("low", "medium", "high")}
    # Evaluation reads the FULL test set on every host (shard_per_host=False)
    # so multi-process runs report global metrics, not shard-local ones.
    loader = get_dataloader(config, "test", shard_per_host=False)
    for batch in loader:
        hazy = jnp.asarray(batch["hazy"])
        clear = batch["clear"]
        labels = batch["intensity"]
        # Batched oracle: run branches once, gather per-label outputs.
        outs = {lvl: np.asarray(fn(hazy)) for lvl, fn in branch_fns.items()}
        picked = np.zeros_like(clear)
        for i, lvl in enumerate(("low", "medium", "high")):
            sel = labels == i
            picked[sel] = outs[lvl][sel]
        for i in range(3):
            sel = (labels == i) & batch["mask"]
            if sel.any():
                iq.add_batch(picked[sel], clear[sel], _CATEGORY_NAMES[i])
    avg = iq.print_results()
    iq.save_results(os.path.join(config["evaluation"]["results_dir"],
                                 "baseline_results.json"))
    return avg


def evaluate_fixed_branch(config, router=None, state=None) -> Dict[str, Dict[str, float]]:
    """Fixed-pipeline baselines: run EACH single branch on ALL test traffic
    (no routing at all). This is the quality side of the reference's central
    adaptive-vs-fixed claim (reference README.md:146-149: adaptive matches
    fixed-complex quality at −20% inference time / 92 G vs 150 G FLOPs); the
    cost side is bench.py's `skewed_all_high_ms_per_image`.

    Returns {"fixed_low": {psnr, ssim, ...}, "fixed_medium": ...,
    "fixed_high": ...} — overall averages over the WHOLE test set, directly
    comparable with the adaptive row's per-category mean."""
    if router is None:
        router, state = _load_joint(config)
    branch_fns = {lvl: _apply_branch(router, state, lvl)
                  for lvl in ("low", "medium", "high")}
    accs = {lvl: ImageQualityMetrics(
        image_shape=(1, config["dataset"]["img_size"],
                     config["dataset"]["img_size"], 3),
        lpips_weights=config.get("loss", {}).get("lpips_weights") or None)
        for lvl in branch_fns}
    loader = get_dataloader(config, "test", shard_per_host=False)
    for batch in loader:
        hazy = jnp.asarray(batch["hazy"])
        clear = batch["clear"]
        mask = batch["mask"]
        for lvl, fn in branch_fns.items():
            out = np.asarray(fn(hazy))
            accs[lvl].add_batch(out[mask], clear[mask], "overall")
    results = {}
    for lvl, iq in accs.items():
        avg = iq.compute_averages()
        results[f"fixed_{lvl}"] = avg.get("overall", {})
        psnr = results[f"fixed_{lvl}"].get("psnr", float("nan"))
        print(f"  fixed {lvl:<6} on ALL traffic: PSNR {psnr:.2f} dB")
    return results


def evaluate_hard_routing(config, router=None, state=None) -> Dict[str, Any]:
    """Hard-binned serving quality under REAL classifier traffic, in both
    engine modes (models/routing.py:BinnedAdaptiveEngine):

    - fidelity: every image is served by its predicted branch (skewed
      batches pay extra padded bucket programs — the cost bench.py measures
      as `predicted_routing_trained_ms_per_image`);
    - spill: capacity-constrained plan (`plan_capacity_spill`) — overflow
      images are served by a neighboring branch's free pad slots, so the
      serving cost equals the balanced cost.

    Spill quality depends on the per-batch traffic mix, so it is measured
    under TWO regimes:

    - steady (key "spill"): the test set is permuted with a fixed seed so
      each batch approximates the corpus's class mix — the deployment case
      the capacity plan is designed for; only per-batch multinomial
      overflow (near-boundary images when logits are available) spills.
    - ordered (key "spill_ordered"): the loader's native
      intensity-sorted order — every batch is 100% one class, the
      adversarial worst case (cap = ceil(B/3) forces ~2/3 of each batch
      onto neighbor branches). A deployment whose traffic arrives
      class-clumped at batch granularity should use fidelity mode or
      per-class queues instead of spill.

    Returns {"fidelity": {...}, "spill": {...}, "spill_ordered": {...},
    "routing_acc": float, "spilled_frac": float,
    "spilled_frac_ordered": float}.

    The engine is built through AdaptiveDehazer._binned_engine — the SAME
    construction bench.py times (serving dtype, autotuned per-branch
    dispatch when the experiment has a serving_autotune.json cache, tuned
    bucket ladder and chunk costs) — so these quality rows measure exactly
    the configuration that serves traffic, not an eval-only f32 twin
    (VERDICT r3 item 9)."""
    from adam_dehaze_tpu.serving import AdaptiveDehazer

    if router is None:
        router, state = _load_joint(config)
    cache = os.path.join(config.get("_exp_dir", "."), "serving_autotune.json")
    dehazer = AdaptiveDehazer(router, state, config,
                              autotune=os.path.exists(cache),
                              autotune_cache=cache)
    # Single-bucket ladder: engine outputs are identical under any chunk
    # plan, and each extra bucket size is a separate multi-minute remote
    # compile — quality rows only need ONE program per branch at the batch
    # size (covers the all-one-class worst case).
    engine = dehazer._binned_engine(
        buckets=(config["dataset"]["batch_size"],))

    img = config["dataset"]["img_size"]

    # Materialize the test set once (static shapes), so the steady-state
    # pass can permute across batches while reusing the compiled shapes.
    hazy_all, clear_all, level_all = [], [], []
    batch_shape = None
    for batch in get_dataloader(config, "test", shard_per_host=False):
        batch_shape = batch["hazy"].shape
        m = batch["mask"]
        hazy_all.append(np.asarray(batch["hazy"])[m])
        clear_all.append(np.asarray(batch["clear"])[m])
        level_all.append(np.asarray(batch["intensity"])[m])
    hazy_all = np.concatenate(hazy_all)
    clear_all = np.concatenate(clear_all)
    level_all = np.concatenate(level_all)
    n_imgs = hazy_all.shape[0]
    bsz = batch_shape[0]

    def _batches(order):
        for i in range(0, n_imgs, bsz):
            idx = order[i:i + bsz]
            pad = bsz - idx.size
            full = np.concatenate([idx, np.zeros(pad, np.int64)])
            mask = np.concatenate([np.ones(idx.size, bool),
                                   np.zeros(pad, bool)])
            yield full, mask

    accs = {mode: ImageQualityMetrics(
        image_shape=(1, img, img, 3),
        lpips_weights=config.get("loss", {}).get("lpips_weights") or None)
            for mode in ("fidelity", "spill", "spill_up", "spill_ordered")}
    counters = {"steady": [0, 0], "ordered": [0, 0],
                "steady_up": [0, 0]}  # [spilled, total]
    n_correct = n_total = 0

    orders = {
        "ordered": np.arange(n_imgs),
        "steady": np.random.default_rng(0).permutation(n_imgs),
    }
    for regime, order in orders.items():
        spill_key = "spill" if regime == "steady" else "spill_ordered"
        for idx, mask in _batches(order):
            hazy = jnp.asarray(hazy_all[idx])
            clear = clear_all[idx]
            logits = np.asarray(engine._logits(hazy))
            pred = logits.argmax(axis=1)
            # Plan capacity on REAL rows only: loader pad rows duplicate an
            # image and would otherwise consume class capacity, forcing
            # phantom spills of real images in the final short batch. Pads
            # keep their raw prediction (outputs masked out below).
            serve_labels = pred.copy()
            serve_labels[mask] = engine.plan_capacity_spill(
                pred[mask], logits[mask])
            out_sp = engine._dispatch(hazy, serve_labels)
            accs[spill_key].add_batch(np.asarray(out_sp)[mask],
                                      clear[mask], "overall")
            counters[regime][0] += int(
                (serve_labels[mask] != pred[mask]).sum())
            counters[regime][1] += int(mask.sum())
            if regime == "steady":
                # Quality-guarded up-only spill (round-4): overflow may only
                # move to stronger branches; top-class overflow keeps its
                # class and pays a planned small bucket instead of serving
                # heavy fog with a weaker branch.
                up_labels = pred.copy()
                up_labels[mask] = engine.plan_capacity_spill(
                    pred[mask], logits[mask], up_only=True)
                out_up = engine._dispatch(hazy, up_labels)
                accs["spill_up"].add_batch(np.asarray(out_up)[mask],
                                           clear[mask], "overall")
                counters["steady_up"][0] += int(
                    (up_labels[mask] != pred[mask]).sum())
                counters["steady_up"][1] += int(mask.sum())
            if regime == "ordered":
                # fidelity + routing accuracy once, on the native order
                out_fid, _ = engine(hazy, intensity=pred)
                accs["fidelity"].add_batch(np.asarray(out_fid)[mask],
                                           clear[mask], "overall")
                n_correct += int(
                    (pred[mask] == level_all[idx][mask]).sum())
                n_total += int(mask.sum())

    results = {mode: accs[mode].compute_averages().get("overall", {})
               for mode in accs}
    results["routing_acc"] = n_correct / max(n_total, 1)
    results["spilled_frac"] = counters["steady"][0] / max(
        counters["steady"][1], 1)
    results["spilled_frac_up"] = counters["steady_up"][0] / max(
        counters["steady_up"][1], 1)
    results["spilled_frac_ordered"] = counters["ordered"][0] / max(
        counters["ordered"][1], 1)
    print(f"  hard routing (acc {results['routing_acc']:.3f}): "
          f"fidelity PSNR {results['fidelity'].get('psnr', float('nan')):.2f}"
          f" | spill steady PSNR "
          f"{results['spill'].get('psnr', float('nan')):.2f} "
          f"({results['spilled_frac'] * 100:.1f}% spilled) | spill-up "
          f"{results['spill_up'].get('psnr', float('nan')):.2f} "
          f"({results['spilled_frac_up'] * 100:.1f}%) | spill ordered "
          f"{results['spill_ordered'].get('psnr', float('nan')):.2f} "
          f"({results['spilled_frac_ordered'] * 100:.1f}%)")
    return results


def evaluate_joint_model(config, router=None, state=None) -> Dict[str, Dict[str, float]]:
    """Full adaptive path: classifier -> router -> blend
    (reference: evaluate.py:94-177)."""
    if router is None:
        router, state = _load_joint(config)
    iq = ImageQualityMetrics(
        image_shape=(1, config["dataset"]["img_size"],
                     config["dataset"]["img_size"], 3),
        lpips_weights=config.get("loss", {}).get("lpips_weights") or None)
    apply_fn = jax.jit(lambda v, x: router.apply(v, x, train=False))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    loader = get_dataloader(config, "test", shard_per_host=False)
    vis_done = False
    # No-reference fog-density rows (FADE analog): the reference's README
    # reports FADE on RTTS (README.md:140, "-30% FADE" headline) but ships
    # no FADE implementation; the DCP-based density proxy
    # (data/synthetic.py:fog_density_map, mirroring its helpers.py mask
    # pipeline) gives the same direction-of-improvement signal in-env,
    # reported honestly as fade_proxy (NOT the published FADE scale).
    from adam_dehaze_tpu.data.synthetic import fog_density_map
    density_fn = jax.jit(lambda im: jnp.mean(fog_density_map(im),
                                             axis=(1, 2)))
    fade_hazy, fade_dehazed = [], []
    # BRISQUE/NIMA-analog no-reference rows (BASELINE.md "Real-world
    # (RTTS)": BRISQUE 11.961 / NIMA 5.346, reference README.md:140; the
    # reference ships neither implementation). brisque_proxy: NIQE-family
    # naturalness distance from a pristine MVG fit on THIS split's clear
    # images (features accumulate in the same pass, the model fits at the
    # end). nima_proxy: the in-env learned 10-bin MOS head; trained once
    # per experiment and cached next to the checkpoints.
    from adam_dehaze_tpu.evaluation import no_reference as nr
    nss_fn = jax.jit(nr.nss_features)
    nss_clear, nss_hazy, nss_dehazed = [], [], []
    nima_hazy, nima_dehazed = [], []
    q_head = None
    exp_dir = config.get("_exp_dir")
    if exp_dir:
        q_path = os.path.join(exp_dir, "quality_head.msgpack")
        loaded = nr.load_quality_head(q_path)
        if loaded is None:
            try:
                print("  training nima_proxy quality head (one-time, "
                      "cached per experiment)...")
                model_q, params_q = nr.train_quality_head(
                    config, steps=int(config.get("evaluation", {})
                                      .get("nima_steps", 300)))
                nr.save_quality_head(q_path, params_q)
                loaded = (model_q, params_q)
            except Exception as e:
                print(f"  nima_proxy head training skipped "
                      f"({type(e).__name__}: {e})")
        q_head = loaded
    for batch in loader:
        hazy = jnp.asarray(batch["hazy"])
        dehazed, info = apply_fn(variables, hazy)
        dehazed = np.asarray(dehazed)
        m = batch["mask"]
        fade_hazy.append(np.asarray(density_fn(hazy))[m])
        fade_dehazed.append(np.asarray(density_fn(jnp.asarray(dehazed)))[m])
        dehazed_dev = jnp.asarray(dehazed)
        clear_dev = jnp.asarray(batch["clear"])
        nss_clear.append(np.asarray(nss_fn(clear_dev))[m])
        nss_hazy.append(np.asarray(nss_fn(hazy))[m])
        nss_dehazed.append(np.asarray(nss_fn(dehazed_dev))[m])
        if q_head is not None:
            nima_hazy.append(nr.nima_proxy_scores(hazy, *q_head)[m])
            nima_dehazed.append(
                nr.nima_proxy_scores(dehazed_dev, *q_head)[m])
        for i in range(3):
            sel = (batch["intensity"] == i) & batch["mask"]
            if sel.any():
                iq.add_batch(dehazed[sel], batch["clear"][sel], _CATEGORY_NAMES[i])
        if not vis_done:
            vis_dir = config["evaluation"]["visualization_dir"]
            os.makedirs(vis_dir, exist_ok=True)
            k = min(4, hazy.shape[0])
            visualize.visualize_comparison(
                np.asarray(hazy[:k]), dehazed[:k], batch["clear"][:k],
                os.path.join(vis_dir, "joint_comparison.png"))
            weights = info.get("weights")
            if weights is None:
                weights = info.get("gate_weights")
            if weights is not None:
                visualize.visualize_routing_weights(
                    np.asarray(weights[:k]),
                    os.path.join(vis_dir, "routing_weights.png"))
            vis_done = True
    avg = iq.print_results()
    fh = float(np.mean(np.concatenate(fade_hazy))) if fade_hazy else None
    fd = float(np.mean(np.concatenate(fade_dehazed))) if fade_dehazed else None
    if fh is not None and fd is not None and fh > 0:
        avg["fade_proxy"] = {
            "hazy": round(fh, 5), "dehazed": round(fd, 5),
            "reduction_pct": round((fh - fd) / fh * 100.0, 2),
        }
        print(f"  fade_proxy (DCP density): hazy {fh:.4f} -> dehazed "
              f"{fd:.4f} ({avg['fade_proxy']['reduction_pct']:+.1f}% "
              f"reduction; reference claims -30% FADE, README.md:19)")
    if nss_clear:
        pristine = nr.pristine_from_features(np.concatenate(nss_clear))
        bh = float(np.mean(nr.mahalanobis_scores(
            np.concatenate(nss_hazy), pristine)))
        bd = float(np.mean(nr.mahalanobis_scores(
            np.concatenate(nss_dehazed), pristine)))
        avg["brisque_proxy"] = {
            "hazy": round(bh, 4), "dehazed": round(bd, 4),
            "reduction_pct": round((bh - bd) / max(bh, 1e-9) * 100.0, 2),
        }
        print(f"  brisque_proxy (NIQE-family, lower=better): hazy {bh:.3f}"
              f" -> dehazed {bd:.3f} "
              f"({avg['brisque_proxy']['reduction_pct']:+.1f}% reduction; "
              "baseline BRISQUE row README.md:140)")
    if nima_hazy:
        nh = float(np.mean(np.concatenate(nima_hazy)))
        nd = float(np.mean(np.concatenate(nima_dehazed)))
        avg["nima_proxy"] = {
            "hazy": round(nh, 4), "dehazed": round(nd, 4),
            "delta": round(nd - nh, 4),
        }
        print(f"  nima_proxy (1-10 MOS, higher=better): hazy {nh:.3f} -> "
              f"dehazed {nd:.3f} ({avg['nima_proxy']['delta']:+.3f}; "
              "baseline NIMA row README.md:140)")
    iq.save_results(os.path.join(config["evaluation"]["results_dir"],
                                 "joint_results.json"))
    return avg


def _dummy_annotations(loader, path: str) -> str:
    """Fabricate an empty COCO file so detection eval runs without labels —
    the reference's fixture behaviour (reference: evaluate.py:242-260)."""
    images, idx = [], 0
    for batch in loader:
        for name, valid in zip(batch["name"], batch["mask"]):
            if valid:
                images.append({"id": idx, "file_name": name})
                idx += 1
    coco = {"images": images, "annotations": [],
            "categories": [{"id": i} for i in range(1, 91)]}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(coco, f)
    return path


def _merge_annotations(ann_cfg: Dict[str, str]):
    """Merge the per-intensity COCO GT files into one GT dict with globally
    unique image/annotation ids, plus a (level, file_name) -> image_id map so
    detections align with GT by NAME, not by iteration order (fixes the
    reference's sequential-image_id assumption and the r1 single-path pick,
    reference config.yaml:76-80 keeps per-intensity annotation paths)."""
    merged = {"images": [], "annotations": [], "categories": None}
    name_to_id: Dict[tuple, int] = {}
    next_img, next_ann = 1, 1
    for level in ("low", "medium", "high"):
        path = (ann_cfg or {}).get(level)
        if not path or not os.path.exists(path):
            continue
        with open(path) as f:
            gt = json.load(f)
        if merged["categories"] is None:
            merged["categories"] = gt.get("categories", [])
        remap = {}
        for im in gt.get("images", []):
            remap[im["id"]] = next_img
            name_to_id[(level, im["file_name"])] = next_img
            merged["images"].append({**im, "id": next_img})
            next_img += 1
        for ann in gt.get("annotations", []):
            merged["annotations"].append(
                {**ann, "id": next_ann, "image_id": remap[ann["image_id"]]})
            next_ann += 1
    if not merged["images"]:
        return None, {}
    return merged, name_to_id


_LEVELS = {0: "low", 1: "medium", 2: "high"}


def load_detection_model(config, image_size: int = None):
    """Detection model initialised with the TRAINED checkpoint when present
    (detection.checkpoint_dir/best_model, written by train_detection)."""
    det_model = create_detection_model(config)
    det_model.init(jax.random.PRNGKey(1),
                   image_size=image_size or config["dataset"]["img_size"])
    det_best = ckpt.best_model_path(config["detection"]["checkpoint_dir"])
    if os.path.isdir(det_best):
        # The trainer saves the FULL train state (step/params/batch_stats/
        # opt_state, train_detection.py:189); restore untargeted and take the
        # inference subset so the on-disk tree's extra keys don't mismatch.
        tree, _ = ckpt.load_checkpoint(det_best)
        det_model.variables = {"params": tree["params"],
                               "batch_stats": tree["batch_stats"]}
        print(f"Loaded trained detector from {det_best}")
    else:
        print("WARNING: no trained detector checkpoint — detections will be "
              "noise (random detector weights)")
    return det_model


def evaluate_object_detection(config, router=None, state=None) -> Dict[str, Any]:
    """Detection mAP on hazy vs dehazed images
    (reference: evaluate.py:179-383, dehazed path fixed).

    Uses the TRAINED detector checkpoint when present and the per-intensity
    GT annotation files, aligned by file name."""
    if router is None:
        router, state = _load_joint(config)
    det_model = load_detection_model(config)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dehaze_fn = jax.jit(lambda x: router.apply(variables, x, train=False))
    integrated = create_integrated_system(dehaze_fn, det_model)

    loader = get_dataloader(config, "test", shard_per_host=False)
    merged_gt, name_to_id = _merge_annotations(
        config["evaluation"].get("annotation_paths"))
    if merged_gt is None:
        ann_path = _dummy_annotations(
            loader, os.path.join(config["evaluation"]["results_dir"],
                                 "dummy_annotations.json"))
        print("Using dummy annotations (no GT boxes supplied)")
        merged_gt = ann_path
        sequential_ids = True
    else:
        sequential_ids = False

    hazy_metrics = DetectionMetrics(merged_gt)
    dehazed_metrics = DetectionMetrics(merged_gt)

    fallback_id = 0
    for batch in loader:
        hazy = jnp.asarray(batch["hazy"])
        normalized = (hazy - IMAGENET_MEAN) / IMAGENET_STD
        hazy_dets = det_model(normalized)
        dehazed_dets, _ = integrated(hazy)
        for i in range(hazy.shape[0]):
            if not batch["mask"][i]:
                continue
            level = _LEVELS.get(int(batch["intensity"][i]))
            category = _CATEGORY_NAMES.get(int(batch["intensity"][i]))
            if sequential_ids:
                image_id = fallback_id
                fallback_id += 1
            else:
                image_id = name_to_id.get((level, batch["name"][i]))
                if image_id is None:  # image not in GT: skip, don't misalign
                    continue
            for dets, metrics in ((hazy_dets[i], hazy_metrics),
                                  (dehazed_dets[i], dehazed_metrics)):
                for box, score, label in zip(dets["boxes"], dets["scores"],
                                             dets["labels"]):
                    x1, y1, x2, y2 = box
                    metrics.add_detection_result(
                        image_id, int(label), [x1, y1, x2 - x1, y2 - y1],
                        float(score), category=category)

    # Per-intensity breakdown mirrors the reference's category re-evaluation
    # (reference: metrics.py:210-241).
    hazy_all = hazy_metrics.evaluate_by_category()
    dehazed_all = dehazed_metrics.evaluate_by_category()
    return {
        "hazy": {"overall": hazy_all.pop("overall", {}) or {"mAP": 0.0},
                 **hazy_all},
        "dehazed": {"overall": dehazed_all.pop("overall", {}) or {"mAP": 0.0},
                    **dehazed_all},
    }


def run_comprehensive_evaluation(config, router=None, state=None) -> Dict[str, Any]:
    """(reference: evaluate.py:464-540; identical summary JSON schema)"""
    os.makedirs(config["evaluation"]["results_dir"], exist_ok=True)
    os.makedirs(config["evaluation"]["visualization_dir"], exist_ok=True)

    print("=" * 50)
    print("ADAPTIVE FOG INTENSITY DEHAZING FRAMEWORK EVALUATION")
    print("=" * 50)

    if router is None:
        router, state = _load_joint(config)

    print("\n1. Evaluating Individual Dehazing Models:")
    baseline_results = evaluate_baseline_models(config, router, state)
    print("\n2. Evaluating Adaptive Framework:")
    joint_results = evaluate_joint_model(config, router, state)
    print("\n3. Evaluating Fixed-Pipeline Baselines (each branch on ALL traffic):")
    fixed_results = evaluate_fixed_branch(config, router, state)
    print("\n3b. Evaluating Hard-Binned Serving (fidelity vs capacity-spill):")
    hard_results = evaluate_hard_routing(config, router, state)
    print("\n4. Evaluating Impact on Object Detection:")
    detection_results = evaluate_object_detection(config, router, state)

    def _avg_psnr(res):
        vals = [res[c]["psnr"] for c in
                ("low_intensity", "medium_intensity", "high_intensity")
                if c in res]
        return float(np.mean(vals)) if vals else float("nan")

    baseline_avg_psnr = _avg_psnr(baseline_results)
    joint_avg_psnr = _avg_psnr(joint_results)
    best_fixed = max(
        (v.get("psnr", float("-inf")) for v in fixed_results.values()),
        default=float("nan"))
    hazy_map = detection_results["hazy"]["overall"].get("mAP", 0.0)
    dehazed_map = detection_results["dehazed"]["overall"].get("mAP", 0.0)
    detection_improvement = ((dehazed_map - hazy_map) / hazy_map * 100
                             if hazy_map > 0 else 0.0)

    print(f"\n5. Comparison Summary:")
    print(f"  Baseline Models Avg PSNR: {baseline_avg_psnr:.2f} dB")
    print(f"  Adaptive Framework Avg PSNR: {joint_avg_psnr:.2f} dB")
    print(f"  Best Fixed-Branch PSNR (all traffic): {best_fixed:.2f} dB")
    print(f"  Detection mAP hazy={hazy_map:.4f} dehazed={dehazed_map:.4f}")

    # Per-intensity detection rows so the "dehazing flattens the density-
    # degradation curve" claim is reproducible from the artifact.
    by_level = {}
    for lvl in ("low_intensity", "medium_intensity", "high_intensity"):
        row = {}
        for side in ("hazy", "dehazed"):
            stats = detection_results[side].get(lvl)
            if stats:
                row[side] = stats
        if row:
            by_level[lvl] = row

    comprehensive_results = {
        "baseline": baseline_results,
        "joint": joint_results,
        "fixed": fixed_results,
        "hard_routing": hard_results,
        "detection": {
            "hazy": detection_results["hazy"]["overall"],
            "dehazed": detection_results["dehazed"]["overall"],
            "by_level": by_level,
            "improvement_percent": detection_improvement,
        },
        "comparison": {
            "baseline_avg_psnr": baseline_avg_psnr,
            "joint_avg_psnr": joint_avg_psnr,
            "psnr_improvement": joint_avg_psnr - baseline_avg_psnr,
            "best_fixed_psnr": best_fixed,
            "adaptive_vs_best_fixed_psnr": joint_avg_psnr - best_fixed,
        },
    }
    # BASELINE.md side-by-side: the reference's published per-level rows
    # (reference README.md:129-131) against the adaptive system's measured
    # rows, in one machine-readable block. `corpus` records what the rows
    # were measured ON — only a FogIntensity-style Cityscapes corpus
    # (tools/prepare_real_corpus.py) is apples-to-apples with the published
    # numbers; synthetic-corpus rows are trend lines, not parity claims.
    ref_rows = {  # level -> (ssim, psnr_db, lpips), README.md:129-131
        "low_intensity": (0.9188, 23.95, 0.0585),
        "medium_intensity": (0.8761, 21.78, 0.0929),
        "high_intensity": (0.8060, 19.39, 0.1456),
    }
    lpips_key = next((k for k in ("lpips", "lpips_cal_synth", "lpips_uncal")
                      if any(k in joint_results.get(lvl, {})
                             for lvl in ref_rows)), None)
    baseline_table = {}
    for lvl, (r_ssim, r_psnr, r_lpips) in ref_rows.items():
        ours = joint_results.get(lvl, {})
        if not ours:
            continue
        row = {
            "reference": {"ssim": r_ssim, "psnr": r_psnr, "lpips": r_lpips},
            "ours": {"ssim": ours.get("ssim"), "psnr": ours.get("psnr")},
            "delta": {
                "ssim": (ours.get("ssim") or 0) - r_ssim,
                "psnr": (ours.get("psnr") or 0) - r_psnr,
            },
        }
        if lpips_key:
            row["ours"][lpips_key] = ours.get(lpips_key)
            if lpips_key == "lpips":
                row["delta"]["lpips"] = (ours.get(lpips_key) or 0) - r_lpips
        baseline_table[lvl] = row
    comprehensive_results["baseline_comparison"] = {
        "corpus": config["dataset"].get("test_path", ""),
        "reference_source": "reference README.md:129-131 "
                            "(Cityscapes FogIntensity-25K)",
        "rows": baseline_table,
    }
    print("\n6. BASELINE.md side-by-side (reference README.md:129-131):")
    for lvl, row in baseline_table.items():
        print(f"  {lvl}: PSNR {row['ours']['psnr']:.2f} vs "
              f"{row['reference']['psnr']:.2f} "
              f"({row['delta']['psnr']:+.2f} dB) | SSIM "
              f"{row['ours']['ssim']:.4f} vs {row['reference']['ssim']:.4f}")

    # Fold in the pre-joint adaptive row (written by train_all's step 2b)
    # so the joint stage's measured contribution lives in one artifact.
    pre_path = os.path.join(config["evaluation"]["results_dir"],
                            "pre_joint_adaptive.json")
    if os.path.isfile(pre_path):
        with open(pre_path) as f:
            pre_joint = json.load(f)
        pre_avg = _avg_psnr(pre_joint)
        comprehensive_results["pre_joint_adaptive"] = pre_joint
        comprehensive_results["comparison"]["pre_joint_avg_psnr"] = pre_avg
        comprehensive_results["comparison"]["joint_stage_psnr_gain"] = (
            joint_avg_psnr - pre_avg)
    out_path = os.path.join(config["evaluation"]["results_dir"],
                            "comprehensive_results.json")
    with open(out_path, "w") as f:
        json.dump(comprehensive_results, f, indent=2)
    print(f"\nComprehensive evaluation results saved to {out_path}")
    return comprehensive_results
