#!/usr/bin/env python
"""Headline benchmark: adaptive dehazing end-to-end latency per image.

Measures the product's core routine (SURVEY.md §3.2): fog classifier (HDEN)
forward + adaptive routing + the routed dehazing branch, on the real TPU chip
at the reference's working resolution (256x256, reference:
config/config.yaml:7) in bfloat16 with Pallas kernels enabled.

Primary metric: batch-binned hard routing with BALANCED class traffic (the
FogIntensity-25K corpus is balanced across low/medium/high) — each image pays
for the classifier plus exactly its own branch, the same accounting as the
reference's "adaptive average" number. Extra fields on the SAME JSON line:

- imgs_per_sec_per_chip, mfu_pct (+ the peak-TFLOPs assumption)
- skewed_ms_per_image: all-high traffic (worst-case adaptive FLOPs; no
  oracle balance) — reuses the same compiled bucket programs
- single_image_p50_ms: per-call blocking p50 through lax.switch serving
  (includes the axon tunnel RTT when remote) and its streamed companion

Benchmark integrity: if the binned engine throws, the soft 3-branch blend is
measured INSTEAD and reported under metric "adaptive_dehaze_soft_fallback..."
— a different name, so a regression can never silently corrupt the
round-over-round trend of the primary metric.

Two tiers (round-5 restructure — the r4 canonical artifact was truncated by
the driver's outer timeout at ~40 min of wall):

- DEFAULT (`python bench.py`): the headline rows only — primary binned,
  device-binned, the single-image family (incl. the <5 ms guarded-streamed
  north star, measured EARLY so it can never fall off the end), streams,
  skew, guarded lowres, trained routing (+quality-guarded spill_up), the
  detection pipeline, MFU. Budgeted to finish in ~15-20 min on axon.
- FULL (`python bench.py --full`, or BENCH_FULL=1): adds the exploratory
  probes — int8 AQT, random-weight predicted routing, balanced-floor spill
  + device-spill, and the queued continuous-batching row repeated 3x with
  min/median (the r4 row swung 3.3x between runs; a single sample is not a
  result). The TPU queue runs this tier separately.

Baseline: 30 ms/image average adaptive inference on the reference's GPU
(README.md:149; BASELINE.md). vs_baseline = baseline_ms / ours_ms (higher is
better). Prints exactly ONE JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS_PER_IMAGE = 30.0
BATCH = 48  # divisible by 3 for balanced binning
SIZE = 256
WARMUP = 5
ITERS = 30
SINGLE_CALLS = 20

# FULL tier: exploratory probes (int8, queued 3x, spill variants, random-
# weight routing). The default tier stays inside the driver's bench window.
_FULL = ("--full" in sys.argv) or os.environ.get("BENCH_FULL", "0") == "1"

# Optional rows each pay remote compiles (~minutes on axon). Once the
# budget is spent, remaining OPTIONAL rows are skipped so the one JSON
# line always prints well inside any outer `timeout` (the primary metric
# is measured first and never skipped). BENCH_BUDGET_S=0 disables.
# Default-tier budget 1500 s: r3's full run walled 1440 s with rc=0 and
# r4's 2427 s was killed; the default tier drops the exploratory probes +
# one large switch compile and orders north-star rows first, so the
# complete line prints with rc=0 (measured default walls: 1104 s before
# the detection/trained rows were re-included).
_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S",
                                 "3600" if _FULL else "1500") or 0)


def _budget_ok(label: str) -> bool:
    if _BUDGET_S and time.perf_counter() - _T0 > _BUDGET_S:
        print(f"bench budget ({_BUDGET_S:.0f}s) exceeded; skipping {label}",
              file=sys.stderr)
        return False
    return True


def _install_emergency_dump(result):
    """If an outer timeout SIGTERMs the run after the primary metric was
    measured, emit the partial JSON line instead of losing the round."""
    import signal

    def handler(signum, frame):
        if "value" in result:
            result["partial"] = True
            if "vs_baseline" not in result:
                result["vs_baseline"] = round(
                    BASELINE_MS_PER_IMAGE / result["value"], 2)
            print(json.dumps(result), flush=True)
        sys.exit(1)

    try:
        signal.signal(signal.SIGTERM, handler)
    except (ValueError, OSError):
        pass  # non-main thread / restricted env

# bf16 peak by device kind; conservative default.
_PEAK_TFLOPS = {"v5e": 197.0, "v5litepod": 197.0, "v4": 275.0, "v6e": 918.0,
                "v5p": 459.0}


def _peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    for k, v in _PEAK_TFLOPS.items():
        if k in kind:
            return v
    return 197.0


def _sync(out):
    """Materialise a scalar from the output. On the axon remote backend,
    block_until_ready alone does not reliably force execution of pure-jit
    call chains until a value has been fetched; a device->host scalar read
    is the dependable sync (see tools/profile_branches.py)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def _time(fn, iters=ITERS, warmup=WARMUP):
    out = None
    for _ in range(warmup):
        out = fn()
    _sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - start) / iters


def _flops_of(jitted, *args) -> float:
    """FLOPs estimate from the lowered (pre-optimization) HLO — avoids a
    second remote compile; falls back to 0 if cost analysis is unavailable."""
    try:
        cost = jitted.lower(*args).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _flops_audit():
    """Per-dispatch-mode GFLOPs audit written by tools/audit_flops.py (CPU
    XLA cost analysis over this config's modules). Returns the dict or None
    when absent/mismatched, so MFU rows self-audit instead of inheriting
    frozen constants (VERDICT r3 item 8)."""
    path = os.environ.get(
        "BENCH_FLOPS_AUDIT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "benchmarks", "flops_audit.json"))
    try:
        with open(path) as f:
            audit = json.load(f)
        if int(audit.get("img_size", 0)) != SIZE:
            return None
        return audit
    except (OSError, ValueError):
        return None


def _default_experiment():
    """First existing full-system experiment, newest round first
    (BENCH_EXPERIMENT env overrides)."""
    exp = os.environ.get("BENCH_EXPERIMENT")
    if exp:
        return exp
    for cand in ("experiments/full_system_r5", "experiments/full_system_r3",
                 "experiments/full_system_r2"):
        if os.path.isfile(os.path.join(cand, "config.yaml")):
            return cand
    return None


def _tuned_artifact(env_key: str, exp_file: str, tracked_file: str) -> str:
    """Resolve a tuning artifact (serving-autotune cache / resolution
    policy): env override -> the live experiment's file -> the tracked
    snapshot under benchmarks/. Experiments live outside git, so a fresh
    workspace (re-provisioned between rounds) has no experiment dirs; the
    committed snapshots carry the idle-host on-chip decisions forward
    (keys are weight-independent: backend/arch/width/dtype/shape +
    jaxlib stamp, so they transfer to bench's parity models)."""
    p = os.environ.get(env_key)
    if p:
        return p
    exp = _default_experiment()
    if exp:
        cand = os.path.join(exp, exp_file)
        if os.path.isfile(cand):
            return cand
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", tracked_file)


def _trained_routing_inputs(bucket: int):
    """Real test images + trained-classifier routing labels.

    Auto-detects the full-system experiment (BENCH_EXPERIMENT env overrides;
    both the experiment and the synthetic corpus live outside git but persist
    in the round workspace). Returns (x_real (3*bucket,...), labels, acc)
    or None when the artifacts are absent (e.g. a fresh clone)."""
    exp = _default_experiment()
    if exp is None:
        return None
    cfg_path = os.path.join(exp, "config.yaml")
    if not os.path.isfile(cfg_path):
        return None
    from adam_dehaze_tpu.config import load_config, update_checkpoint_paths
    config = update_checkpoint_paths(load_config(cfg_path), exp)
    test_root = os.path.join(config["dataset"]["test_path"], "test")
    if not os.path.isdir(test_root):
        return None
    from adam_dehaze_tpu.data.dataset import _imread_rgb
    # FULL test split: accuracy on a first-16-per-level prefix is sampling
    # noise, not a traffic statistic (r3's 89.6% "gap" vs the full split's
    # 95%); load everything and report split-level accuracy, then time on an
    # evenly-spaced representative subset of bucket images per level.
    imgs, gts, keep = [], [], []
    for lbl, level in enumerate(("low", "medium", "high")):
        d = os.path.join(test_root, level, "hazy")
        names = sorted(n for n in os.listdir(d) if n.endswith((".png", ".jpg")))
        if len(names) < bucket:
            return None
        sel = set(np.linspace(0, len(names) - 1, bucket).astype(int).tolist())
        for i, n in enumerate(names):
            imgs.append(_imread_rgb(os.path.join(d, n), SIZE))
            gts.append(lbl)
            keep.append(i in sel)
    x_all = jnp.asarray(np.stack(imgs))
    gts = np.asarray(gts)
    keep = np.asarray(keep)

    # Trained classifier predictions (the only extra compile: one small
    # classifier graph with the trained constants, compiled once at the
    # 3*bucket batch shape and looped over the split with padding).
    from adam_dehaze_tpu.evaluation.evaluate import _load_joint
    router, state = _load_joint(config)
    sub = {"params": state.params["classifier"],
           "batch_stats": state.batch_stats["classifier"]}
    clf = router.classifier
    fwd = jax.jit(lambda im: clf.apply(sub, im)[0])
    chunk = 3 * bucket
    labels = []
    n_all = x_all.shape[0]
    for i in range(0, n_all, chunk):
        part = x_all[i:i + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = jnp.concatenate([part, jnp.tile(part[:1],
                                                   (pad, 1, 1, 1))])
        labels.append(np.asarray(jnp.argmax(fwd(part), axis=1))
                      [:chunk - pad if pad else chunk])
    labels = np.concatenate(labels)[:n_all]
    acc = float((labels == gts).mean())
    return x_all[keep], labels[keep], acc


def main():
    from adam_dehaze_tpu.config import default_config
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier
    from adam_dehaze_tpu.models.routing import (
        BinnedAdaptiveEngine,
        make_adaptive_infer,
        make_device_binned_infer,
    )

    config = default_config()
    on_tpu = jax.default_backend() == "tpu"
    config["tpu"]["use_pallas"] = on_tpu
    config["tpu"]["compute_dtype"] = "bfloat16" if on_tpu else "float32"

    classifier = create_classifier(config)
    branches = create_branch_models(config)

    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    clf_vars = classifier.init({"params": key, "dropout": key}, dummy)
    branch_vars = {n: m.init(jax.random.PRNGKey(i), dummy)
                   for i, (n, m) in enumerate(branches.items())}

    from adam_dehaze_tpu.ops.s2d import (
        make_classifier_serving_apply,
        make_serving_apply,
    )
    serving_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # s2d-stem serving path for the resnet classifier (the 7x7/s2 stem runs
    # at 8% of peak in the canonical layout; see ops/s2d.py:s2d_stem7).
    clf_serving = make_classifier_serving_apply(classifier, clf_vars,
                                                dtype=serving_dtype)
    classifier_apply = jax.jit(clf_serving)
    # make_serving_apply: exact lane-aligned s2d path for the c=32 low
    # branch (ops/s2d.py; ~6x on v5e), canonical apply for medium/high.
    serving_applies = [
        make_serving_apply(branches[n], branch_vars[n], dtype=serving_dtype)
        for n in ("low", "medium", "high")
    ]

    # Consult the serving-autotune cache written by tools/autotune_serving.py
    # (cache HITS only — bench never times candidates itself; the cache only
    # exists once real on-chip measurements produced it, and the chosen
    # dispatch is recorded in the output line). BENCH_AUTOTUNE=0 disables.
    # The cache key is weight-independent (backend/arch/width/dtype/shape),
    # so decisions made on the trained experiment transfer to bench's
    # random-init parity models.
    dispatch_used = {}
    hit_row_ms = {}
    if os.environ.get("BENCH_AUTOTUNE", "1") != "0":
        from adam_dehaze_tpu.serving_autotune import load_cached
        cache_path = _tuned_artifact("BENCH_AUTOTUNE_CACHE",
                                     "serving_autotune.json",
                                     "serving_autotune.json")
        sample_shape = (BATCH // 3, SIZE, SIZE, 3)
        for i, n in enumerate(("low", "medium", "high")):
            try:
                fn, hit = load_cached(branches[n], branch_vars[n],
                                      serving_dtype, sample_shape,
                                      cache_path)
            except Exception as e:
                print(f"autotuned dispatch for {n} failed "
                      f"({type(e).__name__}: {e})", file=sys.stderr)
                continue
            if fn is not None:
                serving_applies[i] = fn
                dispatch_used[n] = hit["best"]
                ms16 = (hit.get("table") or {}).get(hit["best"])
                # Winner ms per 16-batch -> per-row cost for the chunk
                # planner (sample_shape batch is BATCH//3 == 16).
                if ms16:
                    hit_row_ms[n] = float(ms16) / sample_shape[0]
    branch_applies = [jax.jit(f) for f in serving_applies]
    bucket = BATCH // 3
    # Small-bucket ladder so the chunk planner (models/routing.py:
    # plan_chunks) can serve skewed TRAINED traffic without whole-bucket
    # pad waste (18 of a class -> 16+2, not 16+16). Balanced/oracle rows
    # use exactly the 16-bucket program, so the primary row compiles the
    # same program set as the old buckets=(16,) engine; the small-bucket
    # programs compile lazily only when the trained rows first need them.
    # DELIBERATELY coarser than the serving default (1,2,4,8,16,32): every
    # extra bucket size is a lazy remote compile on axon (~1 min each), and
    # {2,4} already caps pad waste at 3 rows (<0.05 ms/image) while
    # bounding the extra compiles at two per branch.
    engine = BinnedAdaptiveEngine(classifier_apply, branch_applies,
                                  buckets=(2, 4, bucket))
    if all(n in hit_row_ms for n in ("low", "medium", "high")):
        row_ms = [hit_row_ms[n] for n in ("low", "medium", "high")]
        if all(r > 0 for r in row_ms):
            engine.set_chunk_costs(0.35, row_ms)

    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    balanced = np.repeat(np.arange(3), bucket)
    skewed = np.full(BATCH, 2)  # all-high: worst-case adaptive FLOPs

    result = {"unit": "ms/image"}
    _install_emergency_dump(result)
    if dispatch_used:
        result["autotuned_dispatch"] = dispatch_used
    try:
        per_iter = _time(lambda: engine(x, intensity=balanced)[0])
        ms = per_iter / BATCH * 1000.0
        result["metric"] = "adaptive_dehaze_ms_per_image_256"
        result["value"] = round(ms, 4)
        result["mode"] = "binned"

        # Fully on-device binning (single program: classify + sort-bin +
        # lax.switch chunks; no host label sync / per-bucket dispatch). Same
        # adaptive accounting as the host engine; if faster it becomes the
        # primary value (mode field records which engine produced it).
        try:
            if not _budget_ok("device_binned"):
                raise RuntimeError("budget")
            dev_fn = jax.jit(make_device_binned_infer(
                clf_serving, serving_applies, chunk=bucket))
            balanced_dev = jnp.asarray(balanced)
            per_iter_dev = _time(lambda: dev_fn(x, balanced_dev)[0])
            result["device_binned_ms_per_image"] = round(
                per_iter_dev / BATCH * 1000.0, 4)
            if per_iter_dev < per_iter:
                result["host_binned_ms_per_image"] = result["value"]
                result["value"] = result["device_binned_ms_per_image"]
                result["mode"] = "device_binned"
                per_iter = per_iter_dev
        except Exception as e:
            print(f"device-binned variant skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)

        # Single-image serving latency through lax.switch (one branch/image).
        # Measured EARLY (right after the primary/device rows): the guarded
        # streamed number is the <5 ms batch-1 north-star proof and must be
        # in the driver-captured artifact even if later rows are skipped
        # (r4's was lost to the outer timeout).
        if _budget_ok("single_image"):
            x1 = x[:1]

            def _switch_rows(fn, prefix):
                """Blocking p50 + streamed latency of a jitted batch-1
                switch program."""
                _sync(fn(x1))
                lat = []
                for _ in range(SINGLE_CALLS):
                    t0 = time.perf_counter()
                    _sync(fn(x1))  # blocking = result actually fetched
                    lat.append((time.perf_counter() - t0) * 1000.0)
                result[f"{prefix}_p50_ms"] = round(
                    float(np.percentile(lat, 50)), 3)
                t0 = time.perf_counter()
                outs = [fn(x1) for _ in range(SINGLE_CALLS)]
                _sync(outs[-1])
                result[f"{prefix}_streamed_ms"] = round(
                    (time.perf_counter() - t0) / SINGLE_CALLS * 1000.0, 3)

            # The plain (full-res) switch is a second large compile whose
            # row duplicates the guarded one's role — FULL tier only,
            # unless no tuned resolution policy exists (then it IS the
            # batch-1 row and runs in the default tier, see below).
            if _FULL:
                _switch_rows(jax.jit(make_adaptive_infer(
                    clf_serving, serving_applies, mode="switch")),
                    "single_image")
            # Guarded-policy batch-1 row (VERDICT r3 item 2: the cheapest
            # latency dial had no single-image number): the SAME direct
            # lax.switch program, with lowres-dispatched branch applies per
            # the experiment's tuned resolution policy. No scan wrapper —
            # batch-1 goes straight through one switch.
            try:
                from adam_dehaze_tpu.resolution_autotune import (
                    load_policy,
                    policy_to_lowres,
                )
                pol = load_policy(_tuned_artifact(
                    "BENCH_RESOLUTION_POLICY", "resolution_policy.json",
                    "resolution_policy.json"))
                lowres_g = policy_to_lowres(pol) if pol else {}
                if lowres_g:
                    from adam_dehaze_tpu.ops.resolution import (
                        make_lowres_apply,
                    )
                    g_applies1 = [
                        make_lowres_apply(f, scale=lowres_g[n]["scale"],
                                          mode=lowres_g[n]["mode"],
                                          radius=lowres_g[n]["radius"])
                        if n in lowres_g else f
                        for n, f in zip(("low", "medium", "high"),
                                        serving_applies)]
                    _switch_rows(jax.jit(make_adaptive_infer(
                        clf_serving, g_applies1, mode="switch")),
                        "single_image_guarded")
                elif not _FULL:
                    # no tuned policy: the plain switch is the only
                    # batch-1 program — measure it in the default tier.
                    _switch_rows(jax.jit(make_adaptive_infer(
                        clf_serving, serving_applies, mode="switch")),
                        "single_image")
            except Exception as e:
                print(f"guarded single-image variant skipped "
                      f"({type(e).__name__}: {e})", file=sys.stderr)

        # Full-pipeline latency incl. detection (BASELINE.md TPU north
        # star: HDEN -> CORUN -> detection < 5 ms/image on one chip). Dense
        # FCOS forward + ImageNet renormalisation + fused on-device top-k
        # in ONE jitted program chained onto the adaptive engine; the host
        # NMS over <= 300 candidates is numpy microseconds and excluded.
        try:
            if not _budget_ok("detection_pipeline"):
                raise RuntimeError("budget")
            from adam_dehaze_tpu.models.detection import (
                IMAGENET_MEAN,
                IMAGENET_STD,
                _device_topk,
                create_detection_model,
            )
            det = create_detection_model(config)
            det_vars = det.module.init(jax.random.PRNGKey(7),
                                       jnp.zeros((1, SIZE, SIZE, 3),
                                                 jnp.float32))
            det_pipe = jax.jit(lambda v, img: _device_topk(
                det.module.apply(v, (img - IMAGENET_MEAN) / IMAGENET_STD),
                det.topk))

            def _pipeline():
                dehazed = engine(x, intensity=balanced)[0]
                return det_pipe(det_vars, dehazed)[0]["scores"]

            per_iter_det = _time(_pipeline, iters=max(ITERS // 3, 5))
            result["with_detection_ms_per_image"] = round(
                per_iter_det / BATCH * 1000.0, 4)
            # overhead vs the same (host-binned) engine the pipeline chains
            host_ms = result.get("host_binned_ms_per_image", result["value"])
            result["detection_overhead_ms_per_image"] = round(
                per_iter_det / BATCH * 1000.0 - host_ms, 4)
        except Exception as e:
            print(f"detection pipeline variant skipped "
                  f"({type(e).__name__}: {e})", file=sys.stderr)

        # TRAINED-classifier routing (round-2 verdict item #6): real test
        # images from the committed full-system experiment, binned by the
        # trained classifier's actual predictions. Branch cost depends only
        # on shapes, so the already-compiled engine programs are reused with
        # the trained labels — no second full-pipeline compile; only the
        # trained classifier itself compiles (small graph).
        try:
            trained = (_trained_routing_inputs(bucket)
                       if _budget_ok("trained_routing") else None)
            if trained is not None:
                x_real, labels_trained, acc = trained
                # Full ITERS for the trained/spill family: these rows are
                # DELTAS against the primary (also full ITERS); at //3 the
                # pipeline-drain tail amortizes differently and manufactures
                # a ~0.3-0.5 ms/image phantom gap (probe_trained_gap.py
                # measured spill == oracle interleaved; round_results/
                # trained_gap_probe.json).
                per_iter_tr = _time(
                    lambda: engine(x_real, intensity=labels_trained)[0],
                    iters=ITERS)
                ms_tr = per_iter_tr / BATCH * 1000.0
                result["predicted_routing_trained_ms_per_image"] = round(
                    ms_tr, 4)
                result["trained_routing_acc"] = round(acc, 4)
                # ms_tr is host-binned: subtract the HOST engine's oracle
                # number even when the device engine took result["value"],
                # so the field isolates routing-skew cost, not engine choice.
                oracle_host = result.get("host_binned_ms_per_image",
                                         result["value"])
                result["predicted_trained_minus_oracle_ms"] = round(
                    ms_tr - oracle_host, 4)
                # Capacity-spill serving (models/routing.py:
                # plan_capacity_spill): overflow images beyond a class's
                # bucket capacity are served by a neighboring branch's free
                # pad slots, so skewed REAL traffic reuses exactly the
                # balanced program set instead of paying an extra padded
                # bucket dispatch. Same compiled programs — no extra
                # compile. FULL tier: spill_up below is the production
                # policy; the unconstrained balanced-floor row is a bound.
                if _FULL:
                    per_iter_sp = _time(
                        lambda: engine(x_real, intensity=labels_trained,
                                       spill=True)[0],
                        iters=ITERS)
                    result["spill_routing_trained_ms_per_image"] = round(
                        per_iter_sp / BATCH * 1000.0, 4)
                # Quality-guarded up-only spill (round 4): overflow moves
                # only to stronger branches; residual overflow pays a
                # planned small bucket. Cost sits between spill (balanced
                # floor) and fidelity; quality stays at fidelity level
                # (evaluate_hard_routing's spill_up row).
                per_iter_spu = _time(
                    lambda: engine(x_real, intensity=labels_trained,
                                   spill="up")[0],
                    iters=ITERS)
                result["spill_up_routing_trained_ms_per_image"] = round(
                    per_iter_spu / BATCH * 1000.0, 4)
                # Same skew fix in the single-program engine: the on-device
                # capacity plan (_device_capacity_labels) removes the
                # partially-filled extra chunk. One extra (large) compile —
                # FULL tier only.
                try:
                    if not _FULL:
                        raise RuntimeError("full tier only")
                    dev_sp = jax.jit(make_device_binned_infer(
                        clf_serving, serving_applies, chunk=bucket,
                        spill=True))
                    lab_dev = jnp.asarray(labels_trained)
                    per_iter_dsp = _time(
                        lambda: dev_sp(x_real, lab_dev)[0],
                        iters=ITERS)
                    result["device_spill_trained_ms_per_image"] = round(
                        per_iter_dsp / BATCH * 1000.0, 4)
                except Exception as e:
                    print(f"device-spill variant skipped "
                          f"({type(e).__name__}: {e})", file=sys.stderr)
                # Queued serving (continuous batching, run_queued): the
                # trained traffic arrives as three ~pure-class batches of
                # `bucket` — exactly the class-clumped case where fidelity
                # pays extra padded programs and spill pays quality. The
                # queue dispatches only FULL same-class buckets, so the
                # cost should sit at the balanced floor with fidelity
                # outputs. Reuses the branch applies already compiled at
                # bucket shape via engine.branch_applies.
                try:
                    if not _FULL:
                        raise RuntimeError("full tier only")
                    qbatches = [x_real[i:i + bucket]
                                for i in range(0, x_real.shape[0], bucket)]
                    qlabels = [labels_trained[i:i + bucket]
                               for i in range(0, x_real.shape[0], bucket)]

                    # Loop+drain methodology (r5, tools/
                    # probe_queued_variance.py): syncing only the final
                    # yielded bucket lets earlier calls' work cross the
                    # timer line — the r4 "2.09 vs 6.86 swing" was exactly
                    # this (an unbacklogged process under-measures ~1.0-1.5
                    # ms/image, a backlogged one pays the previous rows'
                    # tail; reproduced on an idle host, queued_variance_r5
                    # .json). Each rep now times the loop AND the drain of
                    # every per-call device-side accumulator, so the total
                    # is the honest steady-state cost. 3 reps, min + median.
                    q_iters = max(ITERS // 3, 5)
                    reps = []
                    for _ in range(3):
                        accs = []

                        def _run_q():
                            acc = None
                            # Queue composition follows the TRAINED labels
                            # (the row's name says trained traffic); the
                            # engine's classifier still runs for cost
                            # realism.
                            for out, _g, _c in engine.run_queued(
                                    qbatches, queue_bucket=bucket,
                                    intensities=qlabels):
                                s = jnp.sum(out)
                                acc = s if acc is None else acc + s
                            accs.append(acc)
                            return acc

                        per_iter_q = _time(_run_q, iters=q_iters)
                        t_dr = time.perf_counter()
                        for a in accs:
                            float(jnp.sum(a))
                        drain = (time.perf_counter() - t_dr) / q_iters
                        reps.append((per_iter_q + drain) / BATCH * 1000.0)
                    result["queued_routing_trained_ms_per_image"] = round(
                        min(reps), 4)
                    result["queued_routing_trained_ms_median"] = round(
                        float(np.median(reps)), 4)
                    result["queued_routing_trained_ms_samples"] = [
                        round(r, 4) for r in reps]
                except Exception as e:
                    print(f"queued variant skipped "
                          f"({type(e).__name__}: {e})", file=sys.stderr)
        except Exception as e:
            print(f"trained-routing variant skipped "
                  f"({type(e).__name__}: {e})", file=sys.stderr)

        # Steady-state stream throughput: run_stream overlaps batch k+1's
        # classifier with batch k's label fetch + dispatch, so this is the
        # serving-relevant imgs/sec (latency-per-batch is the primary).
        # The end-of-stream sync forces only the last batch, so up to the
        # in-flight tail (1-2 of n_stream=12 batches) can cross the timer
        # line — a bounded <=~15% optimism, accepted for cross-round
        # comparability (see tools/probe_queued_variance.py for the
        # unbounded variant of this effect in the queued row, fixed below).
        if _budget_ok("stream"):
            n_stream = 12
            for _ in engine.run_stream([x] * 2, intensities=[balanced] * 2):
                pass  # warm
            t0 = time.perf_counter()
            last = None
            for out, _lab in engine.run_stream(
                    [x] * n_stream, intensities=[balanced] * n_stream):
                last = out
            _sync(last)
            stream_per_img = (time.perf_counter() - t0) / (n_stream * BATCH)
            result["stream_ms_per_image"] = round(stream_per_img * 1000.0, 4)
            result["stream_imgs_per_sec_per_chip"] = round(
                1.0 / stream_per_img, 1)

        # Device-binned async stream (the headline serving mode, round-2
        # verdict item #2): depth-2 pipeline of the single on-device binned
        # program — dispatch of batch k+2 overlaps compute of k+1 and the
        # label fetch of k. Images stay device-resident; per batch only the
        # routing labels are fetched (matches logs/stream_probe.log's
        # accounting). This is the imgs/sec a production server sustains.
        try:
            if "device_binned_ms_per_image" not in result:
                raise RuntimeError("device-binned engine unavailable")
            if not _budget_ok("device_binned_stream"):
                raise RuntimeError("budget")
            n_dev_stream = 12
            labels_dev = jnp.asarray(balanced)
            def _dev_stream(n_batches, depth):
                pending = []
                for _ in range(n_batches):
                    pending.append(dev_fn(x, labels_dev))
                    if len(pending) >= depth:
                        out, inten, _ = pending.pop(0)
                        np.asarray(inten)
                last = None
                for out, inten, _ in pending:
                    np.asarray(inten)
                    last = out
                _sync(last)
            # Depth sweep: deeper pipelines hide more dispatch/fetch under
            # device compute (r2's 1.67 ms probe held 3 batches in flight);
            # the compiled program is reused so extra depths are cheap.
            best = (float("inf"), 0)
            for depth in (2, 3, 4):
                _dev_stream(2, depth)  # warm
                t0 = time.perf_counter()
                _dev_stream(n_dev_stream, depth)
                per_img = (time.perf_counter() - t0) / (n_dev_stream * BATCH)
                best = min(best, (per_img, depth))
            dev_stream_per_img, best_depth = best
            result["device_binned_stream_ms_per_image"] = round(
                dev_stream_per_img * 1000.0, 4)
            result["device_binned_stream_imgs_per_sec"] = round(
                1.0 / dev_stream_per_img, 1)
            result["device_binned_stream_depth"] = best_depth
        except Exception as e:
            print(f"device-binned stream skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)

        # Skewed (all-high) traffic: same compiled programs, no oracle balance.
        if _budget_ok("skewed"):
            per_iter_skew = _time(lambda: engine(x, intensity=skewed)[0],
                                  iters=max(ITERS // 3, 5))
            result["skewed_all_high_ms_per_image"] = round(
                per_iter_skew / BATCH * 1000.0, 4)

        # Resolution-scheduled serving (ops/resolution.py): medium+high run
        # at half resolution, their residual corrections lifted back by an
        # on-device guided filter. Cost row here; the quality side is
        # measured on the trained system in benchmarks/round_results/
        # resolution_scheduling.json (tools/probe_lowres.py — medhigh
        # guided r4 scored ABOVE full-res on the v2 corpus).
        try:
            if not _budget_ok("lowres"):
                raise RuntimeError("budget")
            from adam_dehaze_tpu.ops.resolution import make_lowres_apply
            lowres_applies = [branch_applies[0]] + [
                jax.jit(make_lowres_apply(f)) for f in serving_applies[1:]]
            engine_lr = BinnedAdaptiveEngine(classifier_apply, lowres_applies,
                                             buckets=(bucket,))
            per_iter_lr = _time(lambda: engine_lr(x, intensity=balanced)[0],
                                iters=max(ITERS // 3, 5))
            result["lowres_medhigh_ms_per_image"] = round(
                per_iter_lr / BATCH * 1000.0, 4)
        except Exception as e:
            print(f"lowres variant skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)

        # Quality-GUARDED resolution dispatch (resolution_autotune.py): the
        # per-branch {full, lowres} policy tuned on the trained experiment's
        # held-out val probe with a PSNR floor (tools/autotune_resolution.py
        # writes it; quality evidence lives in round_results/
        # resolution_policy_r3.json). Like the serving-autotune cache, the
        # DECISION comes from trained weights while the cost transfers to
        # bench's parity models (cost depends only on shapes).
        try:
            if not _budget_ok("guarded_lowres"):
                raise RuntimeError("budget")
            from adam_dehaze_tpu.resolution_autotune import (
                load_policy,
                policy_to_lowres,
            )
            pol_path = _tuned_artifact("BENCH_RESOLUTION_POLICY",
                                       "resolution_policy.json",
                                       "resolution_policy.json")
            policy = load_policy(pol_path)
            if policy is not None:
                lowres = policy_to_lowres(policy)
                result["resolution_policy"] = {
                    lvl: policy["levels"][lvl].get("choice", "full")
                    for lvl in ("low", "medium", "high")
                    if lvl in policy.get("levels", {})}
                if not lowres:
                    # policy says full everywhere: the guarded number IS the
                    # primary; record that without re-measuring.
                    result["guarded_lowres_ms_per_image"] = result["value"]
                elif (set(lowres) == {"medium", "high"} and all(
                        p == {"scale": 2, "mode": "guided", "radius": 4}
                        for p in lowres.values())
                        and "lowres_medhigh_ms_per_image" in result):
                    # identical dial to the row above — reuse, don't recompile
                    result["guarded_lowres_ms_per_image"] = result[
                        "lowres_medhigh_ms_per_image"]
                else:
                    from adam_dehaze_tpu.ops.resolution import (
                        make_lowres_apply,
                    )
                    g_applies = [
                        jax.jit(make_lowres_apply(
                            f, scale=lowres[n]["scale"],
                            mode=lowres[n]["mode"],
                            radius=lowres[n]["radius"]))
                        if n in lowres else branch_applies[i]
                        for i, (n, f) in enumerate(
                            zip(("low", "medium", "high"), serving_applies))]
                    engine_g = BinnedAdaptiveEngine(
                        classifier_apply, g_applies, buckets=(bucket,))
                    per_iter_g = _time(
                        lambda: engine_g(x, intensity=balanced)[0],
                        iters=max(ITERS // 3, 5))
                    result["guarded_lowres_ms_per_image"] = round(
                        per_iter_g / BATCH * 1000.0, 4)
                # Mode-correct MFU for the guarded row: lowres levels use
                # their audited lowres FLOPs, not the full-res constants
                # (VERDICT r3 item 8 — the silent inheritance this fixes).
                audit = _flops_audit()
                g_ms = result.get("guarded_lowres_ms_per_image")
                if audit and g_ms:
                    per_image_g = audit["classifier"] + sum(
                        audit.get("lowres", {}).get(
                            f"{n}@{lowres[n]['scale']}-{lowres[n]['mode']}"
                            f"-{lowres[n]['radius']}",
                            audit["branches"][n])
                        if n in lowres else audit["branches"][n]
                        for n in ("low", "medium", "high")) / 3.0
                    result["guarded_lowres_gflops_per_image"] = round(
                        per_image_g, 1)
                    result["guarded_lowres_mfu_pct"] = round(
                        (per_image_g * 1e9 / (g_ms / 1e3))
                        / (_peak_tflops() * 1e12) * 100.0, 1)
        except Exception as e:
            print(f"guarded-lowres variant skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)

        # Non-oracle routing: classifier argmax decides the bins (random-
        # weight classifier => arbitrary skew incl. bucket padding waste).
        # FULL tier: the trained-routing family below is the row that
        # matters; random-weight skew is exploratory.
        if _FULL and _budget_ok("predicted_routing"):
            per_iter_pred = _time(lambda: engine(x)[0],
                                  iters=max(ITERS // 3, 5))
            result["predicted_routing_ms_per_image"] = round(
                per_iter_pred / BATCH * 1000.0, 4)

        # Measured-FLOPs MFU for the balanced primary metric.
        xb = x[:bucket]
        flops_iter = _flops_of(engine.classifier_apply, x) + sum(
            _flops_of(f, xb) for f in engine.branch_applies)
        result["flops_source"] = "xla_cost_analysis"
        if flops_iter <= 0:
            # cost_analysis is unavailable on the axon remote backend.
            # Prefer the per-dispatch-mode audit regenerated from THIS
            # config's modules by tools/audit_flops.py (CPU cost analysis of
            # identical traces — FLOPs are backend-independent); fall back
            # to the round-2 PARITY.md constants only when no audit exists.
            audit = _flops_audit()
            if audit:
                per_image = audit["classifier"] + sum(
                    audit["branches"][n]
                    for n in ("low", "medium", "high")) / 3.0
                flops_iter = per_image * 1e9 * BATCH
                result["flops_source"] = "cpu_cost_analysis_audit"
            else:
                _GFLOPS = {"classifier": 4.4, "low": 8.7, "medium": 110.9,
                           "high": 249.2}
                per_image = _GFLOPS["classifier"] + (
                    _GFLOPS["low"] + _GFLOPS["medium"] + _GFLOPS["high"]) / 3.0
                flops_iter = per_image * 1e9 * BATCH
                result["flops_source"] = "parity_constants"
        peak = _peak_tflops()
        result["measured_gflops_per_image"] = round(flops_iter / BATCH / 1e9, 1)
        result["mfu_pct"] = round(
            (flops_iter / per_iter) / (peak * 1e12) * 100.0, 1)
        result["assumed_peak_tflops"] = peak

        # Int8 serving variant (ops/quant.py): same params, dynamic AQT
        # quantization of every ConvBlock conv; v5e int8 peak ~2x bf16.
        # NOTE: must wrap the RAW (unjitted) applies — wrapping an
        # already-jitted fn reuses its cached bf16 executable and silently
        # measures the wrong thing.
        try:
            if not _FULL:
                raise RuntimeError("full tier only")
            if not _budget_ok("int8"):
                raise RuntimeError("budget")
            from adam_dehaze_tpu.ops.quant import quantize_apply
            engine_q = BinnedAdaptiveEngine(
                classifier_apply,
                [quantize_apply(
                    lambda im, v=branch_vars[n], m=branches[n]: m.apply(v, im))
                 for n in ("low", "medium", "high")],
                buckets=(bucket,))
            per_iter_q = _time(lambda: engine_q(x, intensity=balanced)[0],
                               iters=max(ITERS // 2, 5))
            result["int8_ms_per_image"] = round(per_iter_q / BATCH * 1000.0, 4)
            # Measured bound (tools/probe_int8.py, logs/probe_int8b.log):
            # XLA on this backend lowers the AQT conv to bf16 (no int8 MXU
            # path), and even hand-built s8xs8->s32 convs/matmuls top out at
            # 1.04x / go 0.75-0.87x at serving shapes — so this field tracks
            # the AQT path's cost, not an int8 speedup.
            result["int8_lowering"] = "bf16"
        except Exception as e:
            print(f"int8 variant skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)

    except Exception as e:  # never lose the benchmark round entirely
        print(f"binned engine failed ({type(e).__name__}: {e}); "
              "reporting the soft blend under its own metric name",
              file=sys.stderr)

        @jax.jit
        def soft(images):
            logits, _ = classifier.apply(clf_vars, images)
            w = jax.nn.softmax(logits / 0.5, axis=1)
            ys = [f(images) for f in branch_applies]
            return sum(w[:, i, None, None, None] * y for i, y in enumerate(ys))

        per_iter = _time(lambda: soft(x))
        ms = per_iter / BATCH * 1000.0
        # DIFFERENT metric name: 3x-FLOPs accounting must not pollute the
        # binned trend line (round-1 verdict, weakness #3).
        result["metric"] = "adaptive_dehaze_soft_fallback_ms_per_image_256"
        result["value"] = round(ms, 4)
        result["mode"] = "soft_fallback"

    # Throughput headline = the fastest serving mode (per-batch latency or a
    # pipelined stream); the primary `value` stays the per-batch latency so
    # the round-over-round trend is unbroken.
    best_ms = min(result["value"],
                  result.get("stream_ms_per_image", float("inf")),
                  result.get("device_binned_stream_ms_per_image",
                             float("inf")))
    result["best_serving_ms_per_image"] = round(best_ms, 4)
    result["imgs_per_sec_per_chip"] = round(1000.0 / best_ms, 1)
    result["vs_baseline"] = round(BASELINE_MS_PER_IMAGE / result["value"], 2)
    result["bench_wall_s"] = round(time.perf_counter() - _T0, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
