#!/usr/bin/env python
"""Cold-start probe: time-to-first-batch-served, plain jit vs a
precompiled serving bundle (serving_export.py).

The bundle's value claim is cold start: on the axon runtime the serving
program set costs minutes of terminal-side compiles that no persistent
cache can absorb (CLAUDE.md), while `deserialize_and_load` hands PJRT an
already-compiled executable. This probe measures the claim end to end on
the trained experiment, in FRESH subprocesses (in-process jit caches would
flatter whichever mode runs second):

  python tools/probe_cold_start.py run [EXP_DIR]      # orchestrate all
  python tools/probe_cold_start.py export [EXP_DIR]   # one-time bundle
  python tools/probe_cold_start.py measure {plain|bundle} [EXP_DIR]

`measure` prints one JSON line with a timeline (imports done, experiment
loaded, first 48-batch served, steady-state batch) timed from process
start; `run` writes both timelines plus the export cost to
benchmarks/round_results/cold_start_r3.json.

Timing rule (CLAUDE.md): every stage boundary fetches a device->host
scalar, so "first batch served" means pixels actually materialized on the
host, not an enqueued program.
"""
import json
import os
import subprocess
import sys
import time

_T0 = time.time()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_EXP = "experiments/full_system_r3"
BATCH = 48
OUT_JSON = "benchmarks/round_results/cold_start_r3.json"


def _bundle_dir(exp_dir):
    return os.path.join(exp_dir, "precompiled")


def do_export(exp_dir):
    import numpy as np

    from adam_dehaze_tpu.serving import AdaptiveDehazer

    t0 = time.time()
    dehazer = AdaptiveDehazer.from_experiment(exp_dir)
    t_load = time.time() - t0
    t0 = time.time()
    written = dehazer.export_precompiled(
        _bundle_dir(exp_dir), batch_sizes=(BATCH,), queue_buckets=(16,),
        device_buckets=(16, BATCH), progress=lambda m: print(f"  {m}",
                                                             flush=True))
    t_export = time.time() - t0
    # Sanity: a bundle-backed engine serves the exported shape.
    rng = np.random.default_rng(0)
    img = dehazer.config["dataset"]["img_size"]
    x = rng.random((BATCH, img, img, 3), dtype=np.float32)
    want, i_want = dehazer.route_hard(x)
    fresh = AdaptiveDehazer.from_experiment(exp_dir, precompiled="auto")
    got, i_got = fresh.route_hard(x)
    np.testing.assert_array_equal(i_got, i_want)
    err = float(np.max(np.abs(got.astype(np.float64) - want)))
    line = {"programs": len(written), "export_s": round(t_export, 2),
            "loader_s": round(t_load, 2), "bundle_vs_plain_max_err": err}
    print(json.dumps({"export": line}), flush=True)
    return line


def do_measure(mode, exp_dir):
    import numpy as np  # noqa: imports timed into the cold start

    from adam_dehaze_tpu.serving import AdaptiveDehazer

    t_imports = time.time() - _T0
    pre = _bundle_dir(exp_dir) if mode == "bundle" else None
    t0 = time.time()
    dehazer = AdaptiveDehazer.from_experiment(exp_dir, precompiled=pre)
    t_load = time.time() - t0
    if mode == "bundle" and not dehazer._bundle_table:
        raise SystemExit("bundle mode but no bundle attached — run "
                         f"`probe_cold_start.py export {exp_dir}` first")
    img = dehazer.config["dataset"]["img_size"]
    rng = np.random.default_rng(0)
    x = rng.random((BATCH, img, img, 3), dtype=np.float32)
    # Engine construction = serving-apply building (BN folds, s2d weight
    # transforms — small device programs either way), separated from the
    # first dispatch so the compile-vs-load story is attributable.
    t0 = time.time()
    engine = dehazer._binned_engine()
    t_engine = time.time() - t0
    t0 = time.time()
    out, _ = dehazer.route_hard(x)          # np.asarray inside = host fetch
    t_first = time.time() - t0
    float(out.sum())
    t0 = time.time()
    out, _ = dehazer.route_hard(x)
    t_steady = time.time() - t0
    # Deployment-realistic warm: invoke EVERY (class, bucket) step program
    # + classifier + logits once — what a production service pays before
    # arbitrary traffic stops triggering compiles. Bundle mode should pay
    # execution only; plain jit pays every compile.
    import jax.numpy as jnp
    xj = jnp.asarray(x)
    t0 = time.time()
    _ = np.asarray(engine._classify(xj))
    _ = np.asarray(engine._logits(xj))
    outj = jnp.zeros_like(xj)
    for step in engine._bucket_steps:
        for b in engine.buckets:
            idx = jnp.arange(b, dtype=jnp.int32)
            outj = step(xj, idx, outj)
    float(jnp.sum(outj))
    t_warm = time.time() - t0
    line = {"mode": mode, "imports_s": round(t_imports, 2),
            "load_s": round(t_load, 2),
            "engine_build_s": round(t_engine, 2),
            "first_batch_s": round(t_first, 2),
            "steady_batch_s": round(t_steady, 3),
            "warm_all_buckets_s": round(t_warm, 2),
            "cold_start_s": round(t_imports + t_load + t_engine + t_first,
                                  2),
            "fully_warm_s": round(t_imports + t_load + t_engine + t_first
                                  + t_warm, 2)}
    if mode == "bundle":
        # Diagnose: every program above must be a bundle HIT (a miss means
        # a silent jit fallback compile ate the cold start).
        from adam_dehaze_tpu.serving_export import PrecompiledDispatch
        hm = {}
        for name, fn in [("classify", engine._classify),
                         ("logits", engine._logits)] + [
                (f"step{i}", s) for i, s in enumerate(engine._bucket_steps)]:
            if isinstance(fn, PrecompiledDispatch):
                hm[name] = [fn.hits, fn.misses]
        line["dispatch_hits_misses"] = hm
    print(json.dumps(line), flush=True)
    return line


def do_run(exp_dir):
    me = os.path.abspath(__file__)
    results = {"batch": BATCH, "experiment": exp_dir}
    if not os.path.isdir(_bundle_dir(exp_dir)):
        out = subprocess.run([sys.executable, me, "export", exp_dir],
                             capture_output=True, text=True)
        print(out.stdout[-2000:], out.stderr[-1000:], flush=True)
        out.check_returncode()
        results["export"] = json.loads(
            [ln for ln in out.stdout.splitlines()
             if ln.startswith('{"export"')][-1])["export"]
    for mode in ("bundle", "plain"):
        out = subprocess.run([sys.executable, me, "measure", mode, exp_dir],
                             capture_output=True, text=True)
        print(out.stdout[-2000:], out.stderr[-1000:], flush=True)
        out.check_returncode()
        results[mode] = json.loads(
            [ln for ln in out.stdout.splitlines()
             if ln.startswith('{"mode"')][-1])
    results["speedup_cold_start"] = round(
        results["plain"]["cold_start_s"] / results["bundle"]["cold_start_s"],
        2)
    results["speedup_fully_warm"] = round(
        results["plain"]["fully_warm_s"] / results["bundle"]["fully_warm_s"],
        2)
    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(json.dumps(results), flush=True)


def main():
    args = sys.argv[1:]
    if not args or args[0] not in ("run", "export", "measure"):
        raise SystemExit(__doc__)
    if args[0] == "measure":
        do_measure(args[1], args[2] if len(args) > 2 else DEFAULT_EXP)
    elif args[0] == "export":
        do_export(args[1] if len(args) > 1 else DEFAULT_EXP)
    else:
        do_run(args[1] if len(args) > 1 else DEFAULT_EXP)


if __name__ == "__main__":
    main()
