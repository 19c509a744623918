#!/usr/bin/env python
"""Per-dispatch-mode FLOPs audit via XLA cost analysis (CPU-side).

VERDICT r3 item 8: bench.py's MFU rested on frozen per-branch GFLOP
constants measured once in round 2, and the guarded-lowres row silently
inherited full-resolution constants. XLA cost analysis is unavailable on the
axon remote backend, so this tool recomputes the numbers where it IS
available — a forced-CPU process lowering the SAME module applies bench
serves — and records them in benchmarks/flops_audit.json. bench.py prefers
this audit over the constants (flops_source: "cpu_cost_analysis_audit") and
uses the lowres entries to report a mode-correct guarded-lowres MFU.

FLOPs are backend-independent (pre-optimization HLO of identical traces), so
CPU-lowered counts transfer to the TPU run.

Usage:
  python tools/audit_flops.py [--config cfg.yaml] \
      [--experiment experiments/full_system_r3] [--out benchmarks/flops_audit.json]
"""
import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def lowres_key(level: str, p: dict) -> str:
    return f"{level}@{p['scale']}-{p['mode']}-{p['radius']}"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("--experiment", default="experiments/full_system_r3",
                   help="Experiment dir whose resolution_policy.json defines "
                        "the lowres modes to audit (missing file = audit "
                        "full-res only)")
    p.add_argument("--out", default=os.path.join(ROOT, "benchmarks",
                                                 "flops_audit.json"))
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adam_dehaze_tpu.config import load_config
    from adam_dehaze_tpu.models.branches import create_branch_models
    from adam_dehaze_tpu.models.classifier import create_classifier

    config = load_config(args.config)
    img = config["dataset"]["img_size"]
    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, img, img, 3), jnp.float32)

    def flops_of(fn, *a):
        cost = jax.jit(fn).lower(*a).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    audit = {"img_size": img, "unit": "gflops_per_image",
             "source": "xla_cost_analysis_cpu"}

    clf = create_classifier(config)
    clf_vars = clf.init(key, x1)
    audit["classifier"] = flops_of(
        lambda im: clf.apply(clf_vars, im), x1) / 1e9

    branches = create_branch_models(config)
    branch_vars = {}
    audit["branches"] = {}
    for lvl, module in branches.items():
        v = module.init(key, x1)
        branch_vars[lvl] = v
        audit["branches"][lvl] = flops_of(
            lambda im, m=module, vv=v: m.apply(vv, im), x1) / 1e9

    # Lowres dispatch modes from the experiment's tuned policy.
    audit["lowres"] = {}
    policy_path = os.path.join(args.experiment, "resolution_policy.json")
    if os.path.isfile(policy_path):
        from adam_dehaze_tpu.ops.resolution import make_lowres_apply
        from adam_dehaze_tpu.resolution_autotune import (load_policy,
                                                         policy_to_lowres)
        policy = load_policy(policy_path)
        lowres = policy_to_lowres(policy)
        for lvl, prm in lowres.items():
            module, v = branches[lvl], branch_vars[lvl]
            fn = make_lowres_apply(
                lambda im, m=module, vv=v: m.apply(vv, im),
                scale=prm["scale"], mode=prm["mode"], radius=prm["radius"])
            audit["lowres"][lowres_key(lvl, prm)] = flops_of(fn, x1) / 1e9
        audit["policy"] = {lvl: dict(prm) for lvl, prm in lowres.items()}
    else:
        print(f"no resolution policy at {policy_path}; "
              "auditing full-res modes only")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(audit, f, indent=1)
    print(json.dumps(audit, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
