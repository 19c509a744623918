#!/usr/bin/env python
"""Does fitting the LPIPS heads actually buy anything? Measure it.

Round-4 result (benchmarks/round_results/lpips_cal_r4.txt): fitted heads
scored 0.9911 val ranking accuracy vs 0.9917 for UNIFORM heads on the same
in-distribution validation pairs — the fit changed the label without
evidence of improving the metric (VERDICT r4 weak #4). This tool runs the
decisive protocol and commits the decision:

1. LEAVE-ONE-FAMILY-OUT generalisation: for each of the 6 distortion
   families (tools/calibrate_lpips.py), fit heads on the other 5 families'
   ranking pairs and test on pairs that involve the held-out family only.
   A metric is only useful on distortions it was not fit on; this is the
   honest generalisation number (the r4 val split shared families with
   train).
2. MARGIN distributions: the normalised ranking margin
   (d_worse - d_better) / (d_worse + d_better) on held-out pairs, fitted
   vs uniform. Accuracy ties can hide a real margin difference (the r4
   "sharpens margins" claim, asserted but never measured).
3. Decision rule, written into the JSON artifact: fitted wins only if it
   improves BOTH mean held-out accuracy and mean held-out margin;
   otherwise uniform heads on the seeded trunk are the calibration
   default, and PARITY.md documents that.

Usage:
  python tools/justify_lpips_calibration.py \
      [--corpus data/synthetic_corpus_v2] [--patches 120] \
      [--out benchmarks/round_results/lpips_justify_r5.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus", default="data/synthetic_corpus_v2")
    p.add_argument("--patches", type=int, default=120)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out",
                   default="benchmarks/round_results/lpips_justify_r5.json")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    import calibrate_lpips as cal
    from adam_dehaze_tpu.losses.lpips import LPIPS, _SCALE, _SHIFT
    from adam_dehaze_tpu.nn.alexnet import AlexNetFeatures
    from adam_dehaze_tpu.ops.image import psnr as batched_psnr
    from adam_dehaze_tpu.ops.image import ssim_gray as batched_ssim_gray

    rng = np.random.default_rng(args.seed)
    refs = cal.load_patches(args.corpus, args.patches, args.size, rng)
    fams = {"blur": cal._blur, "noise": cal._noise(rng), "fog": cal._fog,
            "quant": cal._quant, "pixelate": cal._pixelate,
            "contrast": cal._contrast}
    fam_names = sorted(fams)
    n_lvl = 3

    dist = np.stack([
        np.stack([np.stack([fams[f](r, lvl) for lvl in range(n_lvl)])
                  for f in fam_names])
        for r in refs]).astype(np.float32)
    P, F, L = dist.shape[:3]
    flat = dist.reshape(P * F * L, args.size, args.size, 3)
    rep = np.repeat(refs, F * L, axis=0)
    psnr = np.asarray(batched_psnr(jnp.asarray(flat),
                                   jnp.asarray(rep))).reshape(P, F, L)
    ssim = np.asarray(batched_ssim_gray(jnp.asarray(flat),
                                        jnp.asarray(rep))).reshape(P, F, L)

    # Per-layer channel-mean feature distances (same fixed seeded trunk as
    # calibrate_lpips.py / ImageQualityMetrics).
    lpips = LPIPS()
    dummy = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    base_params = lpips.init(jax.random.PRNGKey(0), dummy, dummy)
    trunk = base_params["params"]["AlexNetFeatures_0"]
    net = AlexNetFeatures()

    def taps(x01):
        x = (2.0 * x01 - 1.0 - _SHIFT) / _SCALE
        return net.apply({"params": trunk}, x)

    @jax.jit
    def pair_dm(a, b):
        fa, fb = taps(a), taps(b)
        out = []
        for x, y in zip(fa, fb):
            xn = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-10)
            yn = y * jax.lax.rsqrt(jnp.sum(y * y, -1, keepdims=True) + 1e-10)
            out.append(jnp.mean((xn - yn) ** 2, axis=(1, 2)))
        return out

    dms = None
    for i in range(0, len(flat), 64):
        part = [np.asarray(t) for t in pair_dm(jnp.asarray(flat[i:i + 64]),
                                               jnp.asarray(rep[i:i + 64]))]
        dms = part if dms is None else [np.concatenate([a, b])
                                        for a, b in zip(dms, part)]
    dms_flat = dms  # list of (P*F*L, C_l)

    def idx(p, f, l):
        return (p * F + f) * L + l

    # All ranking pairs, each tagged with the set of families involved.
    pairs, pair_fams = [], []
    for p_i in range(P):
        for f_i in range(F):
            for l_a in range(L):
                for l_b in range(l_a + 1, L):
                    pairs.append((idx(p_i, f_i, l_a), idx(p_i, f_i, l_b)))
                    pair_fams.append((f_i, f_i))
        for f_a in range(F):
            for f_b in range(f_a + 1, F):
                for l_a in range(L):
                    for l_b in range(L):
                        dp = psnr[p_i, f_a, l_a] - psnr[p_i, f_b, l_b]
                        ds = ssim[p_i, f_a, l_a] - ssim[p_i, f_b, l_b]
                        if dp > 1.5 and ds > 0.02:
                            pairs.append((idx(p_i, f_a, l_a),
                                          idx(p_i, f_b, l_b)))
                            pair_fams.append((f_a, f_b))
                        elif dp < -1.5 and ds < -0.02:
                            pairs.append((idx(p_i, f_b, l_b),
                                          idx(p_i, f_a, l_a)))
                            pair_fams.append((f_a, f_b))
    pairs = np.asarray(pairs, np.int64)
    pair_fams = np.asarray(pair_fams, np.int64)
    print(f"{P} patches x {F} families x {L} levels; {len(pairs)} pairs")

    def distance(ws, sel):
        return sum(jnp.asarray(d)[sel] @ jax.nn.relu(w)
                   for d, w in zip(dms_flat, ws))

    def margins(ws, prs):
        db = np.asarray(distance(ws, prs[:, 0]))
        dw = np.asarray(distance(ws, prs[:, 1]))
        return (dw - db) / np.maximum(dw + db, 1e-12)

    init_ws = [jnp.full((d.shape[-1],), 1.0 / d.shape[-1]) for d in dms_flat]

    def fit(train_pairs, seed):
        r = np.random.default_rng(seed)

        def loss_fn(ws, prs):
            db = distance(ws, prs[:, 0])
            dw = distance(ws, prs[:, 1])
            rank = jnp.mean(jax.nn.softplus(-(dw - db) * 50.0))
            anchor = sum(jnp.mean((w - w0) ** 2)
                         for w, w0 in zip(ws, init_ws)) / len(ws)
            return rank + 0.1 * anchor

        opt = optax.adam(3e-3)
        ws = [w for w in init_ws]
        st = opt.init(ws)

        @jax.jit
        def step(ws, st, prs):
            l, g = jax.value_and_grad(loss_fn)(ws, prs)
            upd, st = opt.update(g, st, ws)
            return optax.apply_updates(ws, upd), st, l

        for s in range(args.steps):
            sel = r.integers(0, len(train_pairs),
                             size=min(2048, len(train_pairs)))
            ws, st, _ = step(ws, st, train_pairs[sel])
        return ws

    per_family = {}
    for f_hold, fname in enumerate(fam_names):
        involves = (pair_fams == f_hold).any(axis=1)
        train_p, test_p = pairs[~involves], pairs[involves]
        ws = fit(train_p, seed=100 + f_hold)
        m_fit = margins(ws, test_p)
        m_uni = margins(init_ws, test_p)
        per_family[fname] = {
            "n_test_pairs": int(len(test_p)),
            "acc_fitted": round(float((m_fit > 0).mean()), 4),
            "acc_uniform": round(float((m_uni > 0).mean()), 4),
            "margin_fitted": round(float(m_fit.mean()), 4),
            "margin_uniform": round(float(m_uni.mean()), 4),
        }
        print(f"hold out {fname:9s}: acc fitted "
              f"{per_family[fname]['acc_fitted']:.4f} vs uniform "
              f"{per_family[fname]['acc_uniform']:.4f} | margin "
              f"{per_family[fname]['margin_fitted']:.4f} vs "
              f"{per_family[fname]['margin_uniform']:.4f}")

    accs_f = np.array([v["acc_fitted"] for v in per_family.values()])
    accs_u = np.array([v["acc_uniform"] for v in per_family.values()])
    marg_f = np.array([v["margin_fitted"] for v in per_family.values()])
    marg_u = np.array([v["margin_uniform"] for v in per_family.values()])
    fitted_wins = bool(accs_f.mean() > accs_u.mean()
                       and marg_f.mean() > marg_u.mean())
    out = {
        "protocol": "leave-one-family-out, 6 distortion families, "
                    "fixed seeded trunk (PRNGKey 0)",
        "patches": P, "pairs": int(len(pairs)), "steps": args.steps,
        "per_family": per_family,
        "mean_heldout_acc_fitted": round(float(accs_f.mean()), 4),
        "mean_heldout_acc_uniform": round(float(accs_u.mean()), 4),
        "mean_heldout_margin_fitted": round(float(marg_f.mean()), 4),
        "mean_heldout_margin_uniform": round(float(marg_u.mean()), 4),
        "fitted_wins": fitted_wins,
        "decision": ("fitted heads stay the calibration default"
                     if fitted_wins else
                     "uniform heads on the seeded trunk become the "
                     "calibration default (fitting does not generalise "
                     "across distortion families)"),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("mean_heldout_acc_fitted", "mean_heldout_acc_uniform",
                       "mean_heldout_margin_fitted",
                       "mean_heldout_margin_uniform", "fitted_wins")}))
    print(f"wrote {args.out}\ndecision: {out['decision']}")


if __name__ == "__main__":
    main()
