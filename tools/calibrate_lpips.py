#!/usr/bin/env python
"""In-environment LPIPS head calibration on synthetic ranked distortions.

The reference's LPIPS (training/loss.py:86-108, evaluation/metrics.py:44)
uses the lpips package's pretrained AlexNet + fitted linear heads; neither
artifact exists in this environment (egress-blocked), so rounds 1-3 reported
`lpips_uncal` over uniform heads on a random trunk. This tool makes the
metric *meaningful in-env*: it fixes the seeded random AlexNet trunk (the
original LPIPS paper's finding: even a random trunk with learned linear
heads tracks human judgments far better than PSNR/SSIM) and fits the
per-channel heads on synthetic distortion pairs whose perceptual ordering is
known by construction:

- within a distortion family (blur / noise / fog / quantisation / pixelate /
  contrast), a stronger level is worse than a weaker one;
- across families, pairs are ranked only when PSNR and gray-SSIM agree with
  a margin (consensus labels).

Optimises a logistic ranking loss over the raw head vectors (ReLU'd at use,
matching losses/lpips.py) and writes an orbax checkpoint wired via
`loss.lpips_weights`. The sidecar metrics mark `calibration_synthetic`, so
evaluation reports the honest `lpips_cal_synth` key (only real converted
lpips-package weights earn the bare `lpips` key).

Usage:
  python tools/calibrate_lpips.py --corpus data/synthetic_corpus_v2 \
      --out experiments/full_system_r3/lpips_cal [--patches 160] [--device cpu]
"""
import argparse
import glob
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


# --------------------------------------------------------------------------
# Distortion families (host-side numpy/cv2; levels ordered weak -> strong)
# --------------------------------------------------------------------------

def _blur(img, lvl):
    import cv2
    sigma = (0.8, 1.6, 3.0)[lvl]
    return cv2.GaussianBlur(img, (0, 0), sigma)


def _noise(rng):
    def f(img, lvl):
        sigma = (0.03, 0.08, 0.16)[lvl]
        return np.clip(img + rng.normal(0, sigma, img.shape), 0, 1)
    return f


def _fog(img, lvl):
    # Scalar-transmission atmospheric scattering (the corpus generator's
    # model, data/synthetic.py:49; depth structure is irrelevant for
    # ranking so a flat transmission suffices).
    t = (0.75, 0.55, 0.35)[lvl]
    A = 0.9
    return img * t + A * (1 - t)


def _quant(img, lvl):
    levels = (24, 12, 6)[lvl]
    return np.round(img * levels) / levels


def _pixelate(img, lvl):
    import cv2
    f = (2, 4, 8)[lvl]
    h, w = img.shape[:2]
    small = cv2.resize(img, (w // f, h // f), interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def _contrast(img, lvl):
    c = (0.7, 0.45, 0.25)[lvl]
    return 0.5 + (img - 0.5) * c


def load_patches(corpus: str, n: int, size: int, rng) -> np.ndarray:
    paths = sorted(glob.glob(os.path.join(corpus, "train", "*", "clear",
                                          "*.png")))
    if not paths:
        raise SystemExit(f"no clear frames under {corpus}/train/*/clear")
    import cv2
    sel = rng.choice(len(paths), size=min(n, len(paths)), replace=False)
    out = []
    for i in sel:
        img = cv2.cvtColor(cv2.imread(paths[i]), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        y = rng.integers(0, max(h - size, 1))
        x = rng.integers(0, max(w - size, 1))
        out.append(img[y:y + size, x:x + size].astype(np.float32) / 255.0)
    return np.stack(out)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus", default="data/synthetic_corpus_v2")
    p.add_argument("--out", required=True)
    p.add_argument("--patches", type=int, default=160)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--uniform", action="store_true",
                   help="Skip head fitting: write UNIFORM heads with the "
                        "calibration-protocol validation metrics. This is "
                        "the r5 default policy — the leave-one-family-out "
                        "protocol (tools/justify_lpips_calibration.py, "
                        "benchmarks/round_results/lpips_justify_r5.json) "
                        "showed fitting does not generalise across "
                        "distortion families (held-out acc 0.9864 fitted "
                        "vs 0.9860 uniform; margins slightly WORSE).")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", default="cpu", choices=["cpu", "default"],
                   help="cpu (default; calibration is cheap) or the session "
                        "platform")
    args = p.parse_args(argv)

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from adam_dehaze_tpu.losses.lpips import LPIPS, _SCALE, _SHIFT
    from adam_dehaze_tpu.nn.alexnet import AlexNetFeatures
    from adam_dehaze_tpu.ops.image import psnr as batched_psnr
    from adam_dehaze_tpu.ops.image import ssim_gray as batched_ssim_gray
    from adam_dehaze_tpu.training import checkpoint as ckpt

    rng = np.random.default_rng(args.seed)
    refs = load_patches(args.corpus, args.patches, args.size, rng)
    fams = {"blur": _blur, "noise": _noise(rng), "fog": _fog,
            "quant": _quant, "pixelate": _pixelate, "contrast": _contrast}
    fam_names = sorted(fams)
    n_lvl = 3

    # Distorted stack: (P, F, L, H, W, 3)
    dist = np.stack([
        np.stack([
            np.stack([fams[f](r, lvl) for lvl in range(n_lvl)])
            for f in fam_names])
        for r in refs]).astype(np.float32)
    P, F, L = dist.shape[:3]

    # PSNR / SSIM vs reference for consensus labels.
    flat = dist.reshape(P * F * L, args.size, args.size, 3)
    rep = np.repeat(refs, F * L, axis=0)
    psnr = np.asarray(batched_psnr(jnp.asarray(flat), jnp.asarray(rep)))
    ssim = np.asarray(batched_ssim_gray(jnp.asarray(flat), jnp.asarray(rep)))
    psnr = psnr.reshape(P, F, L)
    ssim = ssim.reshape(P, F, L)

    # Per-pair per-layer channel-mean feature distances d[(layer)] with
    # shape (P*F*L, C_l): distance(w) = sum_l dm_l @ relu(w_l). The trunk is
    # FIXED (seeded init, PRNGKey(0) — the same init every ImageQualityMetrics
    # instance uses), so head fitting is a tiny convex-ish problem.
    lpips = LPIPS()
    dummy = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    base_params = lpips.init(jax.random.PRNGKey(0), dummy, dummy)
    trunk_params = {"params": {
        k: v for k, v in base_params["params"].items()
        if k.startswith("AlexNetFeatures")}}
    net = AlexNetFeatures()

    def taps(x01):
        x = (2.0 * x01 - 1.0 - _SHIFT) / _SCALE
        return net.apply(
            {"params": trunk_params["params"]["AlexNetFeatures_0"]}, x)

    @jax.jit
    def pair_dm(a, b):
        fa, fb = taps(a), taps(b)
        out = []
        for x, y in zip(fa, fb):
            xn = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-10)
            yn = y * jax.lax.rsqrt(jnp.sum(y * y, -1, keepdims=True) + 1e-10)
            out.append(jnp.mean((xn - yn) ** 2, axis=(1, 2)))  # (N, C)
        return out

    dms = None
    bs = 64
    for i in range(0, len(flat), bs):
        part = pair_dm(jnp.asarray(flat[i:i + bs]), jnp.asarray(rep[i:i + bs]))
        part = [np.asarray(t) for t in part]
        dms = part if dms is None else [np.concatenate([a, b])
                                        for a, b in zip(dms, part)]
    dms = [d.reshape(P, F, L, -1) for d in dms]

    # Ranking pairs: (better_index, worse_index) into the flattened (P,F,L).
    def idx(p, f, l):
        return (p * F + f) * L + l

    pairs = []
    for p_i in range(P):
        for f_i in range(F):
            for l_a in range(L):
                for l_b in range(l_a + 1, L):
                    pairs.append((idx(p_i, f_i, l_a), idx(p_i, f_i, l_b)))
        # cross-family consensus pairs
        for f_a in range(F):
            for f_b in range(f_a + 1, F):
                for l_a in range(L):
                    for l_b in range(L):
                        dp = psnr[p_i, f_a, l_a] - psnr[p_i, f_b, l_b]
                        ds = ssim[p_i, f_a, l_a] - ssim[p_i, f_b, l_b]
                        if dp > 1.5 and ds > 0.02:
                            pairs.append((idx(p_i, f_a, l_a),
                                          idx(p_i, f_b, l_b)))
                        elif dp < -1.5 and ds < -0.02:
                            pairs.append((idx(p_i, f_b, l_b),
                                          idx(p_i, f_a, l_a)))
    pairs = np.array(pairs, np.int64)
    rng.shuffle(pairs)
    n_val = max(len(pairs) // 10, 1)
    val, train = pairs[:n_val], pairs[n_val:]
    print(f"{P} patches x {F} families x {L} levels; "
          f"{len(train)} train / {len(val)} val ranking pairs")

    dms_flat = [d.reshape(P * F * L, -1) for d in dms]

    def distance(ws, sel):
        return sum(jnp.asarray(d)[sel] @ jax.nn.relu(w)
                   for d, w in zip(dms_flat, ws))

    def rank_acc(ws, prs):
        db = distance(ws, prs[:, 0])
        dw = distance(ws, prs[:, 1])
        return float(jnp.mean((dw > db).astype(jnp.float32)))

    init_ws = [jnp.full((d.shape[-1],), 1.0 / d.shape[-1]) for d in dms_flat]

    def loss_fn(ws, prs):
        db = distance(ws, prs[:, 0])
        dw = distance(ws, prs[:, 1])
        rank = jnp.mean(jax.nn.softplus(-(dw - db) * 50.0))
        anchor = sum(jnp.mean((w - w0) ** 2)
                     for w, w0 in zip(ws, init_ws)) / len(ws)
        return rank + 0.1 * anchor

    opt = optax.adam(3e-3)
    ws = [w for w in init_ws]
    opt_state = opt.init(ws)
    step = jax.jit(lambda ws, st, prs: _step(ws, st, prs))

    def _step(ws, st, prs):
        l, g = jax.value_and_grad(loss_fn)(ws, prs)
        upd, st = opt.update(g, st, ws)
        return optax.apply_updates(ws, upd), st, l

    batch = 2048
    if args.uniform:
        args.steps = 0  # keep init_ws; validation metrics still computed
    for s in range(args.steps):
        sel = rng.integers(0, len(train), size=min(batch, len(train)))
        ws, opt_state, l = step(ws, opt_state, train[sel])
        if s % 100 == 0 or s == args.steps - 1:
            print(f"step {s}: loss={float(l):.4f} "
                  f"val_acc={rank_acc(ws, val):.4f} "
                  f"(uniform {rank_acc(init_ws, val):.4f})")

    acc_fit = rank_acc(ws, val)
    acc_uniform = rank_acc(init_ws, val)

    params = jax.tree_util.tree_map(np.asarray, base_params)
    for i, w in enumerate(ws):
        params["params"][f"lin{i}"] = np.asarray(w)
    out_dir = os.path.dirname(os.path.abspath(args.out)) or "."
    name = os.path.basename(args.out)
    path = ckpt.save_checkpoint(out_dir, name, params, {
        "calibration_synthetic": 1.0,
        "uniform_heads": 1.0 if args.uniform else 0.0,
        "val_rank_acc": acc_fit,
        "val_rank_acc_uniform": acc_uniform,
        "patches": float(P), "pairs": float(len(pairs)),
    })
    print(f"wrote {path}: val ranking accuracy {acc_fit:.4f} "
          f"(uniform heads {acc_uniform:.4f})")


if __name__ == "__main__":
    main()
