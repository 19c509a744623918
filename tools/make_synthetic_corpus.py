#!/usr/bin/env python
"""Generate a synthetic FogIntensity corpus in the reference dataset layout.

Procedural clear scenes (sky gradient + textured ground + box/ellipse
structures — Cityscapes stand-ins) are fogged with the atmospheric-scattering
model using the reference's per-intensity (beta, A) ranges
(reference: utils/helpers.py:201-265; data layout: data/dataset.py:9-124):

  {out}/{train,val,test}/{low,medium,high}/{hazy,clear,dehazed}/{level}_NNNN.png
  {out}/annotations/{level}_NNNN.json           per-image detection GT
  {out}/annotations/coco_{level}.json           per-intensity COCO GT (test)

`dehazed/` is initialised with the clear image (the reference corpus carries
a third pre-dehazed rendition; nothing in the pipeline trains on it). The
drawn structures double as detection ground truth: category 1 = block
(rectangle), category 2 = disc (circle), so the detector can be fine-tuned
and the hazy-vs-dehazed mAP comparison is measured against real boxes.

Usage: python tools/make_synthetic_corpus.py --out data/synthetic_corpus \
           [--size 256] [--train 200] [--val 50] [--test 50] [--seed 0]
(counts are PER intensity class)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CATEGORIES = [{"id": 1, "name": "block"}, {"id": 2, "name": "disc"}]


def _octave_noise(rng: np.random.Generator, size: int, octaves: int = 5,
                  persistence: float = 0.55) -> np.ndarray:
    """Multi-octave value noise in [-1, 1] — real-image-like 1/f spectral
    statistics so VGG/LPIPS feature losses have texture to grip (the round-2
    corpus was piecewise-flat; content/perceptual ablations moved < noise)."""
    import cv2

    acc = np.zeros((size, size), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        cells = max(2, size // (2 ** (octaves - o + 1)))
        grid = rng.standard_normal((cells, cells)).astype(np.float32)
        acc += amp * cv2.resize(grid, (size, size),
                                interpolation=cv2.INTER_CUBIC)
        total += amp
        amp *= persistence
    acc /= total
    return np.clip(acc / (2.5 * acc.std() + 1e-6), -1.0, 1.0)


def make_clear_scene(rng: np.random.Generator, size: int):
    """One procedural 'street scene'. Returns (image, boxes_xywh, labels).

    Surfaces carry structured texture — octave noise fields, per-object
    shading gradients, stripe/brick patterns — instead of flat fills, so
    feature-space loss terms (VGG content, LPIPS) measurably change the
    optimum (round-3 verdict item #8)."""
    import cv2

    img = np.zeros((size, size, 3), np.float32)
    horizon = rng.integers(size // 3, 2 * size // 3)
    sky_top = rng.uniform(0.5, 0.9, 3)
    sky_bot = sky_top * rng.uniform(0.7, 1.0)
    rows = np.linspace(0, 1, horizon)[:, None, None]
    img[:horizon] = sky_top * (1 - rows) + sky_bot * rows
    # Cloud field: low-frequency octaves brighten the sky non-uniformly.
    clouds = _octave_noise(rng, size, octaves=3)[:horizon]
    img[:horizon] += 0.08 * clouds[..., None]
    ground = rng.uniform(0.15, 0.45, 3)
    gtex = _octave_noise(rng, size)[size - (size - horizon):]
    img[horizon:] = ground * (1.0 + 0.35 * gtex[..., None])

    ys = np.arange(size, dtype=np.float32)
    xs = np.arange(size, dtype=np.float32)

    boxes, labels = [], []
    for _ in range(rng.integers(4, 10)):  # buildings / vehicles
        w = int(rng.integers(size // 10, size // 3))
        h = int(rng.integers(size // 8, size // 2))
        x0 = int(rng.integers(0, size - w))
        y0 = int(rng.integers(max(horizon - h, 0), size - h))
        color = rng.uniform(0.1, 0.8, 3)
        patch = np.broadcast_to(color, (h, w, 3)).copy()
        # Vertical shading gradient (lit top, dark base).
        shade = (0.75 + 0.5 * np.linspace(1, 0, h))[:, None, None]
        patch *= shade
        # Window/brick stripes at a random pitch and orientation.
        pitch = int(rng.integers(max(3, size // 64), max(6, size // 16)))
        phase = rng.integers(0, pitch)
        if rng.random() < 0.5:
            mask = ((ys[y0:y0 + h].astype(int) + phase) % pitch) < pitch // 2
            patch[mask] *= rng.uniform(0.55, 0.85)
        else:
            mask = ((xs[x0:x0 + w].astype(int) + phase) % pitch) < pitch // 2
            patch[:, mask] *= rng.uniform(0.55, 0.85)
        # Per-surface fine texture octave.
        fine = _octave_noise(rng, max(h, w))[:h, :w]
        patch *= (1.0 + 0.18 * fine[..., None])
        img[y0:y0 + h, x0:x0 + w] = np.clip(patch, 0.0, 1.0)
        boxes.append([x0, y0, w, h])
        labels.append(1)
    for _ in range(rng.integers(2, 6)):  # round features
        cx = int(rng.integers(0, size))
        cy = int(rng.integers(horizon, size))
        r = int(rng.integers(size // 30, size // 8))
        color = rng.uniform(0.1, 0.9, 3)
        # Radial shading: brighter center, darker rim (sphere-like).
        disc = np.zeros((size, size), np.float32)
        cv2.circle(disc, (cx, cy), r, 1.0, -1)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        rad = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2) / max(r, 1)
        shading = np.clip(1.15 - 0.45 * rad, 0.4, 1.15)
        sel = disc > 0
        img[sel] = np.clip(color * shading[sel, None], 0.0, 1.0)
        x0, y0 = max(cx - r, 0), max(cy - r, 0)
        x1, y1 = min(cx + r, size), min(cy + r, size)
        if x1 > x0 and y1 > y0:
            boxes.append([x0, y0, x1 - x0, y1 - y0])
            labels.append(2)

    noise = rng.normal(0, 0.02, img.shape).astype(np.float32)
    tex = 0.06 * _octave_noise(rng, size)
    return np.clip(img + noise + tex[..., None], 0.0, 1.0), boxes, labels


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--train", type=int, default=200)
    p.add_argument("--val", type=int, default=50)
    p.add_argument("--test", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--margin", type=float, default=0.15,
                   help="Shrink each class's (beta, A) sampling range by this "
                        "fraction per side. The reference table's ranges "
                        "TOUCH at class boundaries (utils/helpers.py:223-235) "
                        "making boundary samples unlearnable; the paper's "
                        "actual corpus uses fully separated discrete betas "
                        "(0.03/0.06/0.09, README.md:129-131), which a margin "
                        "approximates. 0 reproduces the raw table.")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # host-side generation
    import cv2
    import jax.numpy as jnp

    from adam_dehaze_tpu.data import synthetic as synth
    from adam_dehaze_tpu.data.synthetic import apply_fog, random_fog_params

    def fog_with_margin(key, clear, intensity):
        m = args.margin
        names = synth.INTENSITY_NAMES
        import jax.numpy as jnp_
        lows_b = jnp_.array([synth.INTENSITY_RANGES[n][0][0] for n in names])
        highs_b = jnp_.array([synth.INTENSITY_RANGES[n][0][1] for n in names])
        lows_a = jnp_.array([synth.INTENSITY_RANGES[n][1][0] for n in names])
        highs_a = jnp_.array([synth.INTENSITY_RANGES[n][1][1] for n in names])
        lows_b2 = lows_b + m * (highs_b - lows_b)
        highs_b2 = highs_b - m * (highs_b - lows_b)
        lows_a2 = lows_a + m * (highs_a - lows_a)
        highs_a2 = highs_a - m * (highs_a - lows_a)
        kb, ka = jax.random.split(key)
        ub = jax.random.uniform(kb, (clear.shape[0],))
        ua = jax.random.uniform(ka, (clear.shape[0],))
        beta = lows_b2[intensity] + ub * (highs_b2 - lows_b2)[intensity]
        A = lows_a2[intensity] + ua * (highs_a2 - lows_a2)[intensity]
        return apply_fog(clear, beta, A)

    apply_random_fog = jax.jit(fog_with_margin)

    ann_dir = os.path.join(args.out, "annotations")
    os.makedirs(ann_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    total = 0
    coco = {level: {"images": [], "annotations": [],
                    "categories": CATEGORIES}
            for level in ("low", "medium", "high")}
    ann_id = {level: 1 for level in coco}
    for split, n in (("train", args.train), ("val", args.val),
                     ("test", args.test)):
        for ci, level in enumerate(("low", "medium", "high")):
            dirs = {s: os.path.join(args.out, split, level, s)
                    for s in ("hazy", "clear", "dehazed")}
            for d in dirs.values():
                os.makedirs(d, exist_ok=True)
            chunk = 25  # fog a block of images per device call
            done = 0
            while done < n:
                m = min(chunk, n - done)
                scenes = [make_clear_scene(rng, args.size) for _ in range(m)]
                clear = np.stack([s[0] for s in scenes])
                key, sub = jax.random.split(key)
                hazy = np.asarray(apply_random_fog(
                    sub, jnp.asarray(clear), jnp.full((m,), ci)))
                for i in range(m):
                    # Unique name per (split, level): annotation files live in
                    # one flat dir (data/detection.py expects {base}.json).
                    name = f"{split}_{level}_{done + i:04d}.png"
                    for sub_name, arr in (("hazy", hazy[i]),
                                          ("clear", clear[i]),
                                          ("dehazed", clear[i])):
                        cv2.imwrite(
                            os.path.join(dirs[sub_name], name),
                            (np.clip(arr, 0, 1) * 255).astype(np.uint8))
                    anns = [{"bbox": [float(v) for v in box],
                             "category_id": int(lab),
                             "area": float(box[2] * box[3]), "iscrowd": 0}
                            for box, lab in zip(scenes[i][1], scenes[i][2])]
                    base = os.path.splitext(name)[0]
                    with open(os.path.join(ann_dir, f"{base}.json"), "w") as f:
                        json.dump({"annotations": anns}, f)
                    if split == "test":
                        img_id = len(coco[level]["images"]) + 1
                        coco[level]["images"].append(
                            {"id": img_id, "file_name": name,
                             "width": args.size, "height": args.size})
                        for a in anns:
                            coco[level]["annotations"].append(
                                {**a, "id": ann_id[level],
                                 "image_id": img_id})
                            ann_id[level] += 1
                done += m
                total += m
            print(f"{split}/{level}: {n} triplets")
    for level, gt in coco.items():
        with open(os.path.join(ann_dir, f"coco_{level}.json"), "w") as f:
            json.dump(gt, f)
    print(f"Wrote {total} triplets under {args.out} (+ detection GT)")


if __name__ == "__main__":
    main()
