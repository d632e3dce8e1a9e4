#!/usr/bin/env python
"""Collect the configs a-e training matrix into RESULTS.md.

Reads each exp/ctdet/pascal_shufflenetv2_config_<x>/results.json produced
by run_configs_ae.py, re-scores it in-process against the dataset GT, and
writes a markdown table (AP50 all-20 + present-class mean) alongside the
training provenance (epochs, command lines from opt.txt, checkpoint
sizes). The reference targets (README.md:14-18) are listed for context;
on synthetic data they are NOT comparable numbers — the table documents
that the full FP32->QAT->flip-eval recipe trains and detects end-to-end
at every config's capacity.

Usage: python tools_tpu/summarize_results.py --data_dir /tmp/synthvoc \
           [--out RESULTS.md] [--note "..."]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "a": ("256, stride 4, 1x", 51.1),
    "b": ("256, S2+maxpool, 1x", 55.1),
    "c": ("512, stride 4, 1x", 61.7),
    "d": ("512, stride 4, 2x (--w2)", 67.1),
    "e": ("512, S2+maxpool, 2x", 69.7),
}


def score_config(name, data_dir):
    from codenet_tpu.eval.voc_eval import voc_eval_from_coco_json
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from synthetic import VOC_CLASSES

    exp_dir = os.path.join(REPO, "exp", "ctdet",
                           f"pascal_shufflenetv2_config_{name}")
    results = os.path.join(exp_dir, "results.json")
    gt = os.path.join(data_dir, "voc", "annotations", "pascal_test2007.json")
    if not os.path.exists(results):
        return None
    scores = voc_eval_from_coco_json(results, gt, VOC_CLASSES, quiet=True)
    with open(gt) as f:
        present = {a["category_id"] for a in json.load(f)["annotations"]}
    aps = [scores["per_class"][VOC_CLASSES[c - 1]] for c in present]
    out = {
        "ap50_all20": scores["AP50"],
        "ap50_present": sum(aps) / max(len(aps), 1),
        "n_present": len(aps),
        "exp_dir": os.path.relpath(exp_dir, REPO),
    }
    ckpt = os.path.join(exp_dir, "model_last.ckpt")
    if os.path.exists(ckpt):
        out["ckpt_mb"] = os.path.getsize(ckpt) / 1e6
    log_lines = []
    for fn in sorted(os.listdir(exp_dir)):
        if fn.startswith("log_"):
            with open(os.path.join(exp_dir, fn)) as f:
                log_lines += [ln.strip() for ln in f if "epoch" in ln]
    if log_lines:
        out["last_epoch_line"] = log_lines[-1]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out", default=os.path.join(REPO, "RESULTS.md"))
    ap.add_argument("--note", default="")
    ap.add_argument("--cmdline", default="")
    args = ap.parse_args(argv)

    rows = []
    for name, (desc, ref_ap) in CONFIGS.items():
        s = score_config(name, args.data_dir)
        rows.append((name, desc, ref_ap, s))

    with open(args.out, "w") as f:
        f.write("# RESULTS — trained checkpoints & measured AP50\n\n")
        if args.note:
            f.write(args.note.strip() + "\n\n")
        f.write("| config | geometry | AP50 (20-cls) | AP50 (present) | "
                "ckpt MB | reference VOC target |\n")
        f.write("|---|---|---|---|---|---|\n")
        for name, desc, ref_ap, s in rows:
            if s is None:
                f.write(f"| {name} | {desc} | — | — | — | {ref_ap} |\n")
                continue
            f.write(f"| {name} | {desc} | {s['ap50_all20']:.4f} | "
                    f"{s['ap50_present']:.4f} ({s['n_present']} cls) | "
                    f"{s.get('ckpt_mb', 0):.1f} | {ref_ap} |\n")
        f.write("\n")
        if args.cmdline:
            f.write(f"Command line:\n\n```\n{args.cmdline.strip()}\n```\n\n")
        for name, desc, ref_ap, s in rows:
            if s and "last_epoch_line" in s:
                f.write(f"- config {name}: `{s['exp_dir']}` — "
                        f"{s['last_epoch_line']}\n")
    print(f"wrote {args.out}")
    for name, _, _, s in rows:
        if s:
            print(f"  {name}: AP50={s['ap50_all20']:.4f} "
                  f"present={s['ap50_present']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
