#!/usr/bin/env python
"""Deterministic non-overfit accuracy regression (VERDICT r1 #4).

Trains the flagship ctdet/ShuffleNetV2-DCN on a 64-image synthetic VOC
train split and scores Mean AP on 16 HELD-OUT images (same distribution,
different seed) — class identity is color-coded, so generalization is
learnable in minutes yet still exercises the full train->checkpoint->
detector->VOC-eval stack. Accuracy drift between rounds (kernel changes,
quantization changes, decode changes) shows up as a band violation.

Usage:
  python tools_tpu/synthetic_regression.py                # run + assert
  python tools_tpu/synthetic_regression.py --min_ap 0     # report only

The pinned band is calibrated on the real TPU chip (see
tests/test_synth_regression.py for the CPU-sized CI variant).
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def run(train_images=64, test_images=16, input_res=128, batch_size=16,
        num_epochs=400, lr=1e-3, exp_id="synthreg", data_root=None,
        seed=0, num_classes=8, min_side=32):
    from synthetic import make_voc_dataset

    data_root = data_root or tempfile.mkdtemp(prefix="synthreg_")
    make_voc_dataset(data_root, num_images=train_images, img_w=160,
                     img_h=120, seed=seed, test_images=test_images,
                     num_classes=num_classes, min_side=min_side)
    common = ["ctdet", "--dataset", "pascal", "--arch", "shufflenetv2",
              "--input_res", str(input_res), "--data_dir", data_root,
              "--exp_id", exp_id]
    train = [sys.executable, "main.py", *common,
             "--batch_size", str(batch_size),
             "--num_epochs", str(num_epochs),
             "--lr", str(lr),
             "--lr_step", str(int(num_epochs * 0.8)),
             "--no_color_aug", "--save_intervals", "100",
             "--num_workers", "1", "--val_intervals", "-1", "--seed",
             str(seed)]
    test = [sys.executable, "test.py", *common, "--resume"]
    for cmd in (train, test):
        print("+", " ".join(cmd), flush=True)
        rc = subprocess.call(cmd, cwd=REPO)
        if rc != 0:
            raise SystemExit(f"stage failed rc={rc}")
    # test.py prints the AP table; re-score in-process for the number
    from codenet_tpu.eval.voc_eval import voc_eval_from_coco_json
    from synthetic import VOC_CLASSES
    results = os.path.join(REPO, "exp", "ctdet", exp_id, "results.json")
    gt = os.path.join(data_root, "voc", "annotations",
                      "pascal_test2007.json")
    scores = voc_eval_from_coco_json(results, gt, VOC_CLASSES, quiet=True)
    # band metric: mean AP over classes PRESENT in the held-out GT (absent
    # classes score 0 by VOC convention and would just dilute the band)
    import json as _json
    with open(gt) as f:
        present = {a["category_id"] for a in _json.load(f)["annotations"]}
    present_aps = [scores["per_class"][VOC_CLASSES[c - 1]] for c in present]
    mean_present = float(sum(present_aps) / max(len(present_aps), 1))
    print(f"Mean AP (all 20) = {scores['AP50']:.4f}; "
          f"present-class Mean AP = {mean_present:.4f} "
          f"({len(present_aps)} classes)")
    return mean_present, data_root


def _score(exp_id, data_root):
    from codenet_tpu.eval.voc_eval import voc_eval_from_coco_json
    from synthetic import VOC_CLASSES
    import json as _json
    results = os.path.join(REPO, "exp", "ctdet", exp_id, "results.json")
    gt = os.path.join(data_root, "voc", "annotations",
                      "pascal_test2007.json")
    scores = voc_eval_from_coco_json(results, gt, VOC_CLASSES, quiet=True)
    with open(gt) as f:
        present = {a["category_id"] for a in _json.load(f)["annotations"]}
    aps = [scores["per_class"][VOC_CLASSES[c - 1]] for c in present]
    return float(sum(aps) / max(len(aps), 1))


# Delta bands calibrated on the v5e chip with the adversarial synthetic
# distribution (textured 20-class objects down to 8 px, overlap <= 0.5,
# gray distractors; 96 train / 24 held-out images at 128^2, 400+200
# epochs). v5e calibration (seed 0): fp32 0.383, flip +0.026, bf16
# +0.000, qat +0.118 (fine-tune keeps training), int8 -0.078 vs qat.
# The int8-vs-fake gap is NOT a lowering bug: real int8 must clamp
# activations to the signed window while the reference's fake-quant
# quirkily does not (quant_utils.py:191-198) — `qat_clamped` evaluates
# the SAME checkpoint with deployment-faithful clamped fake-quant, and
# int8 must match THAT tightly. Each band adds noise headroom.
DELTA_BANDS = {
    "qat_vs_fp32": -0.10,        # QAT W4A8 fine-tune cost bound
    "int8_vs_clamped": -0.03,    # int8 == clamped fake-quant numerics
    "int8_vs_qat": -0.15,        # informational: includes the clamp cost
    "bf16_vs_fp32": -0.02,       # bf16 eval ~= f32 eval
    "flip_vs_plain": -0.02,      # flip-test must not hurt
    "int8_ct_vs_qat_ct": -0.03,  # deployed recipe: clamp-trained QAT ->
                                 # int8 loses only requant noise
    "qat_ct_vs_qat": -0.08,      # clamp-trained QAT ~= plain QAT accuracy
}


def run_deltas(train_images=96, test_images=24, input_res=128,
               batch_size=16, num_epochs=500, qat_epochs=200, lr=1e-3,
               data_root=None, seed=0, out_json=None):
    """Accuracy DELTA harness (VERDICT r2 next-#5): train FP32 on the
    adversarial synthetic split, then measure held-out AP under
    fp32 / fp32+flip / bf16 / QAT fake-quant / real-int8 and pin the
    relative bands (the quantization claims are tested as deltas, not at
    AP saturation). Emits a JSON the driver can archive."""
    from synthetic import make_voc_dataset

    data_root = data_root or tempfile.mkdtemp(prefix="synthdelta_")
    make_voc_dataset(data_root, num_images=train_images, img_w=160,
                     img_h=120, seed=seed, test_images=test_images,
                     num_classes=20, min_side=8, max_objects=5,
                     adversarial=True)
    common = ["ctdet", "--dataset", "pascal", "--arch", "shufflenetv2",
              "--input_res", str(input_res), "--data_dir", data_root,
              "--num_workers", "1", "--seed", str(seed)]
    trainflags = ["--batch_size", str(batch_size), "--lr", str(lr),
                  "--no_color_aug", "--save_intervals", "100",
                  "--val_intervals", "-1"]
    fp32, qat = "synthdelta_fp32", "synthdelta_qat"
    qat_ct = "synthdelta_qatct"
    fp32_ckpt = os.path.join(REPO, "exp", "ctdet", fp32, "model_last.ckpt")
    py = [sys.executable]
    stages = [
        ("fp32_train", py + ["main.py", *common, *trainflags,
                             "--exp_id", fp32,
                             "--num_epochs", str(num_epochs),
                             "--lr_step", str(int(num_epochs * 0.8))]),
        ("qat_train", py + ["quant_main.py", *common, *trainflags,
                            "--exp_id", qat,
                            "--num_epochs", str(qat_epochs),
                            "--lr_step", str(int(qat_epochs * 0.8)),
                            "--load_model", fp32_ckpt, "--wt-percentile"]),
        # deployment-faithful QAT: train WITH the int8 window clamp so the
        # network adapts to saturation instead of paying for it at
        # lowering time (the r3->r4 remedy for the -0.078 int8_vs_qat gap;
        # tools_tpu/int8_audit.py shows lowering error is at the noise
        # floor — the whole gap is clamp semantics)
        ("qat_ct_train", py + ["quant_main.py", *common, *trainflags,
                               "--exp_id", qat_ct,
                               "--num_epochs", str(qat_epochs),
                               "--lr_step", str(int(qat_epochs * 0.8)),
                               "--load_model", fp32_ckpt,
                               "--wt-percentile", "--act_clamp"]),
    ]
    evals = [
        ("fp32", py + ["test.py", *common, "--exp_id", fp32, "--resume"]),
        ("fp32_flip", py + ["test.py", *common, "--exp_id", fp32,
                            "--resume", "--flip_test"]),
        ("bf16", py + ["test.py", *common, "--exp_id", fp32, "--resume",
                       "--dtype", "bfloat16"]),
        ("qat", py + ["test.py", *common, "--exp_id", qat, "--resume",
                      "--resume-quantize", "--wt-percentile"]),
        ("qat_clamped", py + ["test.py", *common, "--exp_id", qat,
                              "--resume", "--resume-quantize",
                              "--wt-percentile", "--act_clamp"]),
        ("int8", py + ["test.py", *common, "--exp_id", qat, "--resume",
                       "--resume-quantize", "--wt-percentile",
                       "--int8_infer"]),
        ("qat_ct", py + ["test.py", *common, "--exp_id", qat_ct,
                         "--resume", "--resume-quantize",
                         "--wt-percentile", "--act_clamp"]),
        ("int8_ct", py + ["test.py", *common, "--exp_id", qat_ct,
                          "--resume", "--resume-quantize",
                          "--wt-percentile", "--int8_infer"]),
    ]
    for name, cmd in stages:
        # marker-resumable: a tunnel outage mid-harness must not force
        # retraining completed stages on rerun
        marker = os.path.join(REPO, "exp", "ctdet",
                              cmd[cmd.index("--exp_id") + 1],
                              f".{name}_done")
        if os.path.exists(marker):
            print(f"[deltas] {name} done already, skipping", flush=True)
            continue
        print("+", " ".join(cmd), flush=True)
        if subprocess.call(cmd, cwd=REPO) != 0:
            raise SystemExit(f"{name} failed")
        open(marker, "w").close()
    aps = {}
    for name, cmd in evals:
        print("+", " ".join(cmd), flush=True)
        if subprocess.call(cmd, cwd=REPO) != 0:
            raise SystemExit(f"eval {name} failed")
        exp = fp32 if "fp32" in name or name == "bf16" else (
            qat_ct if name.endswith("_ct") else qat)
        aps[name] = _score(exp, data_root)
        print(f"[deltas] {name}: present-class Mean AP {aps[name]:.4f}",
              flush=True)
    deltas = {
        "qat_vs_fp32": aps["qat"] - aps["fp32"],
        "int8_vs_clamped": aps["int8"] - aps["qat_clamped"],
        "int8_vs_qat": aps["int8"] - aps["qat"],
        "bf16_vs_fp32": aps["bf16"] - aps["fp32"],
        "flip_vs_plain": aps["fp32_flip"] - aps["fp32"],
        # the deployment recipe: clamp-trained QAT -> int8 must be lossless
        # (both run the same saturated ranges; only requant noise remains)
        "int8_ct_vs_qat_ct": aps["int8_ct"] - aps["qat_ct"],
        # and clamp-training must not cost much vs plain QAT
        "qat_ct_vs_qat": aps["qat_ct"] - aps["qat"],
    }
    violations = {k: (d, DELTA_BANDS[k]) for k, d in deltas.items()
                  if d < DELTA_BANDS[k]}
    payload = {"aps": aps, "deltas": deltas, "bands": DELTA_BANDS,
               "violations": {k: v[0] for k, v in violations.items()},
               "config": {"train_images": train_images,
                          "test_images": test_images,
                          "input_res": input_res, "epochs": num_epochs,
                          "qat_epochs": qat_epochs, "seed": seed,
                          "adversarial": True}}
    import json as _json
    out_json = out_json or os.path.join(REPO, "SYNTH_DELTAS.json")
    with open(out_json, "w") as f:
        _json.dump(payload, f, indent=1)
    print(_json.dumps({"deltas": {k: round(v, 4) for k, v in
                                  deltas.items()},
                       "violations": sorted(violations)}))
    return payload, data_root


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--min_ap", type=float, default=0.50,
                    help="pinned lower band; v5e calibration measured "
                         "present-class Mean AP 0.706 (8 classes, 64/16 "
                         "held-out split, 1600 steps)")
    ap.add_argument("--train_images", type=int, default=64)
    ap.add_argument("--test_images", type=int, default=16)
    ap.add_argument("--input_res", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_epochs", type=int, default=400)
    ap.add_argument("--qat_epochs", type=int, default=200)
    ap.add_argument("--num_classes", type=int, default=8)
    ap.add_argument("--keep_data", action="store_true")
    ap.add_argument("--deltas", action="store_true",
                    help="run the adversarial-distribution delta harness "
                         "(fp32/flip/bf16/QAT/int8 bands) instead of the "
                         "absolute-AP band")
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args(argv)

    if args.deltas:
        payload, data_root = run_deltas(
            max(args.train_images, 96), max(args.test_images, 24),
            args.input_res, args.batch_size, args.num_epochs,
            args.qat_epochs, out_json=args.out_json)
        if not args.keep_data:
            shutil.rmtree(data_root, ignore_errors=True)
        if payload["violations"]:
            print("REGRESSION: delta band violation:",
                  payload["violations"], file=sys.stderr)
            return 1
        return 0

    mean_ap, data_root = run(args.train_images, args.test_images,
                             args.input_res, args.batch_size,
                             args.num_epochs, num_classes=args.num_classes)
    print(f"synthetic_regression: held-out Mean AP = {mean_ap:.4f} "
          f"(band >= {args.min_ap})")
    if not args.keep_data:
        shutil.rmtree(data_root, ignore_errors=True)
    if mean_ap < args.min_ap:
        print("REGRESSION: AP below pinned band", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
