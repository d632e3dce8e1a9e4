#!/usr/bin/env python
"""One-command reproduction driver for the five README configs (a-e).

Chains, per config, the reference's exact recipe
(/root/reference/README.md:88-116):
  1. FP32 train   — main.py ctdet, 90 epochs, lr_step 50,70
  2. QAT finetune — quant_main.py, 180 epochs from the FP32 ckpt,
                    --resume-quantize --wt-percentile --act_clamp
  3. Eval (fake)  — test.py with --flip_test --resume-quantize --act_clamp
                    (results archived as results_fakequant.json)
  4. Eval (int8)  — same plus --int8_infer: the deployed real-int8 conv
                    path (results archived as results_int8.json)
  5. Export       — tools_tpu/export_w4a8.py packs the W4A8 deployment
                    artifact (model_w4a8.npz: int4 weights 2/byte +
                    scales + folded biases + frozen act ranges), the
                    TPU-native equivalent of the reference's published
                    0.76 MB / 2.90 MB parameter files (README.md:14-18)

The QAT stage trains with --act_clamp (activations saturated to the
signed int8 window) so the numbers the matrix reports describe the
DEPLOYED model, exactly as the reference's published table does — its
README numbers are the W4A8 model the quantizer emits, not a fake-quant
proxy (README.md:14-18). NOTES #33 / SYNTH_DELTAS.json measured that
clamp-trained QAT closes the int8 gap to within noise (int8-ct >= qat).

Configs (README.md Table 3):
  a: 256x256 stride-4        c: 512x512 stride-4    e: 512x512 --w2 --maxpool
  b: 256x256 --maxpool       d: 512x512 --w2

Runs unattended once `data/voc` exists (tools_tpu/get_pascal_voc.sh +
merge_pascal_json.py lay it out); each stage is a subprocess so XLA programs
and host memory are isolated. A stage whose final checkpoint already exists
is skipped, so the driver is resumable. AP50 targets to match (+-0.2):
a 51.1, b 55.1, c 61.7, d 67.1, e 69.7.

Usage:
  python tools_tpu/run_configs_ae.py                 # all five
  python tools_tpu/run_configs_ae.py --configs a,b   # subset
  python tools_tpu/run_configs_ae.py --fp32_epochs 2 --qat_epochs 1 \
      --data_dir /tmp/vocdata --smoke   # pipeline smoke on synthetic data
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "a": {"input_res": 256, "w2": False, "maxpool": False, "ap50": 51.1},
    "b": {"input_res": 256, "w2": False, "maxpool": True, "ap50": 55.1},
    "c": {"input_res": 512, "w2": False, "maxpool": False, "ap50": 61.7},
    "d": {"input_res": 512, "w2": True, "maxpool": False, "ap50": 67.1},
    "e": {"input_res": 512, "w2": True, "maxpool": True, "ap50": 69.7},
}


def build_commands(cfg_name, opts):
    """The three stage command lines for one config (list of argv lists)."""
    c = CONFIGS[cfg_name]
    exp = f"pascal_shufflenetv2_config_{cfg_name}"
    flags = ["--arch", "shufflenetv2", "--dataset", "pascal",
             "--head_conv", "64", "--input_res", str(c["input_res"]),
             "--data_dir", opts.data_dir, "--exp_id", exp]
    if c["w2"]:
        flags += ["--w2"]
    if c["maxpool"]:
        flags += ["--maxpool"]
    extra = []
    if opts.batch_size:
        extra += ["--batch_size", str(opts.batch_size)]
    if opts.num_workers is not None:
        extra += ["--num_workers", str(opts.num_workers)]
    if getattr(opts, "lr", None):
        extra += ["--lr", str(opts.lr)]
    if getattr(opts, "device_cache", False):
        # HBM-resident raw images (data/device_cache.py): behind a thin
        # host link this is the difference between tunnel-bound (~10 s/
        # step) and compute-bound (~20 ms/step) training
        extra += ["--device_cache"]
    if getattr(opts, "save_intervals", None):
        extra += ["--save_intervals", str(opts.save_intervals)]
    if getattr(opts, "val_intervals", None):
        extra += ["--val_intervals", str(opts.val_intervals)]

    py = [sys.executable]
    train = py + ["main.py", "ctdet", *flags, *extra,
                  "--num_epochs", str(opts.fp32_epochs),
                  "--lr_step", opts.lr_step]
    qat = py + ["quant_main.py", "ctdet", *flags, *extra,
                "--num_epochs", str(opts.qat_epochs),
                "--lr_step", opts.lr_step,
                "--resume", "--resume-quantize", "--wt-percentile",
                "--act_clamp"]
    # evals must mirror the QAT stage's weight-range mode: QAT trains
    # with --wt-percentile, so an eval without it fake-quantizes weights
    # against min/max ranges the model never trained under (measured on
    # config b: 0.50 vs 0.74 AP50 — a silent 24-point haircut)
    test_fake = py + ["test.py", "ctdet", *flags,
                      "--resume", "--flip_test", "--resume-quantize",
                      "--wt-percentile", "--act_clamp"]
    test_int8 = py + ["test.py", "ctdet", *flags,
                      "--resume", "--flip_test", "--resume-quantize",
                      "--wt-percentile", "--act_clamp", "--int8_infer"]
    export = py + ["tools_tpu/export_w4a8.py", "ctdet", *flags,
                   "--resume", "--resume-quantize", "--wt-percentile",
                   "--act_clamp"]
    return exp, [("fp32_train", train), ("qat_finetune", qat),
                 ("eval_fakequant", test_fake), ("eval_int8", test_int8),
                 ("export_w4a8", export)]


def stage_done(exp_dir, stage, opts):
    """Resumability: skip a stage whose terminal artifact exists."""
    last = os.path.join(exp_dir, "model_last.ckpt")
    if not os.path.exists(last):
        return False
    if stage == "fp32_train":
        # the QAT stage overwrites model_last with quant_stats inside;
        # use the presence of the fp32 marker file
        return os.path.exists(os.path.join(exp_dir, ".fp32_done"))
    if stage == "qat_finetune":
        return os.path.exists(os.path.join(exp_dir, ".qat_done"))
    if stage.startswith("eval_"):
        tag = stage[len("eval_"):]
        return os.path.exists(os.path.join(exp_dir,
                                           f"results_{tag}.json"))
    if stage == "export_w4a8":
        return os.path.exists(os.path.join(exp_dir, "model_w4a8.npz"))
    return False


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="a,b,c,d,e")
    ap.add_argument("--data_dir", default=os.path.join(REPO, "data"))
    ap.add_argument("--fp32_epochs", type=int, default=90)
    ap.add_argument("--qat_epochs", type=int, default=180)
    ap.add_argument("--lr_step", default="50,70")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--num_workers", type=int, default=None)
    ap.add_argument("--retries", type=int, default=2,
                    help="per-stage retries after tunnel outages")
    ap.add_argument("--lr", type=float, default=None,
                    help="override the reference 1.25e-4 (e.g. scaled for "
                         "a larger batch, or higher for synthetic runs)")
    ap.add_argument("--device_cache", action="store_true",
                    help="train stages keep the raw train images in HBM "
                         "(see --device_cache in config.py)")
    ap.add_argument("--save_intervals", type=int, default=None,
                    help="checkpoint every N epochs (device->host param "
                         "pulls are expensive through the tunnel)")
    ap.add_argument("--val_intervals", type=int, default=None,
                    help="validate every N epochs (-1 = never)")
    ap.add_argument("--dry_run", action="store_true",
                    help="print the command lines and exit")
    ap.add_argument("--smoke", action="store_true",
                    help="tolerate missing data/voc name (synthetic runs)")
    args = ap.parse_args(argv)

    voc = os.path.join(args.data_dir, "voc")
    if not os.path.isdir(voc) and not args.dry_run:
        print(f"ERROR: {voc} not found. Fetch Pascal VOC first:\n"
              f"  bash tools_tpu/get_pascal_voc.sh\n"
              f"  python tools_tpu/merge_pascal_json.py", file=sys.stderr)
        return 2

    summary = {}
    for name in args.configs.split(","):
        exp, stages = build_commands(name, args)
        exp_dir = os.path.join(REPO, "exp", "ctdet", exp)
        for stage, cmd in stages:
            if args.dry_run:
                print(f"[{name}:{stage}] {' '.join(cmd)}")
                continue
            if stage_done(exp_dir, stage, args):
                print(f"[{name}:{stage}] done already, skipping")
                continue
            print(f"[{name}:{stage}] {' '.join(cmd)}", flush=True)
            rc = subprocess.call(cmd, cwd=REPO)
            # the axon TPU tunnel has transient multi-minute outages; a
            # dead stage is retried from its own model_last (--resume)
            for attempt in range(args.retries):
                if rc == 0:
                    break
                retry_cmd = list(cmd)
                if stage == "fp32_train" and "--resume" not in retry_cmd \
                        and os.path.exists(
                            os.path.join(exp_dir, "model_last.ckpt")):
                    retry_cmd.append("--resume")
                print(f"[{name}:{stage}] rc={rc}; retry "
                      f"{attempt + 1}/{args.retries}", flush=True)
                rc = subprocess.call(retry_cmd, cwd=REPO)
            if rc != 0:
                print(f"[{name}:{stage}] FAILED rc={rc}", file=sys.stderr)
                return rc
            if stage in ("fp32_train", "qat_finetune"):
                marker = ".fp32_done" if stage == "fp32_train" \
                    else ".qat_done"
                open(os.path.join(exp_dir, marker), "w").close()
            elif stage.startswith("eval_"):
                # archive this eval's detections under a stage-tagged
                # name (results.json is rewritten by every test.py run;
                # the tagged copy is what summarize_results.py scores)
                tag = stage[len("eval_"):]
                src = os.path.join(exp_dir, "results.json")
                if os.path.exists(src):
                    import shutil
                    shutil.copyfile(
                        src, os.path.join(exp_dir,
                                          f"results_{tag}.json"))
        if not args.dry_run:
            summary[name] = {"exp_dir": exp_dir,
                             "target_ap50": CONFIGS[name]["ap50"]}
    if summary:
        out = os.path.join(REPO, "exp", "configs_ae_summary.json")
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
