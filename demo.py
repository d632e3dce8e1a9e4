#!/usr/bin/env python
"""Run a trained detector on images and save visualizations.

Activates the reference's `--demo` flag (lib/opts.py:25 keeps it but the
CoDeNet fork dropped upstream CenterNet's demo.py entry point): pass an
image file or a directory, detections above --vis_thresh are drawn with
the Debugger's class colors into <save_dir>/demo/.

Usage:
  python demo.py ctdet --demo path/to/img_or_dir --load_model model.ckpt \
      --arch shufflenetv2 --dataset pascal [--vis_thresh 0.3] [--flip_test]
"""

from __future__ import annotations

import os
import sys

IMG_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".ppm", ".bmp")


def main(argv=None):
    import cv2
    from codenet_tpu import config as cfg
    from codenet_tpu.engine.detector import detector_factory
    from codenet_tpu.utils.debugger import Debugger

    opt = cfg.parse(argv)
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS[opt.dataset])
    if not opt.demo:
        print("demo.py needs --demo <image-or-directory>", file=sys.stderr)
        return 2
    if os.path.isdir(opt.demo):
        paths = sorted(
            os.path.join(opt.demo, f) for f in os.listdir(opt.demo)
            if f.lower().endswith(IMG_EXTS))
    else:
        paths = [opt.demo]
    if not paths:
        print(f"no images found under {opt.demo}", file=sys.stderr)
        return 2

    detector = detector_factory(opt.task)(opt)
    out_dir = os.path.join(opt.save_dir, "demo")
    os.makedirs(out_dir, exist_ok=True)
    dataset_names = {
        "pascal": "pascal", "coco": "coco", "coco_hp": "coco_hp",
        "kitti": "kitti"}
    for path in paths:
        ret = detector.run(path)
        img = cv2.imread(path)
        debugger = Debugger(dataset=dataset_names.get(opt.dataset),
                            num_classes=opt.num_classes)
        debugger.add_img(img, img_id="demo")
        n_drawn = 0
        for cls_1based, dets in ret["results"].items():
            for det in dets:
                if det[4] >= opt.vis_thresh:
                    debugger.add_coco_bbox(det[:4], cls_1based - 1,
                                           det[4], img_id="demo")
                    n_drawn += 1
        out = os.path.join(
            out_dir, os.path.splitext(os.path.basename(path))[0] + ".png")
        cv2.imwrite(out, debugger.imgs["demo"])
        print(f"{path}: {n_drawn} detections >= {opt.vis_thresh} -> {out} "
              f"(net {ret['net']:.3f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
