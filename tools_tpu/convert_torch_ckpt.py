#!/usr/bin/env python
"""Convert a reference CoDeNet torch checkpoint (.pth) to this framework.

Thin CLI over codenet_tpu.engine.torch_import (the engine imports the
same conversion core so `--load_model foo.pth` also works directly).

Usage:
  python tools_tpu/convert_torch_ckpt.py model_last.pth out.ckpt \
      [--heads hm,wh,reg] [--pytorchcv_backbone]
"""

from __future__ import annotations

import argparse
import sys

from codenet_tpu.engine.torch_import import (  # noqa: F401 (re-exports)
    PYTORCHCV_RENAMES, conv_w, convert_pretrained_backbone,
    convert_shufflenetv2, pytorchcv_to_reference_names)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--heads", default="hm,wh,reg")
    ap.add_argument("--pytorchcv_backbone", action="store_true",
                    help="src is a pytorchcv shufflenetv2 checkpoint; "
                         "convert only the backbone (partial warm start)")
    args = ap.parse_args(argv)

    import torch
    payload = torch.load(args.src, map_location="cpu")
    sd = payload.get("state_dict", payload)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    if args.pytorchcv_backbone:
        variables = convert_pretrained_backbone(sd,
                                                heads=args.heads.split(","))
    else:
        variables = convert_shufflenetv2(sd, heads=args.heads.split(","))

    from codenet_tpu.engine.checkpoint import save_model
    save_model(args.dst, payload.get("epoch", 0), variables)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
