#!/usr/bin/env python
"""Rename ExtremeNet hourglass checkpoint keys to CenterNet head names.

Port of reference tools/convert_hourglass_weight.py: the public
ExtremeNet_500000.pkl names its heads t_heats/l_heats/b_heats/r_heats/
ct_heats/..., while the exdet task expects hm_t/hm_l/hm_b/hm_r/hm_c/
reg_* — a pure state-dict key rename (with the reference's guard that
'ct_heats' must not match the 't_heats' substring rule). Output is the
reference's {'epoch': 0, 'state_dict'} torch format, ready for
convert_torch_ckpt-style ingestion or reference-side use.

Usage:
  python tools_tpu/convert_hourglass_weight.py ExtremeNet_500000.pkl out.pth
"""

from __future__ import annotations

import argparse
import sys

KEY_MAP = {"t_heats": "hm_t", "l_heats": "hm_l", "b_heats": "hm_b",
           "r_heats": "hm_r", "ct_heats": "hm_c",
           "t_regrs": "reg_t", "l_regrs": "reg_l",
           "b_regrs": "reg_b", "r_regrs": "reg_r"}


def convert_state_dict(state_dict):
    """Apply the reference's rename rules (convert_hourglass_weight.py:
    10-26) to a mapping of parameter names."""
    out = {}
    for k in state_dict.keys():
        changed = False
        for m in KEY_MAP:
            if m in k:
                # 'ct_heats' contains 't_heats'; the specific rule wins
                if "ct_heats" in k and m == "t_heats":
                    continue
                new_k = k.replace(m, KEY_MAP[m])
                out[new_k] = state_dict[k]
                changed = True
        if not changed:
            out[k] = state_dict[k]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model_path")
    ap.add_argument("out_path")
    args = ap.parse_args(argv)

    import torch
    state_dict = torch.load(args.model_path, map_location="cpu",
                            weights_only=False)
    if isinstance(state_dict, dict) and "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    out = convert_state_dict(state_dict)
    renames = sum(1 for k in out if k not in state_dict)
    torch.save({"epoch": 0, "state_dict": out}, args.out_path)
    print(f"renamed {renames} keys -> {args.out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
