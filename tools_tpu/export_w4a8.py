#!/usr/bin/env python
"""Export the W4A8 deployment artifact from a QAT checkpoint.

The reference publishes its models as the quantizer's 4-bit parameter
files — 0.76 MB at 1x width, 2.90 MB at 2x (README.md:14-18). This tool
writes the equivalent for a codenet-tpu QAT checkpoint: packed int4
weight levels + per-channel scales + folded biases + frozen activation
ranges (engine/w4a8.py), loadable with `test.py ... --resume-quantize
--int8_infer --w4a8_artifact <path>` for a bit-identical deployed eval.

Usage (same flags as test.py):
  python tools_tpu/export_w4a8.py ctdet --arch shufflenetv2 \
      --dataset pascal --head_conv 64 --exp_id myexp --resume \
      --resume-quantize [--w2] [--maxpool] [--out path.npz]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i:i + 2]

    import jax
    import jax.numpy as jnp

    from codenet_tpu import config as cfg
    from codenet_tpu.engine import checkpoint, w4a8
    from codenet_tpu.models import create_model
    from codenet_tpu.models.layers import QuantSpec

    opt = cfg.parse(argv)
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS[opt.dataset])
    if not getattr(opt, "resume_quantize", False):
        print("ERROR: export requires a QAT checkpoint "
              "(--resume-quantize)", file=sys.stderr)
        return 2
    qspec = QuantSpec(w_bit=opt.w_bit, a_bit=opt.a_bit,
                      wt_mode="symmetric", act_mode="asymmetric",
                      per_channel=True, wt_percentile=opt.wt_percentile,
                      act_percentile=opt.act_percentile,
                      int8_infer=True,
                      act_clamp=getattr(opt, "act_clamp", False))
    model = create_model(opt.arch, opt.heads, opt.head_conv,
                         w2=opt.w2, maxpool=opt.maxpool, qspec=qspec)
    init_vars = dict(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, opt.input_h, opt.input_w, 3), jnp.float32)))
    variables, _, _ = checkpoint.load_model(opt.load_model, init_vars)

    out = out or os.path.join(os.path.dirname(opt.load_model),
                              "model_w4a8.npz")
    sizes = w4a8.export_w4a8(model, variables,
                             (opt.input_h, opt.input_w), out)
    total_kb = sizes["file_bytes"] / 1e3
    print(f"wrote {out}")
    for k, v in sizes.items():
        print(f"  {k}: {v / 1e3:.1f} KB")
    print(f"W4A8 artifact: {total_kb / 1e3:.3f} MB "
          f"(reference targets: 0.76 MB 1x / 2.90 MB 2x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
