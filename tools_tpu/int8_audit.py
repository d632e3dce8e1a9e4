#!/usr/bin/env python
"""Layer-by-layer fake-quant vs real-int8 numerics audit (SURVEY hard
part #6; VERDICT r3 #5).

Runs the flagship ShuffleNetV2-DCN once under each of three quantization
semantics and diffs EVERY module's output activation:

  qat      — unclamped asymmetric fake-quant (the reference's training
             numerics; quant_utils.py:191-198 never clamps, so
             out-of-EMA-range activations pass through exactly)
  clamped  — fake-quant with the int8 representable-window clamp
             (--act_clamp; deployment-faithful ranges, float compute)
  int8     — real int8 storage + integer conv + fused requantization
             (ops/quant.py int8_conv, the deployed path)

The per-layer table separates the two error sources the SYNTH_DELTAS
bands pin end-to-end: `clamped-vs-qat` is pure range-clamp semantics
(large wherever EMA ranges undershoot the activation distribution) and
`int8-vs-clamped` is pure integer-lowering error (rounding once per
layer; should stay at the requant-noise floor everywhere). The first
layer whose int8-vs-clamped divergence exceeds the noise floor is the
lowering bug hunter's entry point.

Usage:
  python tools_tpu/int8_audit.py                       # random weights+calib
  python tools_tpu/int8_audit.py --ckpt exp/ctdet/x/model_last.ckpt
  python tools_tpu/int8_audit.py --json audit.json --input_res 128
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _flatten_intermediates(tree, prefix=()):
    """Intermediates tree -> {path: array}; dequantize QTensor outputs."""
    from codenet_tpu.ops.quant import QTensor
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_intermediates(v, prefix + (k,)))
        return out
    if isinstance(tree, tuple) and not isinstance(tree, QTensor):
        for i, v in enumerate(tree):
            if len(tree) == 1:
                out.update(_flatten_intermediates(v, prefix))
            else:
                out.update(_flatten_intermediates(v, prefix + (str(i),)))
        return out
    if isinstance(tree, QTensor):
        out["/".join(prefix)] = np.asarray(tree.dequant())
        return out
    if hasattr(tree, "shape"):
        out["/".join(prefix)] = np.asarray(tree)
    return out


def run_audit(ckpt=None, input_res=128, seed=0, w_bit=4, a_bit=8,
              percentile=False):
    import jax
    import jax.numpy as jnp
    from codenet_tpu.models.factory import create_model
    from codenet_tpu.models.layers import QuantSpec

    heads = {"hm": 20, "wh": 2, "reg": 2}
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(1, input_res, input_res, 3), jnp.float32)

    def build(spec):
        return create_model("shufflenetv2", heads, head_conv=64, qspec=spec)

    specs = {
        "qat": QuantSpec(w_bit=w_bit, a_bit=a_bit, wt_percentile=percentile),
        "clamped": QuantSpec(w_bit=w_bit, a_bit=a_bit,
                             wt_percentile=percentile, act_clamp=True),
        "int8": QuantSpec(w_bit=w_bit, a_bit=a_bit,
                          wt_percentile=percentile,
                          act_clamp=True, int8_infer=True),
    }

    # one parameter tree for all three (the config-switch design: the
    # tree is identical across modes)
    model = build(specs["qat"])
    variables = model.init(jax.random.PRNGKey(seed), x)
    if ckpt:
        from codenet_tpu.engine.checkpoint import load_model
        variables, _, _ = load_model(ckpt, variables)
    else:
        # calibrate EMA act ranges with a few forward passes in
        # range-update mode so the quant paths see realistic windows
        variables = dict(variables)
        for _ in range(4):
            calib = jnp.asarray(rng.rand(1, input_res, input_res, 3),
                                jnp.float32)
            _, mut = model.apply(variables, calib, train=False,
                                 update_stats=True,
                                 mutable=["quant_stats", "batch_stats"])
            variables.update(mut)

    captured = {}
    for name, spec in specs.items():
        m = build(spec)
        _, inter = m.apply(
            variables, x, train=False,
            capture_intermediates=lambda mdl, method: method == "__call__",
            mutable=["intermediates"])
        captured[name] = _flatten_intermediates(
            inter["intermediates"], ())

    common = [k for k in captured["qat"]
              if k in captured["clamped"] and k in captured["int8"]
              and captured["qat"][k].shape == captured["int8"][k].shape]

    rows = []
    for k in common:
        a, b, c = (captured["qat"][k], captured["clamped"][k],
                   captured["int8"][k])
        scale = max(float(np.abs(b).max()), 1e-6)
        rows.append({
            "layer": k,
            "shape": list(a.shape),
            "clamped_vs_qat": float(np.abs(b - a).max()) / scale,
            "int8_vs_clamped": float(np.abs(c - b).max()) / scale,
        })
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--input_res", type=int, default=128)
    ap.add_argument("--w_bit", type=int, default=4)
    ap.add_argument("--a_bit", type=int, default=8)
    ap.add_argument("--percentile", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--lowering_tol", type=float, default=0.05,
                    help="relative int8-vs-clamped threshold above which "
                         "a layer is flagged as a lowering divergence")
    args = ap.parse_args(argv)

    rows = run_audit(args.ckpt, args.input_res, w_bit=args.w_bit,
                     a_bit=args.a_bit, percentile=args.percentile)
    print(f"{'layer':60s} {'clamp-vs-qat':>14s} {'int8-vs-clamp':>14s}")
    for r in rows:
        flag = " <-- LOWERING" if r["int8_vs_clamped"] > args.lowering_tol \
            else ""
        print(f"{r['layer'][:60]:60s} {r['clamped_vs_qat']:14.5f} "
              f"{r['int8_vs_clamped']:14.5f}{flag}")
    bad = [r for r in rows if r["int8_vs_clamped"] > args.lowering_tol]
    worst_clamp = max(rows, key=lambda r: r["clamped_vs_qat"])
    print(f"\n{len(rows)} layers; {len(bad)} above the int8 lowering "
          f"tolerance {args.lowering_tol}")
    print(f"largest clamp-semantics divergence: {worst_clamp['layer']} "
          f"({worst_clamp['clamped_vs_qat']:.4f})")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "lowering_tol": args.lowering_tol,
                       "flagged": [r["layer"] for r in bad]}, f, indent=1)
        print(f"wrote {args.json}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
