#!/usr/bin/env python
"""Analytic speed-of-light roofline for the flagship detector on v5e.

Models every layer of PoseShuffleNetV2 (256x256 config-a and 512x512
--w2 config-e shapes) as the kernels ACTUALLY execute on TPU — not the
thop-style "useful MAC" count the reference profiles with
(lib/utils/profiler.py). The distinction is load-bearing here: the
Pallas deform kernels realize a 9-tap SPARSE gather as a DENSE
(tile x band)-by-(band x C) MXU contraction (ops/deform_pallas.py) —
that is the co-design that makes the op fast on a systolic array, and it
multiplies executed FLOPs by ~band/9 over the useful count. An "MFU"
quoted against useful FLOPs (BENCH train_mfu_pct) therefore understates
hardware utilization by that same factor; this tool reports both.

Per layer: executed MXU FLOPs, VPU element-ops (bilinear factor builds,
depthwise convs, elementwise tails XLA cannot fuse into a matmul), and
minimum HBM traffic (inputs read once + outputs written once + weights;
BN/ReLU/quant tails assumed fused — XLA does fuse these). Speed of
light per layer = max(t_MXU, t_VPU, t_HBM); the step bound is the sum
(TPU kernels serialize per core). Compare against bench.py measurements
to see which layers sit on which roof and where real headroom is.

v5e (one chip): 197 bf16 TFLOP/s (f32 ~1/4, int8 2x), ~819 GB/s HBM,
VPU ~3.85 T element-ops/s (8x128 lanes x 4 ALUs x 940 MHz).

Usage: python tools_tpu/roofline.py [--res 256] [--batch 128] [--w2]
       [--dtype bf16|f32] [--train]
"""

from __future__ import annotations

import argparse

MXU_BF16 = 197e12
MXU_F32 = MXU_BF16 / 4
MXU_INT8 = 2 * MXU_BF16
HBM_BPS = 819e9
VPU_OPS = 3.85e12


def _p(res, stride):
    return res // stride


class Model:
    """Accumulates layer entries with executed-cost estimates."""

    def __init__(self, batch, dtype):
        self.b = batch
        self.itemsize = 2 if dtype == "bf16" else 4
        self.mxu = MXU_BF16 if dtype == "bf16" else MXU_F32
        self.rows = []
        self.useful_flops = 0.0

    def add(self, name, mxu_flops=0.0, vpu_ops=0.0, bytes_=0.0,
            useful=None):
        b = self.b
        self.rows.append((name, mxu_flops * b, vpu_ops * b, bytes_ * b))
        self.useful_flops += (useful if useful is not None else mxu_flops) \
            * b

    def conv(self, name, hw, cin, cout, k=1, act_in=True):
        """Standard conv: 2*K*K*HW*cin*cout MACs on the MXU."""
        fl = 2.0 * k * k * hw * cin * cout
        by = (hw * cin + hw * cout) * self.itemsize + k * k * cin * cout \
            * self.itemsize
        if not act_in:  # input produced by previous layer & still in HBM
            by -= hw * cin * self.itemsize
        self.add(name, mxu_flops=fl, bytes_=by)

    def dwconv(self, name, hw, c, k=3):
        """Depthwise conv: feature_group_count=C; XLA lowers it without a
        dense contraction — count as VPU ops + pure traffic."""
        ops = 2.0 * k * k * hw * c
        by = 2 * hw * c * self.itemsize
        self.add(name, vpu_ops=ops, bytes_=by, useful=ops)

    def deform(self, name, hw, c, w_dim, banded):
        """Pallas codesign deform: dense B contraction per tap.

        Executed MACs per tap = HW * q_cols * C where q_cols = the band
        (banded) or the whole padded map (dense regime). Factor build =
        6 per-axis factors of (HW, q_cols) elements, ~8 VPU ops each.
        Useful MACs = 9 * HW * C (the sparse op a CUDA kernel would do).
        """
        if banded:
            tile = min(hw, 128)
            tile_span = (tile - 1) // w_dim + 2
            band_rows = tile_span + 8 + 10
            q_cols = band_rows * w_dim
        else:
            q_cols = hw
        fl = 9 * 2.0 * hw * q_cols * c
        vpu = 6 * 8.0 * hw * q_cols
        by = (2 * hw * c + hw) * self.itemsize
        self.add(name, mxu_flops=fl, vpu_ops=vpu, bytes_=by,
                 useful=9 * 2.0 * hw * c)

    def upsample(self, name, hw_out, c):
        by = (hw_out // 4 + hw_out) * c * self.itemsize
        self.add(name, vpu_ops=float(hw_out * c), bytes_=by, useful=0.0)


def build(res=256, w2=False, batch=128, dtype="bf16", heads=None,
          fused_heads=False):
    heads = heads or {"hm": 20, "wh": 2, "reg": 2}
    ch = [24, 244, 488, 976, 2153] if w2 else [24, 116, 232, 464, 1024]
    m = Model(batch, dtype)

    hw4 = _p(res, 4) ** 2
    m.conv("layer0 3x3s4 3->%d" % ch[0], hw4, 3, ch[0], k=3)

    # stages: stride-2 node + N stride-1 nodes. Stride-1 node (half the
    # channels through branch2): pw(c/2), dw3x3(c/2), pw(c/2).
    # Stride-2 node: b1 = dw3x3 s2 + pw; b2 = pw, dw3x3 s2, pw.
    for si, (reps, stride_hw) in enumerate(
            zip([3, 7, 3], [_p(res, 8) ** 2, _p(res, 16) ** 2,
                            _p(res, 32) ** 2])):
        cin = ch[si]
        c = ch[si + 1]
        pre = "stage%d" % (si + 1)
        # stride-2 node (input at 4x the output hw)
        m.dwconv(pre + ".down.b1dw", stride_hw, cin)
        m.conv(pre + ".down.b1pw", stride_hw, cin, c // 2)
        m.conv(pre + ".down.b2pw1", stride_hw * 4, cin, c // 2)
        m.dwconv(pre + ".down.b2dw", stride_hw, c // 2)
        m.conv(pre + ".down.b2pw2", stride_hw, c // 2, c // 2)
        for r in range(reps):
            m.conv("%s.%d.pw1" % (pre, r), stride_hw, c // 2, c // 2)
            m.dwconv("%s.%d.dw" % (pre, r), stride_hw, c // 2)
            m.conv("%s.%d.pw2" % (pre, r), stride_hw, c // 2, c // 2)

    hw32 = _p(res, 32) ** 2
    m.conv("layer4 1x1 %d->%d" % (ch[3], ch[4]), hw32, ch[3], ch[4])

    # deconv stage: deform(cin) + 1x1 mixer + 2x up, at /32 -> /16 -> /8
    planes = [256, 128, 64]
    cin = ch[4]
    for i, p in enumerate(planes):
        s = 32 >> i
        hw = _p(res, s) ** 2
        w_dim = _p(res, s)
        m.conv("deconv%d.scale 1x1 %d->1" % (i, cin), hw, cin, 1)
        # forward banding gate: hw_pad > 1024 and w % sublane == 0
        banded = hw > 1024 and w_dim % 8 == 0
        m.deform("deconv%d.deform dw3x3 C=%d%s"
                 % (i, cin, " BANDED" if banded else ""), hw, cin, w_dim,
                 banded)
        m.conv("deconv%d.mixer 1x1 %d->%d" % (i, cin, p), hw, cin, p)
        m.upsample("deconv%d.up2x" % i, hw * 4, p)
        cin = p

    hw_out = _p(res, 4) ** 2
    # heads: 1x1(64->head_conv) + dw3x3 + 1x1(->classes)
    # (models/shufflenetv2.py Head / reference shufflenetv2_dcn.py:244-271)
    if fused_heads:
        # models/fused_heads.py: one widened pipeline, neck read once
        nh = len(heads)
        cmax = max(heads.values())
        m.conv("heads(fused) 1x1 64->%d" % (64 * nh), hw_out, 64, 64 * nh)
        m.dwconv("heads(fused) dw3x3", hw_out, 64 * nh)
        m.conv("heads(fused) grouped 1x1", hw_out, 64, cmax * nh)
    else:
        for name, classes in heads.items():
            m.conv("head_%s 1x1 64->64" % name, hw_out, 64, 64)
            m.dwconv("head_%s dw3x3" % name, hw_out, 64)
            m.conv("head_%s 1x1 64->%d" % (name, classes), hw_out, 64,
                   classes)
    return m


def report(m, label, extra_rows=()):
    print("== %s ==" % label)
    print("%-28s %9s %9s %9s  %8s %8s %8s  %8s %s"
          % ("layer", "GFLOP", "GVPUop", "MB", "t_mxu", "t_vpu",
             "t_hbm", "t_SoL", "roof"))
    tot = [0.0, 0.0, 0.0, 0.0]
    for name, fl, vpu, by in list(m.rows) + list(extra_rows):
        t_m = fl / m.mxu
        t_v = vpu / VPU_OPS
        t_h = by / HBM_BPS
        t = max(t_m, t_v, t_h)
        roof = ("MXU", "VPU", "HBM")[(t_m, t_v, t_h).index(t)]
        tot[0] += fl
        tot[1] += vpu
        tot[2] += by
        tot[3] += t
        print("%-28s %9.2f %9.2f %9.1f  %8.3f %8.3f %8.3f  %8.3f %s"
              % (name, fl / 1e9, vpu / 1e9, by / 1e6, t_m * 1e3,
                 t_v * 1e3, t_h * 1e3, t * 1e3, roof))
    print("%-28s %9.2f %9.2f %9.1f  %31s  %8.3f ms"
          % ("TOTAL", tot[0] / 1e9, tot[1] / 1e9, tot[2] / 1e6, "",
             tot[3] * 1e3))
    print("useful (thop-style) GFLOP: %.2f  -> executed/useful = %.1fx"
          % (m.useful_flops / 1e9, tot[0] / max(m.useful_flops, 1)))
    print("SoL img/s at batch: %.0f" % (m.b / tot[3]))
    return tot


def train_rows(m):
    """Backward executed-cost multipliers: standard convs ~2x the forward
    matmul FLOPs (dgrad+wgrad); deform backward = (8*{Dx,B^Tg}+{B^Tg})/9
    ~1.89x forward matmuls + dR factor builds; dw convs ~2x VPU+traffic;
    optimizer (Adam) = 1 read+write of params+2 moments (f32)."""
    rows = []
    for name, fl, vpu, by in m.rows:
        rows.append(("bwd:" + name, fl * (17.0 / 9.0 if "deform" in name
                                          else 2.0), vpu * 2.0, by * 2.0))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--w2", action="store_true")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--fused_heads", action="store_true",
                    help="model the fused-heads eval path "
                         "(models/fused_heads.py; eval default)")
    a = ap.parse_args()
    m = build(res=a.res, w2=a.w2, batch=a.batch, dtype=a.dtype,
              fused_heads=a.fused_heads)
    label = "%d^2 %s b%d %s" % (a.res, "w2" if a.w2 else "w1", a.batch,
                                a.dtype)
    if a.train:
        report(m, label + " TRAIN (fwd+bwd)", extra_rows=train_rows(m))
    else:
        report(m, label + " INFER (decode excluded; measured ~1.5 ms "
               "at b128/256 after pooled top-k)")


if __name__ == "__main__":
    main()
