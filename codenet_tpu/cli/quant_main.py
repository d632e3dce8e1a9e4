"""QAT training CLI (reference quant_main.py:19-113).

Loads an FP32 checkpoint, switches the SAME parameter tree into quantized
execution (replacing the reference's in-place graph surgery,
quant_main.py:43-47), fine-tunes with STE gradients and EMA activation
ranges, and force-runs a final eval (quant_main.py:104-107).
"""

from __future__ import annotations

from .. import config as cfg
from ..models.layers import QuantSpec
from .main import run_training


def main(argv=None):
    opt = cfg.parse(argv)
    qspec = QuantSpec(w_bit=opt.w_bit, a_bit=opt.a_bit,
                      wt_mode="symmetric", act_mode="asymmetric",
                      per_channel=True, wt_percentile=opt.wt_percentile,
                      act_percentile=opt.act_percentile,
                      act_clamp=getattr(opt, "act_clamp", False))
    return run_training(opt, qspec=qspec)


if __name__ == "__main__":
    main()
