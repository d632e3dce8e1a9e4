#!/usr/bin/env python
"""Throughput benchmark: ctdet inference images/sec/chip at 256x256.

Runs the fused forward+decode program (the config-a inference path) on the
real TPU chip and prints ONE JSON line. Baseline for vs_baseline: 2000
img/s/chip (BASELINE.md rebuild target; the reference's own numbers are
FPGA fps — 32.2 fps config a — not comparable hardware).

Timing note: on the axon backend `block_until_ready` is a no-op, so every
measurement closes with a scalar host transfer, which is the only reliable
sync point. The benchmarked program therefore returns a checksum scalar in
addition to the detections it computes.
"""

from __future__ import annotations

import json
import time


def bench_ctdet(input_res=256, batches=(64, 128, 256), iters=100, warm=30,
                dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from codenet_tpu.models import create_model
    from codenet_tpu.models import decode as D

    heads = {"hm": 20, "wh": 2, "reg": 2}
    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
    model = create_model("shufflenetv2", heads, 64, dtype=compute_dtype)

    best, best_bs = 0.0, 0
    for bs in batches:
        x = jnp.asarray(
            np.random.RandomState(0).randn(bs, input_res, input_res, 3)
            .astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def infer(variables, images):
            out = model.apply(variables, images, train=False)
            hm = jax.nn.sigmoid(out["hm"])
            dets = D.ctdet_decode(hm, out["wh"], out["reg"], k=100)
            return dets, jnp.sum(dets[..., 4])

        for _ in range(warm):
            dets, chk = infer(variables, x)
        float(chk)  # hard sync
        t0 = time.perf_counter()
        for _ in range(iters):
            dets, chk = infer(variables, x)
        float(chk)  # hard sync
        dt = time.perf_counter() - t0
        ips = bs * iters / dt
        if ips > best:
            best, best_bs = ips, bs
    return best, best_bs


def main():
    best, best_bs = bench_ctdet()
    baseline = 2000.0  # img/s/chip rebuild target (BASELINE.md)
    print(json.dumps({
        "metric": "ctdet_inference_throughput_256",
        "value": round(best, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / baseline, 3),
        "batch_size": best_bs,
    }))


if __name__ == "__main__":
    main()
