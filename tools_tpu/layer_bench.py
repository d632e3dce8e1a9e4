#!/usr/bin/env python
"""Standalone kernel/layer micro-benchmarks on the current backend.

One command to A/B the pieces bench.py aggregates (run on the real TPU):

  python tools_tpu/layer_bench.py deform        # fwd+bwd per deconv shape,
                                                # rolled vs CODENET_BANDED_UNROLLED
  python tools_tpu/layer_bench.py heads         # fused vs per-head eval heads
  python tools_tpu/layer_bench.py decode        # ctdet_decode alone

Each entry prints one JSON line {name, ms, img_per_s?}. The deform mode
re-jits per flag setting (the flag is read at trace time). Timing syncs
via scalar host transfers (axon block_until_ready is a no-op).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, iters=50, warm=10):
    for _ in range(warm):
        chk = fn()
    float(chk)
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = fn()
    float(chk)
    return (time.perf_counter() - t0) / iters


def _emit(name, ms, batch=None):
    row = {"name": name, "ms": round(ms * 1e3, 3)}
    if batch:
        row["img_per_s"] = round(batch / ms, 1)
    print(json.dumps(row), flush=True)


def bench_deform(batch=128, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    # the three deconv shapes of 256^2 config-a plus the 512^2-w2 tail
    shapes = [("deconv0 8x8x1024", 8, 8, 1024), ("deconv1 16x16x256",
                                                 16, 16, 256),
              ("deconv2 32x32x128", 32, 32, 128),
              ("w2-deconv2 64x64x128", 64, 64, 128)]
    for flag in ("0", "1"):
        os.environ["CODENET_BANDED_UNROLLED"] = flag
        # import AFTER the env var so nothing is cached against it; the
        # flag is read at trace time, so fresh jit instances per setting
        from codenet_tpu.ops import deform_pallas as DP
        tag = "unrolled" if flag == "1" else "rolled"
        for name, h, w, c in shapes:
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.randn(batch, h, w, c).astype(dt))
            s = jnp.asarray(rng.uniform(-2, 3, (batch, h, w, 1))
                            .astype(np.float32))
            wk = jnp.asarray((rng.randn(3, 3, 1, c) * 0.2).astype(dt))

            fwd = jax.jit(lambda x, s, w: jnp.sum(
                DP.codesign_deform_conv_fast(x, s, w)
                .astype(jnp.float32)))
            _emit(f"deform_fwd[{tag}] {name}", _time(lambda: fwd(x, s, wk)),
                  batch)

            grad = jax.jit(jax.grad(lambda x, s, w: jnp.sum(
                DP.codesign_deform_conv_fast(x, s, w)
                .astype(jnp.float32)), argnums=(0, 1, 2)))

            def gstep():
                dx, ds, dw = grad(x, s, wk)
                return jnp.sum(ds)
            _emit(f"deform_fwd+bwd[{tag}] {name}", _time(gstep), batch)
    os.environ.pop("CODENET_BANDED_UNROLLED", None)


def bench_heads(batch=128, res=64, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from codenet_tpu.models import create_model
    from codenet_tpu.models.fused_heads import apply_fused_heads

    dt = jnp.bfloat16 if dtype == "bfloat16" else None
    heads = {"hm": 20, "wh": 2, "reg": 2}
    model = create_model("shufflenetv2", heads, 64, dtype=dt)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(batch, res * 4, res * 4, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    neck = jax.jit(lambda v, x: model.apply(v, x, train=False,
                                            return_neck=True))(variables, x)
    neck = jax.block_until_ready(neck)

    heads_t = tuple(heads.items())

    fused = jax.jit(lambda v, n: sum(
        jnp.sum(o.astype(jnp.float32))
        for o in apply_fused_heads(v, n, heads_t, dtype=dt).values()))
    _emit("heads fused", _time(lambda: fused(variables, neck)), batch)

    def per_head(v, images):
        out = model.apply(v, images, train=False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out.values())

    full = jax.jit(per_head)
    neck_only = jax.jit(lambda v, x: jnp.sum(model.apply(
        v, x, train=False, return_neck=True).astype(jnp.float32)))
    t_full = _time(lambda: full(variables, x))
    t_neck = _time(lambda: neck_only(variables, x))
    _emit("heads per-head (full - neck)", t_full - t_neck, batch)
    _emit("net full (per-head heads)", t_full, batch)
    _emit("net neck only", t_neck, batch)


def bench_decode(batch=128, res=64, classes=20, k=100):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from codenet_tpu.models import decode as D

    rng = np.random.RandomState(0)
    hm = jnp.asarray(rng.rand(batch, res, res, classes).astype(np.float32))
    wh = jnp.asarray(rng.rand(batch, res, res, 2).astype(np.float32))
    reg = jnp.asarray(rng.rand(batch, res, res, 2).astype(np.float32))
    dec = jax.jit(lambda h, w, r: jnp.sum(
        D.ctdet_decode(h, w, r, k=k)[..., 4]))
    _emit("ctdet_decode", _time(lambda: dec(hm, wh, reg)), batch)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("deform", "all"):
        bench_deform()
    if which in ("heads", "all"):
        bench_heads()
    if which in ("decode", "all"):
        bench_decode()


if __name__ == "__main__":
    main()
