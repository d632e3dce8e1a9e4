"""W4A8 deployment artifact: round-trip exactness + the size claim.

The reference's published models are the quantizer's 4-bit parameter
files — 0.76 MB (1x) / 2.90 MB (2x --w2) (README.md:14-18). These tests
pin (a) that eval from the packed artifact is BIT-IDENTICAL to the int8
eval from the float checkpoint (engine/w4a8.py load path vs the runtime
derivation it replaces), and (b) that the artifact for the flagship
configs lands at the reference's sizes.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codenet_tpu.engine import w4a8
from codenet_tpu.models import create_model
from codenet_tpu.models.layers import QuantSpec

HEADS = {"hm": 4, "wh": 2, "reg": 2}
VOC_HEADS = {"hm": 20, "wh": 2, "reg": 2}


def test_pack_unpack_int4_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.randint(-8, 8, size=(3, 3, 7, 5)).astype(np.int8)
    packed = w4a8.pack_int4(q)
    assert packed.nbytes == (q.size + 1) // 2
    np.testing.assert_array_equal(w4a8.unpack_int4(packed, q.shape), q)


def _qat_model_and_vars(w2=False, res=64):
    qs = QuantSpec(int8_infer=True)
    model = create_model("shufflenetv2", HEADS, 64, w2=w2, qspec=qs)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, res, res, 3)) * 0.5
    fake = create_model("shufflenetv2", HEADS, 64, w2=w2,
                        qspec=QuantSpec())
    v = dict(fake.init(jax.random.PRNGKey(1), x))
    for _ in range(2):
        _, upd = fake.apply(v, x, update_stats=True,
                            mutable=["quant_stats"])
        v["quant_stats"] = upd["quant_stats"]
    return model, v, x


def test_artifact_eval_bit_identical(tmp_path):
    model, v, x = _qat_model_and_vars()
    out_ckpt = model.apply(v, x)

    path = os.path.join(tmp_path, "model_w4a8.npz")
    sizes = w4a8.export_w4a8(model, v, (64, 64), path)
    assert sizes["file_bytes"] == os.path.getsize(path)

    init_vars = dict(model.init(jax.random.PRNGKey(2), x))
    loaded = w4a8.load_w4a8(path, init_vars)
    assert "deploy" in loaded
    out_art = model.apply(loaded, x)

    for head in out_ckpt:
        a, b = np.asarray(out_ckpt[head]), np.asarray(out_art[head])
        np.testing.assert_array_equal(a, b)  # bit-identical


def test_artifact_ignores_float_kernels(tmp_path):
    """The artifact must be self-contained: zeroing every covered conv
    kernel in the template changes NOTHING about the loaded eval."""
    model, v, x = _qat_model_and_vars()
    path = os.path.join(tmp_path, "model_w4a8.npz")
    w4a8.export_w4a8(model, v, (64, 64), path)

    init_vars = dict(model.init(jax.random.PRNGKey(3), x))
    loaded = w4a8.load_w4a8(path, init_vars)
    ref = model.apply(loaded, x)

    zeroed = jax.tree.map(jnp.zeros_like, loaded["params"])
    # restore the float-shipped leaves (deform kernels etc.) from loaded
    flat_l = w4a8._flatten(loaded["params"])
    flat_z = w4a8._flatten(zeroed)
    import json
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"].tobytes()).decode())
    shipped = {tuple(f["path"]) for f in manifest["floats"]
               if f["coll"] == "params"}
    for p in flat_z:
        if p in shipped:
            flat_z[p] = flat_l[p]
    loaded2 = dict(loaded, params=w4a8._unflatten(flat_z))
    out = model.apply(loaded2, x)
    for head in ref:
        np.testing.assert_array_equal(np.asarray(ref[head]),
                                      np.asarray(out[head]))


@pytest.mark.slow
def test_artifact_size_matches_reference_claim(tmp_path):
    """README.md:14-18: 0.76 MB at 1x, 2.90 MB at 2x (--w2)."""
    for w2, target_mb in ((False, 0.76), (True, 2.90)):
        qs = QuantSpec(int8_infer=True)
        model = create_model("shufflenetv2", VOC_HEADS, 64, w2=w2,
                             qspec=qs)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        fake = create_model("shufflenetv2", VOC_HEADS, 64, w2=w2,
                            qspec=QuantSpec())
        v = dict(fake.init(jax.random.PRNGKey(0), x))
        _, upd = fake.apply(v, x, update_stats=True,
                            mutable=["quant_stats"])
        v["quant_stats"] = upd["quant_stats"]
        path = os.path.join(tmp_path, f"w4a8_{int(w2)}.npz")
        sizes = w4a8.export_w4a8(model, v, (64, 64), path)
        mb = sizes["file_bytes"] / 1e6
        assert abs(mb - target_mb) / target_mb < 0.25, (
            f"w2={w2}: artifact {mb:.3f} MB vs reference "
            f"{target_mb} MB ({sizes})")


def test_init_creates_no_deploy_and_stale_deploy_is_dropped(tmp_path):
    """Regression for the stale-deploy bug (round-5 config-a int8 AP=0).

    flax makes every collection mutable during model.init, so the deploy
    capture branch used to run at init and bake integer weights derived
    from the RANDOM init — the tolerant checkpoint load then kept them
    (no deploy/* in the ckpt) and the int8 eval consumed garbage. The
    earlier bit-identity tests missed it because their params never
    changed after init (stale == fresh). Pins:
    (a) init produces no 'deploy' collection in either quant mode;
    (b) a checkpoint that CARRIES a stale deploy collection (saved by
        the buggy trainer) is dropped by load_model into a clean init;
    (c) the int8 forward follows the params: perturbing a conv kernel
        after init changes the output (weights are not frozen captures).
    """
    from codenet_tpu.engine import checkpoint

    for int8 in (False, True):
        qs = QuantSpec(int8_infer=int8)
        m = create_model("shufflenetv2", HEADS, 64, qspec=qs)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vi = dict(m.init(jax.random.PRNGKey(0), x))
        assert "deploy" not in vi, f"init captured deploy (int8={int8})"

    model, v, x = _qat_model_and_vars()
    # (b) stale-deploy checkpoint is dropped on load
    stale = dict(v, deploy={"bogus": {"q_w": np.zeros((1,), np.int8)}})
    ckpt = os.path.join(tmp_path, "stale.ckpt")
    checkpoint.save_model(ckpt, 1, stale)
    loaded, _, _ = checkpoint.load_model(ckpt, dict(v))
    assert "deploy" not in loaded

    # (c) int8 output follows params
    out_ref = model.apply(v, x)
    flat = w4a8._flatten(v["params"])
    key = next(p for p in flat if p[-1] == "kernel"
               and flat[p].ndim == 4 and flat[p].shape[2] > 1)
    flat2 = dict(flat)
    flat2[key] = flat[key] * 2.0
    v2 = dict(v, params=w4a8._unflatten(flat2))
    out2 = model.apply(v2, x)
    assert any(
        not np.array_equal(np.asarray(out_ref[h]), np.asarray(out2[h]))
        for h in out_ref), "int8 eval ignored a params change"


def test_qat_grad_reaches_deform_kernel():
    """The stale-deploy bug also froze QAT: resolve_fakequant_weight
    consumed the init-captured deform q_w (a constant), so the deform
    dw kernels received ZERO gradient for the whole fine-tune. Pin that
    the QAT fake-quant forward carries gradient back to deform_kernel."""
    qs = QuantSpec()  # fake-quant QAT mode
    model = create_model("shufflenetv2", HEADS, 64, qspec=qs)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 0.5
    v = dict(model.init(jax.random.PRNGKey(1), x))

    def loss(params):
        out = model.apply(dict(v, params=params), x)
        return sum(jnp.sum(jnp.abs(o)) for o in out.values())

    g = jax.grad(loss)(v["params"])
    flat = w4a8._flatten(g)
    dk = {p: a for p, a in flat.items() if p[-1] == "deform_kernel"}
    assert dk, "no deform kernels in the grad tree"
    for p, a in dk.items():
        assert float(jnp.max(jnp.abs(a))) > 0.0, (
            f"zero gradient on {p}: deform kernel frozen")


def test_artifact_detector_cli_path(tmp_path):
    """--w4a8_artifact end-to-end: a detector constructed with the flag
    produces the same program output as one loading the checkpoint
    (both on the real-int8 path), and refuses to load without
    --resume-quantize --int8_infer."""
    from codenet_tpu import config as cfg
    from codenet_tpu.engine import checkpoint
    from codenet_tpu.engine.detector import detector_factory

    model, v, x = _qat_model_and_vars(res=64)
    ckpt = os.path.join(tmp_path, "model_last.ckpt")
    checkpoint.save_model(ckpt, 1, v)
    art = os.path.join(tmp_path, "model_w4a8.npz")
    w4a8.export_w4a8(model, v, (64, 64), art)

    def _opt(extra=""):
        args = ("ctdet --dataset pascal --arch shufflenetv2 "
                "--input_res 64 --exp_id w4a8cli --resume-quantize "
                "--int8_infer " + extra)
        opt = cfg.parse(args.split())
        opt.heads = HEADS
        opt = cfg.update_dataset_info_and_set_heads(
            opt, cfg.DATASET_SPECS["pascal"])
        opt.heads = HEADS
        return opt

    opt_ck = _opt()
    opt_ck.load_model = ckpt
    det_ck = detector_factory("ctdet")(opt_ck)
    opt_ar = _opt(f"--w4a8_artifact {art}")
    det_ar = detector_factory("ctdet")(opt_ar)

    img = np.asarray(x[0] * 50 + 127, np.uint8)
    images, meta = det_ck.pre_process(img, 1.0)
    ti = meta["trans_inv"][None] if "trans_inv" in meta else None
    out_ck = np.asarray(det_ck.process_batch(
        np.asarray(images[:1]), np.eye(2, 3)[None]))
    out_ar = np.asarray(det_ar.process_batch(
        np.asarray(images[:1]), np.eye(2, 3)[None]))
    # not array_equal here: the ckpt detector derives q_w/scales under
    # XLA constant folding while the exporter derived them eagerly —
    # fma/reassociation gives ~1-ulp scale differences (observed 1e-11
    # on the decoded dets). The apply-level tests above pin the strict
    # bit-identity of the load path itself.
    np.testing.assert_allclose(out_ck, out_ar, rtol=1e-5, atol=1e-6)

    bad = _opt(f"--w4a8_artifact {art}")
    bad.resume_quantize = False
    with pytest.raises(ValueError):
        detector_factory("ctdet")(bad)
