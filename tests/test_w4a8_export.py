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
