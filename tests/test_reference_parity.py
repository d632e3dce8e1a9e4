"""Direct numerical parity against the reference's own torch code.

The reference's decode / losses / quantization-math modules are pure
torch-CPU (no CUDA extension needed), so we import them read-only from
/root/reference and compare outputs on random tensors — the strongest
available evidence that this rebuild computes the same functions.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def ref_modules():
    if REF + "/lib" not in sys.path:
        sys.path.insert(0, REF + "/lib")
    from models import decode as ref_decode
    from models import losses as ref_losses
    qu = _load("ref_quant_utils",
               REF + "/portable_quantizer/quantization_utils/quant_utils.py")
    return ref_decode, ref_losses, qu


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def test_ctdet_decode_matches_reference(ref_modules):
    ref_decode, _, _ = ref_modules
    from codenet_tpu.models import decode as D
    rng = np.random.RandomState(0)
    hm = rng.rand(2, 16, 16, 5).astype(np.float32)
    wh = (rng.rand(2, 16, 16, 2) * 8).astype(np.float32)
    reg = rng.rand(2, 16, 16, 2).astype(np.float32)

    ours = np.asarray(D.ctdet_decode(jnp.asarray(hm), jnp.asarray(wh),
                                     jnp.asarray(reg), k=20))
    theirs = ref_decode.ctdet_decode(_nchw(hm), _nchw(wh), _nchw(reg),
                                     K=20).numpy()
    # top-k tie-breaking may reorder equal scores; compare as sorted sets
    ours_sorted = ours[:, np.lexsort(ours[0].T[::-1])]
    theirs_sorted = theirs[:, np.lexsort(theirs[0].T[::-1])]
    np.testing.assert_allclose(np.sort(ours[..., 4], axis=1),
                               np.sort(theirs[..., 4], axis=1), atol=1e-5)
    np.testing.assert_allclose(ours_sorted, theirs_sorted, atol=1e-4)


def test_multi_pose_decode_matches_reference(ref_modules):
    """Guards the pooled topk/topk_channel rewrite: person boxes AND all
    17 snapped joint locations must equal the reference's two-stage
    selection on continuous (tie-free) inputs."""
    ref_decode, _, _ = ref_modules
    from codenet_tpu.models import decode as D
    rng = np.random.RandomState(3)
    hm = rng.rand(2, 16, 16, 1).astype(np.float32)
    wh = (rng.rand(2, 16, 16, 2) * 8).astype(np.float32)
    hps = ((rng.rand(2, 16, 16, 34) - 0.5) * 6).astype(np.float32)
    reg = rng.rand(2, 16, 16, 2).astype(np.float32)
    hm_hp = rng.rand(2, 16, 16, 17).astype(np.float32)
    hp_off = rng.rand(2, 16, 16, 2).astype(np.float32)

    ours = np.asarray(D.multi_pose_decode(
        jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(hps),
        reg=jnp.asarray(reg), hm_hp=jnp.asarray(hm_hp),
        hp_offset=jnp.asarray(hp_off), k=20))
    theirs = ref_decode.multi_pose_decode(
        _nchw(hm), _nchw(wh), _nchw(hps), reg=_nchw(reg),
        hm_hp=_nchw(hm_hp), hp_offset=_nchw(hp_off), K=20).numpy()
    assert ours.shape == theirs.shape == (2, 20, 40)
    np.testing.assert_allclose(np.sort(ours[..., 4], axis=1),
                               np.sort(theirs[..., 4], axis=1), atol=1e-5)
    ours_sorted = ours[:, np.lexsort(ours[0].T[::-1])]
    theirs_sorted = theirs[:, np.lexsort(theirs[0].T[::-1])]
    np.testing.assert_allclose(ours_sorted, theirs_sorted, atol=1e-4)


def test_ddd_decode_matches_reference(ref_modules):
    ref_decode, _, _ = ref_modules
    from codenet_tpu.models import decode as D
    rng = np.random.RandomState(4)
    hm = rng.rand(2, 16, 16, 3).astype(np.float32)
    rot = rng.randn(2, 16, 16, 8).astype(np.float32)
    dep = rng.rand(2, 16, 16, 1).astype(np.float32)
    dim = rng.rand(2, 16, 16, 3).astype(np.float32)
    wh = (rng.rand(2, 16, 16, 2) * 8).astype(np.float32)
    reg = rng.rand(2, 16, 16, 2).astype(np.float32)

    ours = np.asarray(D.ddd_decode(
        jnp.asarray(hm), jnp.asarray(rot), jnp.asarray(dep),
        jnp.asarray(dim), wh=jnp.asarray(wh), reg=jnp.asarray(reg), k=20))
    theirs = ref_decode.ddd_decode(
        _nchw(hm), _nchw(rot), _nchw(dep), _nchw(dim), wh=_nchw(wh),
        reg=_nchw(reg), K=20).numpy()
    assert ours.shape == theirs.shape
    ours_sorted = ours[:, np.lexsort(ours[0].T[::-1])]
    theirs_sorted = theirs[:, np.lexsort(theirs[0].T[::-1])]
    np.testing.assert_allclose(ours_sorted, theirs_sorted, atol=1e-4)


@pytest.mark.parametrize("agnostic", [False, True], ids=["exct", "agnex"])
@pytest.mark.parametrize("aggr", [0.0, 0.1], ids=["noaggr", "aggr"])
def test_exct_decode_matches_reference(ref_modules, agnostic, aggr):
    """The K^4 extreme-point combinatorics, center-heat scoring,
    geometric/class rejection, and the lax.scan edge aggregation vs the
    reference's recursive _h/_v_aggregate."""
    ref_decode, _, _ = ref_modules
    from codenet_tpu.models import decode as D
    rng = np.random.RandomState(5)
    # scaled so the aggregated heats stay < 1: the min(heat, 1) clamp
    # otherwise creates exact-tie plateaus where torch's and our top-k
    # legitimately pick different (equal-score) extreme points
    scale = 0.25 if aggr > 0 else 1.0
    heats = [(rng.rand(1, 16, 16, 3) * scale).astype(np.float32)
             for _ in range(5)]

    ref_fn = ref_decode.agnex_ct_decode if agnostic else \
        ref_decode.exct_decode
    our_fn = D.agnex_ct_decode if agnostic else D.exct_decode
    ours = np.asarray(our_fn(*[jnp.asarray(h) for h in heats], k=4,
                             num_dets=40, aggr_weight=aggr))
    ref_heats = [_nchw(h) for h in heats]
    if aggr > 0:
        # The reference's own aggr path crashes on modern torch (its
        # _aggregate helpers return non-contiguous tensors and _topk's
        # `.view` rejects them — decode.py:113). Compose its aggregate
        # helpers (verified element-wise identical to ours) with its
        # aggr=0 decode to express the intended semantics.
        t, l, b, r, ct = ref_heats
        t = ref_decode._h_aggregate(t, aggr_weight=aggr).contiguous()
        l = ref_decode._v_aggregate(l, aggr_weight=aggr).contiguous()
        b = ref_decode._h_aggregate(b, aggr_weight=aggr).contiguous()
        r = ref_decode._v_aggregate(r, aggr_weight=aggr).contiguous()
        ref_heats = [t, l, b, r, ct]
    theirs = ref_fn(*ref_heats, K=4, num_dets=40,
                    aggr_weight=0.0).numpy()
    assert ours.shape == theirs.shape == (1, 40, 14)
    ours_sorted = ours[:, np.lexsort(ours[0].T[::-1])]
    theirs_sorted = theirs[:, np.lexsort(theirs[0].T[::-1])]
    np.testing.assert_allclose(ours_sorted, theirs_sorted, atol=1e-4)


def test_focal_loss_matches_reference(ref_modules):
    _, ref_losses, _ = ref_modules
    from codenet_tpu.models import losses as L
    rng = np.random.RandomState(1)
    pred = np.clip(rng.rand(2, 8, 8, 3).astype(np.float32), 1e-4, 1 - 1e-4)
    gt = np.zeros((2, 8, 8, 3), np.float32)
    gt[0, 3, 3, 1] = 1.0
    gt[1, 5, 2, 0] = 1.0
    gt[0, 2, 2, 2] = 0.6  # gaussian shoulder

    ours = float(L.neg_loss(jnp.asarray(pred), jnp.asarray(gt)))
    theirs = float(ref_losses._neg_loss(_nchw(pred), _nchw(gt)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_reg_l1_loss_matches_reference(ref_modules):
    _, ref_losses, _ = ref_modules
    from codenet_tpu.models import losses as L
    rng = np.random.RandomState(2)
    out = rng.randn(2, 8, 8, 2).astype(np.float32)
    ind = rng.randint(0, 64, (2, 5)).astype(np.int64)
    target = rng.randn(2, 5, 2).astype(np.float32)
    mask = (rng.rand(2, 5) > 0.3).astype(np.uint8)

    ours = float(L.reg_l1_loss(jnp.asarray(out), jnp.asarray(mask),
                               jnp.asarray(ind), jnp.asarray(target)))
    crit = ref_losses.RegL1Loss()
    theirs = float(crit(_nchw(out), torch.from_numpy(mask),
                        torch.from_numpy(ind), torch.from_numpy(target)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_symmetric_quant_matches_reference(ref_modules):
    _, _, qu = ref_modules
    from codenet_tpu.ops import quant as Q
    rng = np.random.RandomState(3)
    w = rng.randn(12, 4, 3, 3).astype(np.float32)  # torch OIHW
    wt = torch.from_numpy(w)
    x_t = wt.contiguous().view(12, -1)
    w_min = x_t.min(dim=1).values
    w_max = x_t.max(dim=1).values
    theirs = qu.SymmetricQuantFunction.apply(
        wt, 4, w_min, w_max, True, False).numpy()

    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    ours = np.asarray(Q.fake_quant_weight(w_hwio, 4, "symmetric", True,
                                          False))
    ours_oihw = np.transpose(ours, (3, 2, 0, 1))
    np.testing.assert_allclose(ours_oihw, theirs, rtol=1e-5, atol=1e-6)


def test_asymmetric_act_quant_matches_reference(ref_modules):
    _, _, qu = ref_modules
    from codenet_tpu.ops import quant as Q
    rng = np.random.RandomState(4)
    x = (rng.randn(128) * 2).astype(np.float32)
    x_min = torch.tensor([-1.7])
    x_max = torch.tensor([3.1])
    theirs = qu.AsymmetricQuantFunction.apply(
        torch.from_numpy(x), 8, x_min, x_max).numpy().reshape(-1)
    ours = np.asarray(Q.asymmetric_quant(
        jnp.asarray(x), 8, jnp.asarray([-1.7]), jnp.asarray([3.1]),
        clamp=False)).reshape(-1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_remaining_reg_losses_match_reference(ref_modules):
    """NormRegL1Loss and RegWeightedL1Loss (reference losses.py:158-184)."""
    _, ref_losses, _ = ref_modules
    from codenet_tpu.models import losses as L
    rng = np.random.RandomState(6)
    out = rng.randn(2, 8, 8, 2).astype(np.float32)
    ind = rng.randint(0, 64, (2, 10)).astype(np.int64)
    target = (rng.rand(2, 10, 2) * 4 + 0.5).astype(np.float32)
    mask1 = (rng.rand(2, 10) > 0.3).astype(np.float32)

    ours = float(L.norm_reg_l1_loss(
        jnp.asarray(out), jnp.asarray(mask1),
        jnp.asarray(ind), jnp.asarray(target)))
    theirs = float(ref_losses.NormRegL1Loss()(
        _nchw(out), torch.from_numpy(mask1).to(torch.uint8),
        torch.from_numpy(ind), torch.from_numpy(target)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    mask2 = (rng.rand(2, 10, 2) > 0.3).astype(np.float32)
    ours = float(L.reg_weighted_l1_loss(
        jnp.asarray(out), jnp.asarray(mask2),
        jnp.asarray(ind), jnp.asarray(target)))
    theirs = float(ref_losses.RegWeightedL1Loss()(
        _nchw(out), torch.from_numpy(mask2),
        torch.from_numpy(ind), torch.from_numpy(target)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_bin_rot_loss_matches_reference(ref_modules):
    """BinRotLoss/compute_rot_loss (reference losses.py:197-250): ours
    rewrites the index_select means as masked sums — must be
    value-identical. (The reference's reduction='elementwise_mean' is
    pre-1.0 torch; translated to 'mean' — the same reduction — so its
    code runs on modern torch.)"""
    _, ref_losses, _ = ref_modules
    from codenet_tpu.models import losses as L
    import torch.nn.functional as F

    rng = np.random.RandomState(7)
    out = rng.randn(2, 8, 8, 8).astype(np.float32)
    ind = rng.randint(0, 64, (2, 6)).astype(np.int64)
    rotbin = rng.randint(0, 2, (2, 6, 2)).astype(np.int64)
    rotres = (rng.randn(2, 6, 2) * 0.5).astype(np.float32)
    mask = (rng.rand(2, 6) > 0.2).astype(np.float32)

    orig_sl1, orig_ce = F.smooth_l1_loss, F.cross_entropy

    def sl1(*a, **k):
        if k.get("reduction") == "elementwise_mean":
            k["reduction"] = "mean"
        return orig_sl1(*a, **k)

    def ce(*a, **k):
        if k.get("reduction") == "elementwise_mean":
            k["reduction"] = "mean"
        return orig_ce(*a, **k)

    ref_losses.F.smooth_l1_loss, ref_losses.F.cross_entropy = sl1, ce
    try:
        theirs = float(ref_losses.BinRotLoss()(
            _nchw(out), torch.from_numpy(mask).to(torch.uint8),
            torch.from_numpy(ind), torch.from_numpy(rotbin),
            torch.from_numpy(rotres)))
    finally:
        ref_losses.F.smooth_l1_loss = orig_sl1
        ref_losses.F.cross_entropy = orig_ce
    ours = float(L.bin_rot_loss(
        jnp.asarray(out), jnp.asarray(mask),
        jnp.asarray(ind), jnp.asarray(rotbin), jnp.asarray(rotres)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_post_process_matches_reference():
    """ctdet / multi_pose / ddd post-processing (reference
    lib/utils/post_process.py) — pure numpy+cv2 geometry, compared
    directly."""
    if REF + "/lib" not in sys.path:
        sys.path.insert(0, REF + "/lib")
    from utils import post_process as ref_pp
    from codenet_tpu.utils import post_process as PP
    rng = np.random.RandomState(8)
    c = np.tile(np.array([250.0, 187.0], np.float32), (2, 1))
    s = np.array([400.0, 400.0], np.float32)

    dets = np.concatenate([
        rng.rand(2, 12, 4) * 64, rng.rand(2, 12, 1),
        rng.randint(0, 3, (2, 12, 1))], axis=2).astype(np.float32)
    ours = PP.ctdet_post_process(dets.copy(), c, s, 64, 64, 3)
    theirs = ref_pp.ctdet_post_process(dets.copy(), c, s, 64, 64, 3)
    for i in range(2):
        for j in (1, 2, 3):
            np.testing.assert_allclose(
                np.asarray(ours[i][j], np.float32).reshape(-1, 5),
                np.asarray(theirs[i][j], np.float32).reshape(-1, 5),
                atol=1e-3, err_msg=f"ctdet img{i} cls{j}")

    mp = np.concatenate([
        rng.rand(2, 12, 4) * 64, rng.rand(2, 12, 1),
        rng.rand(2, 12, 34) * 64, np.zeros((2, 12, 1))],
        axis=2).astype(np.float32)
    ours = PP.multi_pose_post_process(mp.copy(), c, s, 64, 64)
    theirs = ref_pp.multi_pose_post_process(mp.copy(), c, s, 64, 64)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(ours[i][1], np.float32),
            np.asarray(theirs[i][1], np.float32), atol=1e-3,
            err_msg=f"multi_pose img{i}")

    # ddd: [xs ys score rot(8) depth dim(3) wh(2) cls] = 18 cols
    # (reg_bbox=True, the KITTI default; both implementations require wh)
    dd = np.concatenate([
        rng.rand(2, 12, 2) * 64, rng.rand(2, 12, 1),
        rng.randn(2, 12, 8), rng.rand(2, 12, 1) * 2 + 1,
        rng.rand(2, 12, 3) * 2, rng.rand(2, 12, 2) * 10,
        rng.randint(0, 3, (2, 12, 1))],
        axis=2).astype(np.float32)
    calibs = np.tile(np.array(
        [[707.0, 0.0, 604.0, 45.0], [0.0, 707.0, 180.0, -0.34],
         [0.0, 0.0, 1.0, 0.005]], np.float32), (2, 1, 1))

    class _Opt:
        num_classes = 3
        output_w = 64
        output_h = 64

    ours = PP.ddd_post_process(dd.copy(), c, s, calibs, _Opt())
    theirs = ref_pp.ddd_post_process(dd.copy(), c, s, calibs, _Opt())
    compared = 0
    for i in range(2):
        for j in (1, 2, 3):
            a = np.asarray(ours[i][j], np.float32)
            b = np.asarray(theirs[i][j], np.float32)
            assert a.shape == b.shape, (i, j, a.shape, b.shape)
            if a.size:
                np.testing.assert_allclose(a, b, atol=1e-3,
                                           err_msg=f"ddd img{i} cls{j}")
                compared += 1
    assert compared >= 3  # the random classes populated real rows


def test_hard_nms_matches_reference():
    """Greedy NMS vs the reference's pure-python baseline
    (tools/voc_eval_lib/nms/py_cpu_nms.py — the oracle its Cython
    cpu_nms is tested against upstream)."""
    ref_nms = _load("ref_py_cpu_nms",
                    REF + "/tools/voc_eval_lib/nms/py_cpu_nms.py")
    from codenet_tpu.ops.nms import nms
    rng = np.random.RandomState(9)
    x1y1 = rng.rand(60, 2) * 80
    wh = rng.rand(60, 2) * 40 + 1
    dets = np.concatenate([x1y1, x1y1 + wh, rng.rand(60, 1)],
                          axis=1).astype(np.float32)
    for thresh in (0.3, 0.5, 0.7):
        ours = list(nms(dets.copy(), thresh))
        theirs = list(ref_nms.py_cpu_nms(dets.copy(), thresh))
        assert ours == theirs, (thresh, ours, theirs)


def test_gaussian_targets_match_reference():
    """Target splats vs reference lib/utils/image.py (numpy, cv2)."""
    sys.path.insert(0, REF + "/lib")
    from utils import image as ref_image
    from codenet_tpu.data import affine as A
    rng = np.random.RandomState(5)
    for _ in range(10):
        h, w = 24, 32
        a = np.zeros((h, w), np.float32)
        b = np.zeros((h, w), np.float32)
        ct = (int(rng.randint(0, w)), int(rng.randint(0, h)))
        r = int(rng.randint(1, 6))
        A.draw_umich_gaussian(a, ct, r)
        ref_image.draw_umich_gaussian(b, ct, r)
        np.testing.assert_allclose(a, b)
    # radius formula
    for _ in range(10):
        hh, ww = rng.randint(2, 60), rng.randint(2, 60)
        np.testing.assert_allclose(A.gaussian_radius((hh, ww)),
                                   ref_image.gaussian_radius((hh, ww)))


def test_flip_helpers_match_reference(ref_modules):
    """flip_lr / flip_lr_off NHWC vs reference models/utils.py:38-56."""
    sys.path.insert(0, REF + "/lib")
    from models import utils as ref_utils
    from codenet_tpu.engine.detector import flip_lr, flip_lr_off
    rng = np.random.RandomState(6)
    flip_idx = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                [13, 14], [15, 16]]
    hm_hp = rng.randn(1, 8, 8, 17).astype(np.float32)
    ours = np.asarray(flip_lr(jnp.asarray(hm_hp), flip_idx))
    theirs = ref_utils.flip_lr(_nchw(hm_hp), flip_idx).numpy()
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), theirs,
                               atol=1e-6)

    hps = rng.randn(1, 8, 8, 34).astype(np.float32)
    ours = np.asarray(flip_lr_off(jnp.asarray(hps), flip_idx))
    theirs = ref_utils.flip_lr_off(_nchw(hps), flip_idx).numpy()
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), theirs,
                               atol=1e-6)


def test_weight_percentile_matches_reference(ref_modules):
    """wt-percentile per-channel ranges (reference Quant_Conv2d
    quant_modules.py:285-301 ceil-indexed kthvalue)."""
    _, _, qu = ref_modules
    import math
    from codenet_tpu.ops import quant as Q
    rng = np.random.RandomState(7)
    w = rng.randn(6, 8, 3, 3).astype(np.float32)  # OIHW, L=72 per channel
    wt = torch.from_numpy(w).contiguous().view(6, -1)
    L = wt.shape[1]
    lo_i = math.ceil(L * 0.1 * 0.01)
    up_i = math.ceil(L * 99.9 * 0.01)
    ref_min = torch.kthvalue(wt, k=max(lo_i, 1), dim=1).values.numpy()
    ref_max = torch.kthvalue(wt, k=min(up_i, L), dim=1).values.numpy()

    flat = jnp.asarray(wt.numpy())
    got_min, got_max = Q.weight_channel_min_max(flat, percentile=True)
    np.testing.assert_allclose(np.asarray(got_min), ref_min, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_max), ref_max, atol=1e-6)


def test_quant_linear_matches_reference():
    """QuantLinear (reference quant_modules.py:23-160) — the reference
    module is DEAD CODE that cannot run: linear_quantize views the scale
    as (-1,1,1,1) (quant_utils.py:32), turning the 2D linear weight 4D,
    so F.linear raises for every mode. Pin that fact, then validate our
    port against a numpy emulation of the documented semantics
    (per-INPUT-channel symmetric ranges, EMA momentum .99, STE)."""
    import types
    if "pytorchcv" not in sys.modules:
        def mod(name, **attrs):
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m

        pcv = mod("pytorchcv")
        pcv.models = mod("pytorchcv.models")
        pcv.models.shufflenetv2 = mod("pytorchcv.models.shufflenetv2",
                                      ShuffleUnit=type("ShuffleUnit", (),
                                                       {}))
        pcv.models.common = mod("pytorchcv.models.common",
                                ChannelShuffle=type("ChannelShuffle", (),
                                                    {}))
        pcv.model_provider = mod("pytorchcv.model_provider",
                                 get_model=lambda *a, **k: None)
        ext = mod("_ext")
        ext.dcn = mod("_ext.dcn", dcn_deform_conv_cuda=object())
        mod("thop", profile=lambda *a, **k: (0, 0))
    sys.path.insert(0, REF)
    try:
        from portable_quantizer.quant_modules import QuantLinear as RefQL
    finally:
        sys.path.pop(0)
    from codenet_tpu.models.layers import QuantLinear

    rng = np.random.RandomState(0)
    cin, cout = 16, 8
    w = rng.randn(cout, cin).astype(np.float32) * 0.3
    b = rng.randn(cout).astype(np.float32) * 0.1
    x = rng.randn(4, cin).astype(np.float32)

    # 1) the reference module raises on every configuration
    for per_channel in (True, False):
        ref = RefQL(4, cin, cout, quant_mode="symmetric",
                    per_channel=per_channel)
        with torch.no_grad():
            ref.weight.copy_(torch.from_numpy(w))
            ref.bias.copy_(torch.from_numpy(b))
        with pytest.raises(RuntimeError):
            ref(torch.from_numpy(x))

    # 2) our port computes the documented math (per-input-channel
    # symmetric 4-bit ranges from the torch-layout transpose, EMA'd)
    ours = QuantLinear(cout, weight_bit=4, quant_mode="symmetric",
                       per_channel=True)
    variables = {"params": {"kernel": jnp.asarray(w.T[None, None]),
                            "bias": jnp.asarray(b)},
                 "quant_stats": {"x_min": jnp.zeros(cin),
                                 "x_max": jnp.zeros(cin)}}
    got, upd = ours.apply(variables, jnp.asarray(x),
                          mutable=["quant_stats"])

    wt = w.T  # (cin, cout): per-input-channel rows
    w_min = wt.min(axis=1)
    w_max = wt.max(axis=1)
    # first forward: EMA init adopts the batch range exactly
    np.testing.assert_allclose(np.asarray(upd["quant_stats"]["x_min"]),
                               w_min, rtol=1e-6)
    mag = np.maximum(np.abs(w_min), np.abs(w_max))
    scale = (2 ** 3 - 1) / np.clip(mag, 1e-10, None)
    wq = np.clip(np.round(wt * scale[:, None]), -8, 7) / scale[:, None]
    want = x @ wq + b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)

    # 3) EMA moves on the second forward
    variables = {"params": variables["params"], **upd}
    _, upd2 = ours.apply(variables, jnp.asarray(x),
                         mutable=["quant_stats"])
    np.testing.assert_allclose(
        np.asarray(upd2["quant_stats"]["x_min"]),
        0.99 * w_min + 0.01 * w_min, rtol=1e-6)
