"""Detection losses — NHWC jax rebuild of reference lib/models/losses.py.

All losses are pure functions of (outputs, targets); data-dependent branches
(num_pos == 0, bin-residual masking) become jnp.where so everything jits with
static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_clamped(x):
    """_sigmoid: clamp to [1e-4, 1-1e-4] (reference models/utils.py:9-11)."""
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1.0 - 1e-4)


def gather_feat(output, ind):
    """Gather (N, H, W, C) at flat spatial indices (N, M) -> (N, M, C).

    NHWC analogue of _transpose_and_gather_feat (models/utils.py:19-29).
    """
    n, h, w, c = output.shape
    flat = output.reshape(n, h * w, c)
    return jnp.take_along_axis(flat, ind[..., None].astype(jnp.int32), axis=1)


def neg_loss(pred, gt):
    """CornerNet-modified focal loss (reference losses.py:42-67).

    pred/gt: (N, H, W, C); pred must be post-sigmoid.
    """
    pos_inds = (gt == 1.0).astype(pred.dtype)
    neg_inds = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.square(1.0 - pred) * pos_inds
    neg_loss_ = jnp.log(1.0 - pred) * jnp.square(pred) * neg_weights * neg_inds

    num_pos = pos_inds.sum()
    pos_sum = pos_loss.sum()
    neg_sum = neg_loss_.sum()
    return jnp.where(num_pos == 0, -neg_sum,
                     -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0))


def reg_l1_loss(output, mask, ind, target):
    """Masked L1 at object indices (reference RegL1Loss, losses.py:145-155)."""
    pred = gather_feat(output, ind)
    m = mask[..., None].astype(pred.dtype)
    m = jnp.broadcast_to(m, pred.shape)
    loss = jnp.abs(pred * m - target * m).sum()
    return loss / (m.sum() + 1e-4)


def smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def reg_loss(output, mask, ind, target):
    """Smooth-L1 variant (reference RegLoss + _reg_loss, losses.py:100-142).

    Note the reference normalizes by mask.sum() over objects (not expanded),
    unlike RegL1Loss.
    """
    pred = gather_feat(output, ind)
    num = mask.astype(pred.dtype).sum()
    m = jnp.broadcast_to(mask[..., None].astype(pred.dtype), pred.shape)
    loss = smooth_l1(pred * m - target * m).sum()
    return loss / (num + 1e-4)


def norm_reg_l1_loss(output, mask, ind, target):
    """L1(pred/target, 1) (reference NormRegL1Loss, losses.py:158-171)."""
    pred = gather_feat(output, ind)
    m = jnp.broadcast_to(mask[..., None].astype(pred.dtype), pred.shape)
    pred = pred / (target + 1e-4)
    tgt = jnp.ones_like(target)
    loss = jnp.abs(pred * m - tgt * m).sum()
    return loss / (m.sum() + 1e-4)


def reg_weighted_l1_loss(output, mask, ind, target):
    """Per-element-weighted L1 (reference RegWeightedL1Loss,
    losses.py:173-184); mask already has the feature dim."""
    pred = gather_feat(output, ind)
    m = mask.astype(pred.dtype)
    loss = jnp.abs(pred * m - target * m).sum()
    return loss / (m.sum() + 1e-4)


def mse_loss(pred, gt):
    return jnp.mean(jnp.square(pred - gt))


def dense_wh_l1_loss(output, dense_wh, dense_wh_mask):
    """Dense wh regression (reference trains/ctdet.py:51-56)."""
    m = dense_wh_mask
    return jnp.abs(output * m - dense_wh * m).sum() / (m.sum() + 1e-4)


def _cross_entropy_masked(logits, target, mask):
    """compute_bin_loss (losses.py:212-215): logits masked (not the loss!),
    mean cross-entropy over ALL rows."""
    logits = logits * mask.astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    return nll.mean()


def bin_rot_loss(output, mask, ind, rotbin, rotres):
    """2-bin orientation loss (reference BinRotLoss + compute_rot_loss,
    losses.py:197-250). The reference means the sin/cos residual loss over
    rows whose bin is active; rewritten as masked sums (identical value)."""
    pred = gather_feat(output, ind)  # (N, M, 8)
    o = pred.reshape(-1, 8)
    tb = rotbin.reshape(-1, 2)
    tr = rotres.reshape(-1, 2)
    m = mask.reshape(-1, 1)

    loss_bin1 = _cross_entropy_masked(o[:, 0:2], tb[:, 0], m)
    loss_bin2 = _cross_entropy_masked(o[:, 4:6], tb[:, 1], m)

    def res_term(sin_col, cos_col, bin_col, res_col):
        sel = (bin_col != 0).astype(o.dtype)
        cnt = jnp.maximum(sel.sum(), 1.0)
        ls = (smooth_l1(sin_col - jnp.sin(res_col)) * sel).sum() / cnt
        lc = (smooth_l1(cos_col - jnp.cos(res_col)) * sel).sum() / cnt
        return jnp.where(sel.sum() > 0, ls + lc, 0.0)

    loss_res = res_term(o[:, 2], o[:, 3], tb[:, 0], tr[:, 0]) \
        + res_term(o[:, 6], o[:, 7], tb[:, 1], tr[:, 1])
    return loss_bin1 + loss_bin2 + loss_res


# ---------------------------------------------------------------------------
# Per-task total losses (reference lib/trains/{ctdet,ddd,multi_pose}.py)
# ---------------------------------------------------------------------------

def ctdet_loss(outputs, batch, opt):
    """CtdetLoss (reference trains/ctdet.py:17-74).

    outputs: list of head dicts (one per stack), NHWC. batch: target dict.
    Returns (loss, stats dict).
    """
    hm_loss = wh_loss = off_loss = 0.0
    num_stacks = len(outputs)
    for output in outputs:
        hm = output["hm"] if opt.mse_loss else sigmoid_clamped(output["hm"])
        if opt.mse_loss:
            hm_loss += mse_loss(hm, batch["hm"]) / num_stacks
        else:
            hm_loss += neg_loss(hm, batch["hm"]) / num_stacks
        if opt.wh_weight > 0:
            if opt.dense_wh:
                wh_loss += dense_wh_l1_loss(
                    output["wh"], batch["dense_wh"],
                    batch["dense_wh_mask"]) / num_stacks
            elif opt.cat_spec_wh:
                wh_loss += reg_weighted_l1_loss(
                    output["wh"], batch["cat_spec_mask"], batch["ind"],
                    batch["cat_spec_wh"]) / num_stacks
            else:
                crit = {"l1": reg_l1_loss, "sl1": reg_loss}[opt.reg_loss]
                if opt.norm_wh:
                    crit = norm_reg_l1_loss
                wh_loss += crit(output["wh"], batch["reg_mask"],
                                batch["ind"], batch["wh"]) / num_stacks
        if opt.reg_offset and opt.off_weight > 0:
            crit = {"l1": reg_l1_loss, "sl1": reg_loss}[opt.reg_loss]
            off_loss += crit(output["reg"], batch["reg_mask"], batch["ind"],
                             batch["reg"]) / num_stacks
    loss = (opt.hm_weight * hm_loss + opt.wh_weight * wh_loss
            + opt.off_weight * off_loss)
    return loss, {"loss": loss, "hm_loss": hm_loss, "wh_loss": wh_loss,
                  "off_loss": off_loss}


def ddd_loss(outputs, batch, opt):
    """DddLoss (reference trains/ddd.py:16-64)."""
    hm_loss = dep_loss = rot_loss = dim_loss = 0.0
    wh_loss = off_loss = 0.0
    num_stacks = len(outputs)
    for output in outputs:
        hm = sigmoid_clamped(output["hm"])
        # epsilon guards sigmoid underflow on very negative logits
        # (reference trains/ddd.py:26: 1./(sigmoid(dep)+1e-6)-1.), and
        # matches the inference decode in engine/detector.py
        dep = 1.0 / (jax.nn.sigmoid(output["dep"]) + 1e-6) - 1.0
        hm_loss += neg_loss(hm, batch["hm"]) / num_stacks
        if opt.dep_weight > 0:
            dep_loss += reg_l1_loss(dep, batch["reg_mask"], batch["ind"],
                                    batch["dep"]) / num_stacks
        if opt.dim_weight > 0:
            dim_loss += reg_l1_loss(output["dim"], batch["reg_mask"],
                                    batch["ind"], batch["dim"]) / num_stacks
        if opt.rot_weight > 0:
            rot_loss += bin_rot_loss(output["rot"], batch["rot_mask"],
                                     batch["ind"], batch["rotbin"],
                                     batch["rotres"]) / num_stacks
        if opt.reg_bbox and opt.wh_weight > 0:
            wh_loss += reg_l1_loss(output["wh"], batch["rot_mask"],
                                   batch["ind"], batch["wh"]) / num_stacks
        if opt.reg_offset and opt.off_weight > 0:
            off_loss += reg_l1_loss(output["reg"], batch["rot_mask"],
                                    batch["ind"], batch["reg"]) / num_stacks
    loss = (opt.hm_weight * hm_loss + opt.dep_weight * dep_loss
            + opt.dim_weight * dim_loss + opt.rot_weight * rot_loss
            + opt.wh_weight * wh_loss + opt.off_weight * off_loss)
    return loss, {"loss": loss, "hm_loss": hm_loss, "dep_loss": dep_loss,
                  "dim_loss": dim_loss, "rot_loss": rot_loss,
                  "wh_loss": wh_loss, "off_loss": off_loss}


def multi_pose_loss(outputs, batch, opt):
    """MultiPoseLoss (reference trains/multi_pose.py:16-85)."""
    hm_loss = wh_loss = off_loss = 0.0
    hp_loss = hm_hp_loss = hp_offset_loss = 0.0
    num_stacks = len(outputs)
    for output in outputs:
        hm = sigmoid_clamped(output["hm"])
        hm_loss += neg_loss(hm, batch["hm"]) / num_stacks
        if opt.dense_hp:
            m = batch["dense_hps_mask"]
            hp_loss += (jnp.abs(output["hps"] * m - batch["dense_hps"] * m)
                        .sum() / (m.sum() + 1e-4)) / num_stacks
        else:
            hp_loss += reg_weighted_l1_loss(
                output["hps"], batch["hps_mask"], batch["ind"],
                batch["hps"]) / num_stacks
        if opt.wh_weight > 0 and opt.reg_bbox:
            wh_loss += reg_l1_loss(output["wh"], batch["reg_mask"],
                                   batch["ind"], batch["wh"]) / num_stacks
        if opt.reg_offset and opt.off_weight > 0:
            off_loss += reg_l1_loss(output["reg"], batch["reg_mask"],
                                    batch["ind"], batch["reg"]) / num_stacks
        if opt.reg_hp_offset and opt.off_weight > 0:
            hp_offset_loss += reg_l1_loss(
                output["hp_offset"], batch["hp_mask"], batch["hp_ind"],
                batch["hp_offset"]) / num_stacks
        if opt.hm_hp and opt.hm_hp_weight > 0:
            hm_hp = sigmoid_clamped(output["hm_hp"])
            hm_hp_loss += neg_loss(hm_hp, batch["hm_hp"]) / num_stacks
    loss = (opt.hm_weight * hm_loss + opt.wh_weight * wh_loss
            + opt.off_weight * off_loss + opt.hp_weight * hp_loss
            + opt.hm_hp_weight * hm_hp_loss
            + opt.off_weight * hp_offset_loss)
    return loss, {"loss": loss, "hm_loss": hm_loss, "hp_loss": hp_loss,
                  "hm_hp_loss": hm_hp_loss, "hp_offset_loss": hp_offset_loss,
                  "wh_loss": wh_loss, "off_loss": off_loss}


def exdet_loss(outputs, batch, opt):
    """ExdetLoss (reference trains/exdet.py:18-42): focal on the 5 extreme
    heatmaps + masked L1 on the 4 corner offsets."""
    hm_loss = reg_loss_ = 0.0
    num_stacks = len(outputs)
    parts = ["t", "l", "b", "r", "c"]
    for output in outputs:
        for p in parts:
            tag = "hm_{}".format(p)
            hm = sigmoid_clamped(output[tag])
            if opt.mse_loss:
                hm_loss += mse_loss(hm, batch[tag]) / num_stacks
            else:
                hm_loss += neg_loss(hm, batch[tag]) / num_stacks
            if p != "c" and opt.reg_offset and opt.off_weight > 0:
                reg_loss_ += reg_l1_loss(
                    output["reg_{}".format(p)], batch["reg_mask"],
                    batch["ind_{}".format(p)],
                    batch["reg_{}".format(p)]) / num_stacks
    loss = opt.hm_weight * hm_loss + opt.off_weight * reg_loss_
    return loss, {"loss": loss, "off_loss": reg_loss_, "hm_loss": hm_loss}


LOSS_FACTORY = {
    "ctdet": ctdet_loss,
    "ddd": ddd_loss,
    "multi_pose": multi_pose_loss,
    "exdet": exdet_loss,
}
