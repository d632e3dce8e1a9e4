"""Training-time debug rendering + val-prediction capture.

Rebuild of the per-task `debug` / `save_result` trainer hooks the r2
review flagged as the last missing reference behavior:
- `debug` (reference lib/trains/ctdet.py:85-120, multi_pose.py:87-133,
  ddd.py:66-116, exdet.py:52-85, invoked from base_trainer.py:93-94 when
  --debug > 0): render pred-vs-GT heatmaps and decoded detections for the
  first image of each batch into opt.debug_dir (headless: --debug >= 4
  saves like the reference; lower levels also save since no GUI is
  assumed, prefixed by phase/iter).
- `save_result` (reference ctdet.py:122-132, ddd.py:118-129,
  multi_pose.py:135-148, invoked from base_trainer.py:96-97 when --test):
  decode + back-project each val prediction so `trainer.val` can return
  (stats, results) and the caller can compute dataset mAP during training
  (reference main.py:51-54).

The hooks run their own jitted eval-mode forward on the already-sharded
batch: the train step's outputs never leave the device on the hot path,
and eval-mode BN matches the reference's val semantics (train-phase debug
renders differ from the reference only by BN batch-vs-running stats).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.device_aug import model_input, resolve_targets
from ..models import decode as D
from ..utils import post_process as PP


def make_hook_forward(model, mean, std, down_ratio, num_classes,
                      input_hw=None, cache_mesh=None):
    """Jitted: batch -> (f32 input, dense hm target, last-stack outputs)."""

    @jax.jit
    def fwd(variables, batch):
        inp = model_input(batch, mean, std, out_hw=input_hw,
                          cache_mesh=cache_mesh)
        batch2 = resolve_targets(batch, inp, down_ratio, num_classes)
        out = model.apply(variables, inp, train=False)
        out = out[-1] if isinstance(out, (list, tuple)) else out
        return inp, batch2, out

    return fwd


class TrainHooks:
    """Per-task debug/save_result dispatch bound to one Trainer."""

    def __init__(self, opt, model, cache_mesh=None):
        self.opt = opt
        self.task = opt.task
        self._fwd = make_hook_forward(
            model, np.asarray(opt.mean), np.asarray(opt.std),
            opt.down_ratio, opt.num_classes,
            input_hw=(opt.input_h, opt.input_w), cache_mesh=cache_mesh)

    # -- shared helpers ---------------------------------------------------
    def _first_image(self, inp, batch):
        """uint8 HWC render image for sample 0 (reference denormalizes the
        f32 input; the device-uint8 path already ships the raw warp)."""
        if "input_u8" in batch:
            return np.asarray(batch["input_u8"][0])
        img = np.asarray(inp[0])
        img = (img * np.asarray(self.opt.std) + np.asarray(self.opt.mean))
        return np.clip(img * 255.0, 0, 255).astype(np.uint8)

    def _debugger(self):
        from ..utils.debugger import Debugger
        return Debugger(dataset=self.opt.dataset,
                        theme=self.opt.debugger_theme,
                        num_classes=self.opt.num_classes,
                        down_ratio=self.opt.down_ratio)

    def _emit(self, debugger, phase, iter_id):
        import os
        out_dir = getattr(self.opt, "debug_dir", "debug")
        os.makedirs(out_dir, exist_ok=True)
        debugger.save_all_imgs(out_dir,
                               prefix="{}_{}_".format(phase, iter_id))

    def forward(self, variables, batch):
        """One jitted eval forward shared by debug AND save_result — the
        trainer computes it once per batch when both hooks fire."""
        return self._fwd(variables, batch)

    # -- debug ------------------------------------------------------------
    def debug(self, variables, batch, meta, iter_id, phase="train",
              fwd_out=None):
        inp, batch2, out = fwd_out if fwd_out is not None \
            else self._fwd(variables, batch)
        fn = getattr(self, "_debug_" + self.task, None)
        if fn is None:  # pragma: no cover
            return
        fn(inp, batch2, out, meta, iter_id, phase)

    def _debug_ctdet(self, inp, batch, out, meta, iter_id, phase):
        opt = self.opt
        hm = jax.nn.sigmoid(out["hm"])
        reg = out.get("reg") if opt.reg_offset else None
        dets = np.array(D.ctdet_decode(hm, out["wh"], reg,
                                         cat_spec_wh=opt.cat_spec_wh,
                                         k=opt.K))
        dets[:, :, :4] *= opt.down_ratio
        m0 = meta[0] if meta else {}
        gt = np.array(m0.get("gt_det", np.zeros((1, 6), np.float32)))
        gt = gt.reshape(-1, dets.shape[2]).copy()
        gt[:, :4] *= opt.down_ratio

        dbg = self._debugger()
        img = self._first_image(inp, batch)
        dbg.add_blend_img(img, dbg.gen_colormap(np.asarray(hm[0])),
                          "pred_hm")
        dbg.add_blend_img(img, dbg.gen_colormap(np.asarray(batch["hm"][0])),
                          "gt_hm")
        dbg.add_img(img, img_id="out_pred")
        for k in range(len(dets[0])):
            if dets[0, k, 4] > opt.center_thresh:
                dbg.add_coco_bbox(dets[0, k, :4], dets[0, k, -1],
                                  dets[0, k, 4], img_id="out_pred")
        dbg.add_img(img, img_id="out_gt")
        for k in range(len(gt)):
            if gt[k, 4] > opt.center_thresh:
                dbg.add_coco_bbox(gt[k, :4], gt[k, -1], gt[k, 4],
                                  img_id="out_gt")
        self._emit(dbg, phase, iter_id)

    def _debug_multi_pose(self, inp, batch, out, meta, iter_id, phase):
        opt = self.opt
        hm = jax.nn.sigmoid(out["hm"])
        reg = out.get("reg") if opt.reg_offset else None
        hm_hp = jax.nn.sigmoid(out["hm_hp"]) if opt.hm_hp and "hm_hp" in out \
            else None
        hp_off = out.get("hp_offset") if opt.reg_hp_offset else None
        dets = np.array(D.multi_pose_decode(hm, out["wh"], out["hps"],
                                              reg=reg, hm_hp=hm_hp,
                                              hp_offset=hp_off, k=opt.K))
        dets[:, :, :4] *= opt.down_ratio
        dets[:, :, 5:39] *= opt.down_ratio

        dbg = self._debugger()
        img = self._first_image(inp, batch)
        dbg.add_blend_img(img, dbg.gen_colormap(np.asarray(hm[0])),
                          "pred_hm")
        dbg.add_blend_img(img, dbg.gen_colormap(np.asarray(batch["hm"][0])),
                          "gt_hm")
        dbg.add_img(img, img_id="out_pred")
        for k in range(len(dets[0])):
            if dets[0, k, 4] > opt.center_thresh:
                dbg.add_coco_bbox(dets[0, k, :4], dets[0, k, -1],
                                  dets[0, k, 4], img_id="out_pred")
                dbg.add_coco_hp(dets[0, k, 5:39], img_id="out_pred")
        if hm_hp is not None and "hm_hp" in batch:
            dbg.add_blend_img(img, dbg.gen_colormap(np.asarray(hm_hp[0])),
                              "pred_hmhp")
            dbg.add_blend_img(
                img, dbg.gen_colormap(np.asarray(batch["hm_hp"][0])),
                "gt_hmhp")
        self._emit(dbg, phase, iter_id)

    def _debug_ddd(self, inp, batch, out, meta, iter_id, phase):
        opt = self.opt
        hm = jax.nn.sigmoid(out["hm"])
        wh = out.get("wh") if opt.reg_bbox else None
        reg = out.get("reg") if opt.reg_offset else None
        dets = np.array(D.ddd_decode(hm, out["rot"], out["dep"],
                                       out["dim"], wh=wh, reg=reg, k=opt.K))
        m0 = meta[0] if meta else {}
        dbg = self._debugger()
        img = self._first_image(inp, batch)
        dbg.add_blend_img(img, dbg.gen_colormap(np.asarray(hm[0])),
                          "hm_pred")
        dbg.add_blend_img(img, dbg.gen_colormap(np.asarray(batch["hm"][0])),
                          "hm_gt")
        dbg.add_ct_detection(img, dets[0], show_box=opt.reg_bbox,
                             center_thresh=opt.center_thresh,
                             img_id="det_pred")
        if "calib" in m0:
            calib = np.asarray(m0["calib"])[None]
            dets_pred = PP.ddd_post_process(
                dets[0:1].copy(), np.asarray(m0["c"])[None],
                np.asarray([m0["s"]]), calib, opt)
            dbg.add_3d_detection(img, dets_pred[0], calib[0],
                                 center_thresh=opt.center_thresh,
                                 img_id="add_pred")
            dbg.add_bird_view(dets_pred[0],
                              center_thresh=opt.center_thresh,
                              img_id="bird_pred")
        self._emit(dbg, phase, iter_id)

    def _debug_exdet(self, inp, batch, out, meta, iter_id, phase):
        opt = self.opt
        hms = {p: jax.nn.sigmoid(out["hm_" + p])
               for p in ("t", "l", "b", "r", "c")}
        dets = np.array(D.exct_decode(hms["t"], hms["l"], hms["b"],
                                        hms["r"], hms["c"],
                                        k=opt.K, num_dets=opt.K))
        dets[:, :, :4] *= opt.down_ratio
        dbg = self._debugger()
        img = self._first_image(inp, batch)
        pred_hm = np.zeros(img.shape, dtype=np.uint8)
        gt_hm = np.zeros(img.shape, dtype=np.uint8)
        for p in ("t", "l", "b", "r", "c"):
            pred = dbg.gen_colormap(np.asarray(hms[p][0]))
            gt = dbg.gen_colormap(np.asarray(batch["hm_" + p][0]))
            if p != "c":
                pred_hm = np.maximum(pred_hm, pred)
                gt_hm = np.maximum(gt_hm, gt)
            if p == "c" or opt.debug > 2:
                dbg.add_blend_img(img, pred, "pred_{}".format(p))
                dbg.add_blend_img(img, gt, "gt_{}".format(p))
        dbg.add_blend_img(img, pred_hm, "pred")
        dbg.add_blend_img(img, gt_hm, "gt")
        dbg.add_img(img, img_id="out")
        for k in range(len(dets[0])):
            if dets[0, k, 4] > 0.1:
                dbg.add_coco_bbox(dets[0, k, :4], dets[0, k, -1],
                                  dets[0, k, 4], img_id="out")
        self._emit(dbg, phase, iter_id)

    # -- save_result ------------------------------------------------------
    def save_result(self, variables, batch, meta, results, fwd_out=None):
        """Decode + back-project sample-0 predictions into `results`
        keyed by img_id (reference hooks run with val batch_size 1)."""
        if not meta or "img_id" not in meta[0]:
            return
        inp, batch2, out = fwd_out if fwd_out is not None \
            else self._fwd(variables, batch)
        fn = getattr(self, "_save_" + self.task, None)
        if fn is None:
            return
        m0 = meta[0]
        results[m0["img_id"]] = fn(out, m0)

    def _save_ctdet(self, out, m0):
        opt = self.opt
        hm = jax.nn.sigmoid(out["hm"])
        reg = out.get("reg") if opt.reg_offset else None
        dets = np.array(D.ctdet_decode(hm, out["wh"], reg,
                                         cat_spec_wh=opt.cat_spec_wh,
                                         k=opt.K))
        h, w = hm.shape[1], hm.shape[2]
        dets_out = PP.ctdet_post_process(
            dets[0:1].copy(), np.asarray(m0["c"])[None],
            np.asarray([m0["s"]]), h, w, opt.num_classes)
        return dets_out[0]

    def _save_ddd(self, out, m0):
        opt = self.opt
        hm = jax.nn.sigmoid(out["hm"])
        wh = out.get("wh") if opt.reg_bbox else None
        reg = out.get("reg") if opt.reg_offset else None
        dets = np.array(D.ddd_decode(hm, out["rot"], out["dep"],
                                       out["dim"], wh=wh, reg=reg, k=opt.K))
        calib = np.asarray(m0["calib"])[None]
        dets_out = PP.ddd_post_process(
            dets[0:1].copy(), np.asarray(m0["c"])[None],
            np.asarray([m0["s"]]), calib, opt)
        return dets_out[0]

    def _save_multi_pose(self, out, m0):
        opt = self.opt
        hm = jax.nn.sigmoid(out["hm"])
        reg = out.get("reg") if opt.reg_offset else None
        hm_hp = jax.nn.sigmoid(out["hm_hp"]) if opt.hm_hp and "hm_hp" in out \
            else None
        hp_off = out.get("hp_offset") if opt.reg_hp_offset else None
        dets = np.array(D.multi_pose_decode(hm, out["wh"], out["hps"],
                                              reg=reg, hm_hp=hm_hp,
                                              hp_offset=hp_off, k=opt.K))
        h, w = hm.shape[1], hm.shape[2]
        dets_out = PP.multi_pose_post_process(
            dets[0:1].copy(), np.asarray(m0["c"])[None],
            np.asarray([m0["s"]]), h, w)
        return dets_out[0]
