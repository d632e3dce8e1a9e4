"""Per-task target-generation samplers (host numpy; cheap vs TPU compute).

Each sampler mixin provides `get_sample(index) -> dict of numpy arrays` —
fixed-shape targets ready to batch and feed the jitted train step. Port of
reference lib/datasets/sample/ctdet.py:30-146 (and siblings); cv2 does the
image IO/warp exactly as the reference so geometry parity holds.
"""

from __future__ import annotations

import math
import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .affine import (affine_transform, draw_dense_reg, draw_msra_gaussian,
                     draw_umich_gaussian, gaussian_radius,
                     get_affine_transform)
from .image_aug import color_aug
from .device_aug import draw_color_aug_params, identity_aug_params


def finish_input(sampler, inp_u8, is_train, rng=None):
    """Shared input tail: either the reference's host path (/255 ->
    color_aug -> normalize, f32 'input') or device mode ('input_u8' +
    7 floats of aug state; the jitted step runs device_aug.device_
    preprocess) — 4x less host->device traffic. inp_u8=None is the
    HBM-cache mode (data/device_cache.py): only the aug state is
    emitted; the caller adds img_idx + warp_ti and the jitted step
    gathers/warps from the device-resident stack.

    rng=None keeps the reference's shared `_data_rng` stream (exact
    parity, single-worker reproducible); an explicit rng makes the draws
    independent of worker-thread scheduling (loader passes a per-batch
    stream)."""
    opt = sampler.opt
    data_rng = rng if rng is not None else sampler._data_rng
    if getattr(opt, "host_normalize", False):
        if inp_u8 is None:
            raise ValueError("--device_cache requires the device input "
                             "path (drop --host_normalize)")
        inp = inp_u8.astype(np.float32) / 255.0
        if is_train and not opt.no_color_aug:
            color_aug(data_rng, inp, sampler._eig_val,
                      sampler._eig_vec, py_random=rng)
        inp = (inp - sampler.mean) / sampler.std
        return {"input": inp.astype(np.float32)}
    if is_train and not opt.no_color_aug:
        perm, alphas, light = draw_color_aug_params(
            data_rng, sampler._eig_val, sampler._eig_vec, py_random=rng)
    else:
        perm, alphas, light = identity_aug_params()
    fields = {"aug_perm": np.int32(perm), "aug_alphas": alphas,
              "aug_light": light}
    if inp_u8 is not None:
        fields["input_u8"] = np.ascontiguousarray(inp_u8)
    return fields


def coco_box_to_bbox(box):
    return np.array([box[0], box[1], box[0] + box[2], box[1] + box[3]],
                    dtype=np.float32)


def get_border(border, size):
    """Random-crop border heuristic (reference sample/ctdet.py:24-28)."""
    i = 1
    while size - border // i <= border // i:
        i *= 2
    return border // i


class CTDetSampler:
    """2D-box detection targets (reference sample/ctdet.py:30-146)."""

    def _load_image_anns(self, index):
        img_id = self.images[index]
        file_name = self.coco.loadImgs(ids=[img_id])[0]["file_name"]
        img_path = os.path.join(self.img_dir, file_name)
        ann_ids = self.coco.getAnnIds(imgIds=[img_id])
        anns = self.coco.loadAnns(ids=ann_ids)
        img = cv2.imread(img_path)
        return img_id, img, anns

    def load_raw_image(self, index):
        """Raw (unwarped) pixels for the HBM cache (device_cache.py) —
        image only, no annotation fetch."""
        img_id = self.images[index]
        file_name = self.coco.loadImgs(ids=[img_id])[0]["file_name"]
        return cv2.imread(os.path.join(self.img_dir, file_name))

    def get_sample(self, index, rng=None):
        explicit_rng = rng
        rng = rng if rng is not None else np.random
        # HBM-cache mode (data/device_cache.py): the pixels already sit on
        # device; the host only needs dims + annotations and emits the
        # warp matrix instead of warped pixels. Train split only — the
        # trainer holds one cache, built over its train dataset.
        cache_dims = getattr(self, "_image_cache_dims", None)
        use_cache = cache_dims is not None and self.split == "train"
        if use_cache:
            img_id = self.images[index]
            anns = self.coco.loadAnns(
                ids=self.coco.getAnnIds(imgIds=[img_id]))
            height, width = int(cache_dims[index][0]), \
                int(cache_dims[index][1])
            img = None
        else:
            img_id, img, anns = self._load_image_anns(index)
            height, width = img.shape[0], img.shape[1]
        num_objs = min(len(anns), self.max_objs)
        c = np.array([width / 2.0, height / 2.0], dtype=np.float32)
        if self.opt.keep_res:
            input_h = (height | self.opt.pad) + 1
            input_w = (width | self.opt.pad) + 1
            s = np.array([input_w, input_h], dtype=np.float32)
        else:
            s = max(height, width) * 1.0
            input_h, input_w = self.opt.input_h, self.opt.input_w

        flipped = False
        if self.split == "train":
            if not self.opt.not_rand_crop:
                s = s * rng.choice(np.arange(0.6, 1.4, 0.1))
                w_border = get_border(128, width)
                h_border = get_border(128, height)
                c[0] = rng.randint(low=w_border, high=width - w_border)
                c[1] = rng.randint(low=h_border, high=height - h_border)
            else:
                sf = self.opt.scale
                cf = self.opt.shift
                c[0] += s * np.clip(rng.randn() * cf, -2 * cf, 2 * cf)
                c[1] += s * np.clip(rng.randn() * cf, -2 * cf, 2 * cf)
                s = s * np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
            if rng.random() < self.opt.flip:
                flipped = True
                if img is not None:
                    img = img[:, ::-1, :]
                c[0] = width - c[0] - 1

        trans_input = get_affine_transform(c, s, 0, [input_w, input_h])
        if use_cache:
            ti = get_affine_transform(c, s, 0, [input_w, input_h], inv=1)
            if flipped:
                from .device_cache import flip_compose
                ti = flip_compose(ti, width)
            input_fields = finish_input(self, None, True, rng=explicit_rng)
            input_fields.update(img_idx=np.int32(index),
                                warp_ti=np.asarray(ti, np.float32))
        else:
            inp_u8 = cv2.warpAffine(img, np.asarray(trans_input),
                                    (input_w, input_h),
                                    flags=cv2.INTER_LINEAR)
            input_fields = finish_input(self, inp_u8,
                                        self.split == "train",
                                        rng=explicit_rng)

        output_h = input_h // self.opt.down_ratio
        output_w = input_w // self.opt.down_ratio
        num_classes = self.num_classes
        trans_output = get_affine_transform(c, s, 0, [output_w, output_h])

        # sparse-hm device mode: ship (ct, radius, cls) per object and let
        # the jitted step render the gaussian heatmap (device_aug.render_
        # umich_hm) — the dense hm is the largest target tensor. Dense
        # host drawing stays for mse_loss (msra gaussian) and dense_wh
        # (which samples hm while drawing).
        sparse_hm = (("input_u8" in input_fields
                      or "img_idx" in input_fields)
                     and not self.opt.mse_loss and not self.opt.dense_wh)
        hm = np.zeros((output_h, output_w, num_classes), dtype=np.float32)
        hm_ct = np.zeros((self.max_objs, 2), dtype=np.int32)
        hm_radius = np.zeros((self.max_objs,), dtype=np.int32)
        hm_cls = np.zeros((self.max_objs,), dtype=np.int32)
        wh = np.zeros((self.max_objs, 2), dtype=np.float32)
        dense_wh = np.zeros((output_h, output_w, 2), dtype=np.float32)
        reg = np.zeros((self.max_objs, 2), dtype=np.float32)
        ind = np.zeros((self.max_objs,), dtype=np.int64)
        reg_mask = np.zeros((self.max_objs,), dtype=np.uint8)
        cat_spec_wh = np.zeros((self.max_objs, num_classes * 2),
                               dtype=np.float32)
        cat_spec_mask = np.zeros((self.max_objs, num_classes * 2),
                                 dtype=np.uint8)

        # reference draws on (C, H, W); we draw per-class 2D slices
        draw_gaussian = draw_msra_gaussian if self.opt.mse_loss \
            else draw_umich_gaussian

        gt_det = []
        for k in range(num_objs):
            ann = anns[k]
            bbox = coco_box_to_bbox(ann["bbox"])
            cls_id = int(self.cat_ids[ann["category_id"]])
            if flipped:
                bbox[[0, 2]] = width - bbox[[2, 0]] - 1
            bbox[:2] = affine_transform(bbox[:2], trans_output)
            bbox[2:] = affine_transform(bbox[2:], trans_output)
            bbox[[0, 2]] = np.clip(bbox[[0, 2]], 0, output_w - 1)
            bbox[[1, 3]] = np.clip(bbox[[1, 3]], 0, output_h - 1)
            h, w = bbox[3] - bbox[1], bbox[2] - bbox[0]
            if h > 0 and w > 0:
                radius = gaussian_radius((math.ceil(h), math.ceil(w)))
                radius = max(0, int(radius))
                radius = self.opt.hm_gauss if self.opt.mse_loss else radius
                ct = np.array([(bbox[0] + bbox[2]) / 2,
                               (bbox[1] + bbox[3]) / 2], dtype=np.float32)
                ct_int = ct.astype(np.int32)
                if sparse_hm:
                    hm_ct[k] = ct_int
                    hm_radius[k] = radius
                    hm_cls[k] = cls_id
                else:
                    hm_slice = np.ascontiguousarray(hm[:, :, cls_id])
                    draw_gaussian(hm_slice, ct_int, radius)
                    hm[:, :, cls_id] = hm_slice
                wh[k] = 1.0 * w, 1.0 * h
                ind[k] = ct_int[1] * output_w + ct_int[0]
                reg[k] = ct - ct_int
                reg_mask[k] = 1
                cat_spec_wh[k, cls_id * 2: cls_id * 2 + 2] = wh[k]
                cat_spec_mask[k, cls_id * 2: cls_id * 2 + 2] = 1
                if self.opt.dense_wh:
                    dw = np.transpose(dense_wh, (2, 0, 1)).copy()
                    draw_dense_reg(dw, hm.max(axis=2), ct_int, wh[k], radius)
                    dense_wh = np.transpose(dw, (1, 2, 0))
                gt_det.append([ct[0] - w / 2, ct[1] - h / 2,
                               ct[0] + w / 2, ct[1] + h / 2, 1, cls_id])

        ret = {**input_fields,
               "reg_mask": reg_mask, "ind": ind, "wh": wh}
        if sparse_hm:
            ret.update(hm_ct=hm_ct, hm_radius=hm_radius, hm_cls=hm_cls)
        else:
            ret["hm"] = hm
        if self.opt.dense_wh:
            hm_a = hm.max(axis=2, keepdims=True)
            ret.update({"dense_wh": dense_wh,
                        "dense_wh_mask": np.concatenate([hm_a, hm_a],
                                                        axis=2)})
            del ret["wh"]
        elif self.opt.cat_spec_wh:
            ret.update({"cat_spec_wh": cat_spec_wh,
                        "cat_spec_mask": cat_spec_mask})
            del ret["wh"]
        if self.opt.reg_offset:
            ret.update({"reg": reg})
        if self.opt.debug > 0 or not self.split == "train":
            gt_det = np.array(gt_det, dtype=np.float32) if len(gt_det) > 0 \
                else np.zeros((1, 6), dtype=np.float32)
            ret["meta"] = {"c": c, "s": s, "gt_det": gt_det,
                           "img_id": img_id}
        return ret


class DddSampler:
    """KITTI 3D targets (reference sample/ddd.py:28-172)."""

    # default calibration used when an image carries none
    calib = np.array([[707.0493, 0, 604.0814, 45.75831],
                      [0, 707.0493, 180.5066, -0.3454157],
                      [0, 0, 1.0, 0.004981016]], dtype=np.float32)
    alpha_in_degree = False

    def _convert_alpha(self, alpha):
        return math.radians(alpha + 45) if self.alpha_in_degree else alpha

    def _alpha_to_8(self, alpha):
        """2-bin orientation encoding (reference sample/ddd.py:160-171)."""
        ret = [0, 0, 0, 1, 0, 0, 0, 1]
        if alpha < np.pi / 6.0 or alpha > 5 * np.pi / 6.0:
            r = alpha - (-0.5 * np.pi)
            ret[1] = 1
            ret[2], ret[3] = np.sin(r), np.cos(r)
        if alpha > -np.pi / 6.0 or alpha < -5 * np.pi / 6.0:
            r = alpha - (0.5 * np.pi)
            ret[5] = 1
            ret[6], ret[7] = np.sin(r), np.cos(r)
        return ret

    def get_sample(self, index, rng=None):
        explicit_rng = rng
        rng = rng if rng is not None else np.random
        img_id = self.images[index]
        img_info = self.coco.loadImgs(ids=[img_id])[0]
        img_path = os.path.join(self.img_dir, img_info["file_name"])
        img = cv2.imread(img_path)
        calib = np.array(img_info["calib"], dtype=np.float32) \
            if "calib" in img_info else self.calib

        height, width = img.shape[0], img.shape[1]
        c = np.array([width / 2.0, height / 2.0])
        if self.opt.keep_res:
            s = np.array([self.opt.input_w, self.opt.input_h],
                         dtype=np.int32)
        else:
            s = np.array([width, height], dtype=np.int32)

        aug = False
        if self.split == "train" and rng.random() < self.opt.aug_ddd:
            aug = True
            sf, cf = self.opt.scale, self.opt.shift
            s = s * np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
            c[0] += width * np.clip(rng.randn() * cf, -2 * cf, 2 * cf)
            c[1] += height * np.clip(rng.randn() * cf, -2 * cf, 2 * cf)

        trans_input = get_affine_transform(
            c, s, 0, [self.opt.input_w, self.opt.input_h])
        inp = cv2.warpAffine(img, np.asarray(trans_input),
                             (self.opt.input_w, self.opt.input_h),
                             flags=cv2.INTER_LINEAR)
        # reference ddd sampler has no color aug: device mode ships uint8
        # with identity aug params (normalize-only on device)
        input_fields = finish_input(self, inp, is_train=False, rng=explicit_rng)

        num_classes = self.opt.num_classes
        out_w, out_h = self.opt.output_w, self.opt.output_h
        trans_output = get_affine_transform(c, s, 0, [out_w, out_h])

        hm = np.zeros((out_h, out_w, num_classes), dtype=np.float32)
        wh = np.zeros((self.max_objs, 2), dtype=np.float32)
        reg = np.zeros((self.max_objs, 2), dtype=np.float32)
        dep = np.zeros((self.max_objs, 1), dtype=np.float32)
        rotbin = np.zeros((self.max_objs, 2), dtype=np.int64)
        rotres = np.zeros((self.max_objs, 2), dtype=np.float32)
        dim = np.zeros((self.max_objs, 3), dtype=np.float32)
        ind = np.zeros((self.max_objs,), dtype=np.int64)
        reg_mask = np.zeros((self.max_objs,), dtype=np.uint8)
        rot_mask = np.zeros((self.max_objs,), dtype=np.uint8)

        anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=[img_id]))
        num_objs = min(len(anns), self.max_objs)
        draw_gaussian = draw_msra_gaussian if self.opt.mse_loss \
            else draw_umich_gaussian
        gt_det = []
        for k in range(num_objs):
            ann = anns[k]
            bbox = coco_box_to_bbox(ann["bbox"])
            cls_id = int(self.cat_ids[ann["category_id"]])
            if cls_id <= -99:
                continue
            bbox[:2] = affine_transform(bbox[:2], trans_output)
            bbox[2:] = affine_transform(bbox[2:], trans_output)
            bbox[[0, 2]] = np.clip(bbox[[0, 2]], 0, out_w - 1)
            bbox[[1, 3]] = np.clip(bbox[[1, 3]], 0, out_h - 1)
            h, w = bbox[3] - bbox[1], bbox[2] - bbox[0]
            if h > 0 and w > 0:
                radius = max(0, int(gaussian_radius((h, w))))
                ct = np.array([(bbox[0] + bbox[2]) / 2,
                               (bbox[1] + bbox[3]) / 2], dtype=np.float32)
                ct_int = ct.astype(np.int32)
                if cls_id < 0:
                    # ignore region: splat near-1 so focal loss mutes it
                    # (reference sample/ddd.py:108-118)
                    ignore_id = list(range(num_classes)) if cls_id == -1 \
                        else [-cls_id - 2]
                    if self.opt.rect_mask:
                        hm[int(bbox[1]):int(bbox[3]) + 1,
                           int(bbox[0]):int(bbox[2]) + 1, ignore_id] = 0.9999
                    else:
                        for cc in ignore_id:
                            sl = np.ascontiguousarray(hm[:, :, cc])
                            draw_gaussian(sl, ct, radius)
                            hm[:, :, cc] = sl
                        hm[ct_int[1], ct_int[0], ignore_id] = 0.9999
                    continue
                sl = np.ascontiguousarray(hm[:, :, cls_id])
                draw_gaussian(sl, ct, radius)
                hm[:, :, cls_id] = sl

                wh[k] = 1.0 * w, 1.0 * h
                gt_det.append(
                    [ct[0], ct[1], 1]
                    + self._alpha_to_8(self._convert_alpha(ann["alpha"]))
                    + [ann["depth"]] + list(np.array(ann["dim"]))
                    + [cls_id])
                if self.opt.reg_bbox:
                    gt_det[-1] = gt_det[-1][:-1] + [w, h] + [gt_det[-1][-1]]
                alpha = self._convert_alpha(ann["alpha"])
                if alpha < np.pi / 6.0 or alpha > 5 * np.pi / 6.0:
                    rotbin[k, 0] = 1
                    rotres[k, 0] = alpha - (-0.5 * np.pi)
                if alpha > -np.pi / 6.0 or alpha < -5 * np.pi / 6.0:
                    rotbin[k, 1] = 1
                    rotres[k, 1] = alpha - (0.5 * np.pi)
                dep[k] = ann["depth"]
                dim[k] = ann["dim"]
                ind[k] = ct_int[1] * out_w + ct_int[0]
                reg[k] = ct - ct_int
                reg_mask[k] = 1 if not aug else 0
                rot_mask[k] = 1

        ret = {**input_fields, "hm": hm, "dep": dep,
               "dim": dim, "ind": ind, "rotbin": rotbin, "rotres": rotres,
               "reg_mask": reg_mask, "rot_mask": rot_mask}
        if self.opt.reg_bbox:
            ret.update({"wh": wh})
        if self.opt.reg_offset:
            ret.update({"reg": reg})
        if self.opt.debug > 0 or "train" not in self.split:
            gt_det = np.array(gt_det, dtype=np.float32) if len(gt_det) > 0 \
                else np.zeros((1, 18), dtype=np.float32)
            ret["meta"] = {"c": c, "s": s, "gt_det": gt_det, "calib": calib,
                           "image_path": img_path, "img_id": img_id}
        return ret


class MultiPoseSampler:
    """COCO keypoint targets (reference sample/multi_pose.py:30-184)."""

    def get_sample(self, index, rng=None):
        explicit_rng = rng
        rng = rng if rng is not None else np.random
        img_id = self.images[index]
        file_name = self.coco.loadImgs(ids=[img_id])[0]["file_name"]
        img_path = os.path.join(self.img_dir, file_name)
        anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=[img_id]))
        num_objs = min(len(anns), self.max_objs)
        img = cv2.imread(img_path)

        height, width = img.shape[0], img.shape[1]
        c = np.array([width / 2.0, height / 2.0], dtype=np.float32)
        s = max(height, width) * 1.0
        rot = 0

        flipped = False
        if self.split == "train":
            if not self.opt.not_rand_crop:
                s = s * rng.choice(np.arange(0.6, 1.4, 0.1))
                w_border = get_border(128, width)
                h_border = get_border(128, height)
                c[0] = rng.randint(low=w_border, high=width - w_border)
                c[1] = rng.randint(low=h_border,
                                         high=height - h_border)
            else:
                sf, cf = self.opt.scale, self.opt.shift
                c[0] += s * np.clip(rng.randn() * cf, -2 * cf, 2 * cf)
                c[1] += s * np.clip(rng.randn() * cf, -2 * cf, 2 * cf)
                s = s * np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
            if rng.random() < self.opt.aug_rot:
                rf = self.opt.rotate
                rot = np.clip(rng.randn() * rf, -rf * 2, rf * 2)
            if rng.random() < self.opt.flip:
                flipped = True
                img = img[:, ::-1, :]
                c[0] = width - c[0] - 1

        input_res = self.opt.input_res
        trans_input = get_affine_transform(c, s, rot, [input_res, input_res])
        inp = cv2.warpAffine(img, np.asarray(trans_input),
                             (input_res, input_res), flags=cv2.INTER_LINEAR)
        input_fields = finish_input(self, inp, self.split == "train",
                                     rng=explicit_rng)

        output_res = self.opt.output_res
        num_joints = self.num_joints
        trans_output_rot = get_affine_transform(c, s, rot,
                                                [output_res, output_res])
        trans_output = get_affine_transform(c, s, 0,
                                            [output_res, output_res])

        hm = np.zeros((output_res, output_res, self.num_classes), np.float32)
        hm_hp = np.zeros((output_res, output_res, num_joints), np.float32)
        dense_kps = np.zeros((num_joints, 2, output_res, output_res),
                             np.float32)
        dense_kps_mask = np.zeros((num_joints, output_res, output_res),
                                  np.float32)
        wh = np.zeros((self.max_objs, 2), np.float32)
        kps = np.zeros((self.max_objs, num_joints * 2), np.float32)
        reg = np.zeros((self.max_objs, 2), np.float32)
        ind = np.zeros((self.max_objs,), np.int64)
        reg_mask = np.zeros((self.max_objs,), np.uint8)
        kps_mask = np.zeros((self.max_objs, num_joints * 2), np.uint8)
        hp_offset = np.zeros((self.max_objs * num_joints, 2), np.float32)
        hp_ind = np.zeros((self.max_objs * num_joints,), np.int64)
        hp_mask = np.zeros((self.max_objs * num_joints,), np.int64)

        draw_gaussian = draw_msra_gaussian if self.opt.mse_loss \
            else draw_umich_gaussian

        gt_det = []
        for k in range(num_objs):
            ann = anns[k]
            bbox = coco_box_to_bbox(ann["bbox"])
            cls_id = int(ann["category_id"]) - 1
            pts = np.array(ann["keypoints"], np.float32).reshape(
                num_joints, 3)
            if flipped:
                bbox[[0, 2]] = width - bbox[[2, 0]] - 1
                pts[:, 0] = width - pts[:, 0] - 1
                for e in self.flip_idx:
                    pts[e[0]], pts[e[1]] = pts[e[1]].copy(), pts[e[0]].copy()
            bbox[:2] = affine_transform(bbox[:2], trans_output)
            bbox[2:] = affine_transform(bbox[2:], trans_output)
            bbox = np.clip(bbox, 0, output_res - 1)
            h, w = bbox[3] - bbox[1], bbox[2] - bbox[0]
            if (h > 0 and w > 0) or (rot != 0):
                radius = gaussian_radius((math.ceil(h), math.ceil(w)))
                radius = self.opt.hm_gauss if self.opt.mse_loss \
                    else max(0, int(radius))
                ct = np.array([(bbox[0] + bbox[2]) / 2,
                               (bbox[1] + bbox[3]) / 2], dtype=np.float32)
                ct_int = ct.astype(np.int32)
                wh[k] = 1.0 * w, 1.0 * h
                ind[k] = ct_int[1] * output_res + ct_int[0]
                reg[k] = ct - ct_int
                reg_mask[k] = 1
                num_kpts = pts[:, 2].sum()
                if num_kpts == 0:
                    hm[ct_int[1], ct_int[0], cls_id] = 0.9999
                    reg_mask[k] = 0

                hp_radius = gaussian_radius((math.ceil(h), math.ceil(w)))
                hp_radius = self.opt.hm_gauss if self.opt.mse_loss \
                    else max(0, int(hp_radius))
                for j in range(num_joints):
                    if pts[j, 2] > 0:
                        pts[j, :2] = affine_transform(pts[j, :2],
                                                      trans_output_rot)
                        if 0 <= pts[j, 0] < output_res and \
                                0 <= pts[j, 1] < output_res:
                            kps[k, j * 2: j * 2 + 2] = pts[j, :2] - ct_int
                            kps_mask[k, j * 2: j * 2 + 2] = 1
                            pt_int = pts[j, :2].astype(np.int32)
                            hp_offset[k * num_joints + j] = \
                                pts[j, :2] - pt_int
                            hp_ind[k * num_joints + j] = \
                                pt_int[1] * output_res + pt_int[0]
                            hp_mask[k * num_joints + j] = 1
                            if self.opt.dense_hp:
                                hm_sl = np.ascontiguousarray(
                                    hm[:, :, cls_id])
                                draw_dense_reg(dense_kps[j], hm_sl, ct_int,
                                               pts[j, :2] - ct_int, radius,
                                               is_offset=True)
                                draw_gaussian(dense_kps_mask[j], ct_int,
                                              radius)
                            hp_sl = np.ascontiguousarray(hm_hp[:, :, j])
                            draw_gaussian(hp_sl, pt_int, hp_radius)
                            hm_hp[:, :, j] = hp_sl
                hm_sl = np.ascontiguousarray(hm[:, :, cls_id])
                draw_gaussian(hm_sl, ct_int, radius)
                hm[:, :, cls_id] = hm_sl
                gt_det.append([ct[0] - w / 2, ct[1] - h / 2,
                               ct[0] + w / 2, ct[1] + h / 2, 1]
                              + pts[:, :2].reshape(
                                  num_joints * 2).tolist() + [cls_id])
        if rot != 0:
            hm = hm * 0 + 0.9999
            reg_mask *= 0
            kps_mask *= 0
        ret = {**input_fields, "hm": hm,
               "reg_mask": reg_mask, "ind": ind, "wh": wh, "hps": kps,
               "hps_mask": kps_mask}
        if self.opt.dense_hp:
            dense_kps = dense_kps.reshape(num_joints * 2, output_res,
                                          output_res)
            dkm = dense_kps_mask.reshape(num_joints, 1, output_res,
                                         output_res)
            dkm = np.concatenate([dkm, dkm], axis=1).reshape(
                num_joints * 2, output_res, output_res)
            # NHWC for the loss path
            ret.update({
                "dense_hps": np.transpose(dense_kps, (1, 2, 0)),
                "dense_hps_mask": np.transpose(dkm, (1, 2, 0))})
            del ret["hps"], ret["hps_mask"]
        if self.opt.reg_offset:
            ret.update({"reg": reg})
        if self.opt.hm_hp:
            ret.update({"hm_hp": hm_hp})
        if self.opt.reg_hp_offset:
            ret.update({"hp_offset": hp_offset, "hp_ind": hp_ind,
                        "hp_mask": hp_mask})
        if self.opt.debug > 0 or not self.split == "train":
            gt_det = np.array(gt_det, dtype=np.float32) if len(gt_det) > 0 \
                else np.zeros((1, 40), dtype=np.float32)
            ret["meta"] = {"c": c, "s": s, "gt_det": gt_det,
                           "img_id": img_id}
        return ret


class ExdetSampler:
    """ExtremeNet targets (reference sample/exdet.py:31-140): 4 extreme-point
    heatmaps + center heatmap + per-point sub-pixel offsets. Requires
    annotations with 'extreme_points' (instances_extreme_*.json)."""

    def get_sample(self, index, rng=None):
        explicit_rng = rng
        rng = rng if rng is not None else np.random
        img_id = self.images[index]
        img_info = self.coco.loadImgs(ids=[img_id])[0]
        img_path = os.path.join(self.img_dir, img_info["file_name"])
        img = cv2.imread(img_path)

        height, width = img.shape[0], img.shape[1]
        c = np.array([width / 2.0, height / 2.0])
        s = max(height, width) * 1.0

        flipped = False
        if self.split == "train":
            if not self.opt.not_rand_crop:
                s = s * rng.choice(np.arange(0.6, 1.4, 0.1))
                w_border = get_border(128, width)
                h_border = get_border(128, height)
                c[0] = rng.randint(low=w_border, high=width - w_border)
                c[1] = rng.randint(low=h_border,
                                         high=height - h_border)
            else:
                sf, cf = self.opt.scale, self.opt.shift
                s = s * np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
                c[0] += width * np.clip(rng.randn() * cf,
                                        -2 * cf, 2 * cf)
                c[1] += height * np.clip(rng.randn() * cf,
                                         -2 * cf, 2 * cf)
            if rng.random() < self.opt.flip:
                flipped = True
                img = img[:, ::-1, :]

        input_res = self.opt.input_res
        trans_input = get_affine_transform(c, s, 0, [input_res, input_res])
        inp = cv2.warpAffine(img, np.asarray(trans_input),
                             (input_res, input_res), flags=cv2.INTER_LINEAR)
        input_fields = finish_input(self, inp, self.split == "train",
                                     rng=explicit_rng)

        output_res = self.opt.output_res
        num_classes = self.opt.num_classes
        trans_output = get_affine_transform(c, s, 0, [output_res, output_res])
        num_hm = 1 if self.opt.agnostic_ex else num_classes

        hms = {p: np.zeros((output_res, output_res, num_hm), np.float32)
               for p in ("t", "l", "b", "r")}
        hm_c = np.zeros((output_res, output_res, num_classes), np.float32)
        regs = {p: np.zeros((self.max_objs, 2), np.float32)
                for p in ("t", "l", "b", "r")}
        inds = {p: np.zeros((self.max_objs,), np.int64)
                for p in ("t", "l", "b", "r")}
        reg_mask = np.zeros((self.max_objs,), np.uint8)

        anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=[img_id]))
        num_objs = min(len(anns), self.max_objs)
        draw_gaussian = draw_msra_gaussian if self.opt.mse_loss \
            else draw_umich_gaussian

        for k in range(num_objs):
            ann = anns[k]
            pts = np.array(ann["extreme_points"],
                           dtype=np.float32).reshape(4, 2)  # t, l, b, r
            cls_id = int(self.cat_ids[ann["category_id"]])
            hm_id = 0 if self.opt.agnostic_ex else cls_id
            if flipped:
                pts[:, 0] = width - pts[:, 0] - 1
                pts[1], pts[3] = pts[3].copy(), pts[1].copy()
            for j in range(4):
                pts[j] = affine_transform(pts[j], trans_output)
            pts = np.clip(pts, 0, output_res - 1)
            h, w = pts[2, 1] - pts[0, 1], pts[3, 0] - pts[1, 0]
            if h > 0 and w > 0:
                radius = max(0, int(gaussian_radius(
                    (math.ceil(h), math.ceil(w)))))
                pt_int = pts.astype(np.int32)
                for pi, p in enumerate(("t", "l", "b", "r")):
                    sl = np.ascontiguousarray(hms[p][:, :, hm_id])
                    draw_gaussian(sl, pt_int[pi], radius)
                    hms[p][:, :, hm_id] = sl
                    regs[p][k] = pts[pi] - pt_int[pi]
                    inds[p][k] = pt_int[pi, 1] * output_res + pt_int[pi, 0]
                ct = [int((pts[3, 0] + pts[1, 0]) / 2),
                      int((pts[0, 1] + pts[2, 1]) / 2)]
                sl = np.ascontiguousarray(hm_c[:, :, cls_id])
                draw_gaussian(sl, ct, radius)
                hm_c[:, :, cls_id] = sl
                reg_mask[k] = 1

        ret = {**input_fields, "hm_t": hms["t"],
               "hm_l": hms["l"], "hm_b": hms["b"], "hm_r": hms["r"],
               "hm_c": hm_c}
        if self.opt.reg_offset:
            ret.update({"reg_mask": reg_mask})
            for p in ("t", "l", "b", "r"):
                ret["reg_{}".format(p)] = regs[p]
                ret["ind_{}".format(p)] = inds[p]
        if self.opt.debug > 0 or not self.split == "train":
            ret["meta"] = {"c": c, "s": s, "img_id": img_id,
                           "gt_det": np.zeros((1, 6), np.float32)}
        return ret
