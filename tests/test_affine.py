"""Geometry contract tests: our affine solve vs cv2, warp parity, gaussians."""

import numpy as np
import pytest

from codenet_tpu.data import affine as A

cv2 = pytest.importorskip("cv2")


def _random_case(rng):
    center = rng.uniform(50, 400, size=2).astype(np.float32)
    scale = float(rng.uniform(100, 600))
    rot = float(rng.uniform(-30, 30))
    out = [int(rng.choice([128, 256, 384, 512])),
           int(rng.choice([128, 256, 384, 512]))]
    return center, scale, rot, out


def _reference_transform(center, scale, rot, output_size, inv=0):
    """The reference construction, but with cv2.getAffineTransform."""
    scale = np.array([scale, scale], dtype=np.float32)
    src_w, dst_w, dst_h = scale[0], output_size[0], output_size[1]
    rot_rad = np.pi * rot / 180
    src_dir = A.get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center
    src[1, :] = center + src_dir
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5], np.float32) + dst_dir
    src[2:, :] = A.get_3rd_point(src[0, :], src[1, :])
    dst[2:, :] = A.get_3rd_point(dst[0, :], dst[1, :])
    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def test_affine_matches_cv2():
    rng = np.random.RandomState(0)
    for _ in range(50):
        center, scale, rot, out = _random_case(rng)
        for inv in (0, 1):
            ours = A.get_affine_transform(center, scale, rot, out, inv=inv)
            ref = _reference_transform(center, scale, rot, out, inv=inv)
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_transform_roundtrip():
    rng = np.random.RandomState(1)
    center = np.array([320.0, 240.0], np.float32)
    scale = 640.0
    out = (128, 128)
    pts = rng.uniform(0, 128, size=(20, 2))
    fwd = A.get_affine_transform(center, scale, 0, out)
    back = A.transform_preds(pts, center, scale, out)
    again = np.stack([A.affine_transform(p, fwd) for p in back])
    np.testing.assert_allclose(again, pts, atol=1e-3)


def test_warp_affine_jax_matches_cv2():
    rng = np.random.RandomState(2)
    img = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
    center = np.array([320.0, 240.0], np.float32)
    scale = 640.0
    out_w = out_h = 256
    trans = A.get_affine_transform(center, scale, 0, [out_w, out_h])
    ref = cv2.warpAffine(img, np.asarray(trans), (out_w, out_h),
                         flags=cv2.INTER_LINEAR)
    inv = A.get_affine_transform(center, scale, 0, [out_w, out_h], inv=1)
    got = np.asarray(A.warp_affine_jax(img, np.asarray(inv, np.float32),
                                       out_h, out_w))
    # cv2 INTER_LINEAR uses 5-bit fixed-point interpolation weights; allow
    # quantization-level differences.
    assert np.mean(np.abs(got - ref)) < 0.5
    assert np.max(np.abs(got - ref)) < 16.0


def test_gaussian_radius_and_splat():
    r = A.gaussian_radius((24, 36))
    assert 0 < r < 24
    hm = np.zeros((32, 32), np.float32)
    A.draw_umich_gaussian(hm, (10, 12), 3)
    assert hm[12, 10] == 1.0
    assert hm[12, 11] < 1.0 and hm[12, 11] > 0
    # splat clipped at borders must not error
    A.draw_umich_gaussian(hm, (0, 0), 5)
    A.draw_umich_gaussian(hm, (31, 31), 5)
    assert hm[0, 0] == 1.0 and hm[31, 31] == 1.0


def test_warp_affine_jax_letterbox_cases():
    """The detector's actual letterbox geometries (VERDICT r2 next-#6):
    non-square frames, upscale and downscale, centered padding — device
    warp must match cv2 within INTER_LINEAR's 5-bit fixed-point noise."""
    rng = np.random.RandomState(3)
    for (h, w, res) in [(90, 120, 64), (375, 500, 256), (480, 640, 512),
                        (333, 220, 256)]:
        img = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
        c = np.array([w / 2.0, h / 2.0], np.float32)
        s = max(h, w) * 1.0
        trans = A.get_affine_transform(c, s, 0, [res, res])
        ref = cv2.warpAffine(img, np.asarray(trans), (res, res),
                             flags=cv2.INTER_LINEAR)
        inv = A.get_affine_transform(c, s, 0, [res, res], inv=1)
        got = np.asarray(A.warp_affine_jax(img, np.asarray(inv, np.float32),
                                           res, res))
        assert np.mean(np.abs(got - ref)) < 0.5, (h, w, res)
        assert np.max(np.abs(got - ref)) < 16.0, (h, w, res)
