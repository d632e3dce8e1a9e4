"""Device-side color-aug + normalization vs the reference host path.

The sampler's device mode ('input_u8' + 7 floats of aug state, applied by
device_aug.device_preprocess inside the jitted step) must reproduce the
host numpy path (image_aug.color_aug + normalize) bit-closely given the
same random stream.
"""

import random

import numpy as np
import pytest

pytest.importorskip("cv2")

from codenet_tpu.data import device_aug as DA
from codenet_tpu.data.image_aug import color_aug


def _eig():
    # the dataset classes' PCA lighting constants (reference coco.py:17-26)
    eig_val = np.array([0.2141788, 0.01817699, 0.00341571],
                       dtype=np.float32)
    eig_vec = np.array([
        [-0.58752847, -0.69563484, 0.41340352],
        [-0.5832747, 0.00994535, -0.81221408],
        [-0.56089297, 0.71832671, 0.41158938]], dtype=np.float32)
    return eig_val, eig_vec


@pytest.mark.parametrize("seed", [0, 7, 123])
def test_device_aug_matches_host(seed):
    eig_val, eig_vec = _eig()
    rng = np.random.RandomState(seed)
    img_u8 = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
    mean = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
    std = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)

    # host path
    random.seed(seed)
    host_rng = np.random.RandomState(seed + 1)
    host = img_u8.astype(np.float32) / 255.0
    color_aug(host_rng, host, eig_val, eig_vec)
    host = (host - mean.reshape(1, 1, 3)) / std.reshape(1, 1, 3)

    # device path, identical random stream
    random.seed(seed)
    dev_rng = np.random.RandomState(seed + 1)
    perm, alphas, light = DA.draw_color_aug_params(dev_rng, eig_val,
                                                   eig_vec)
    out = DA.device_preprocess(
        img_u8[None], np.array([perm], np.int32), alphas[None],
        light[None], mean, std)
    np.testing.assert_allclose(np.asarray(out[0]), host, rtol=2e-5,
                               atol=2e-5)


def test_identity_params_are_pure_normalize():
    rng = np.random.RandomState(2)
    img_u8 = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    mean = np.full(3, 0.4, np.float32)
    std = np.full(3, 0.3, np.float32)
    perm, alphas, light = DA.identity_aug_params()
    out = DA.device_preprocess(
        img_u8[None], np.array([perm], np.int32), alphas[None],
        light[None], mean, std)
    expect = (img_u8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(np.asarray(out[0]), expect, rtol=1e-6,
                               atol=1e-6)


def test_per_sample_independent_params():
    """Different perms/alphas per batch element apply independently."""
    rng = np.random.RandomState(3)
    imgs = (rng.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    perms = np.array([0, 3], np.int32)
    alphas = np.array([[0.2, -0.1, 0.3], [-0.3, 0.2, -0.2]], np.float32)
    light = rng.randn(2, 3).astype(np.float32) * 0.1
    batch = np.asarray(DA.device_preprocess(imgs, perms, alphas, light,
                                            mean, std))
    for i in range(2):
        solo = np.asarray(DA.device_preprocess(
            imgs[i:i + 1], perms[i:i + 1], alphas[i:i + 1],
            light[i:i + 1], mean, std))
        np.testing.assert_allclose(batch[i], solo[0], rtol=1e-6)


def test_render_umich_hm_matches_host_draw():
    """Device-rendered gaussians == host draw_umich_gaussian max-splats,
    including border clipping and same-class overlaps."""
    from codenet_tpu.data.affine import draw_umich_gaussian
    from codenet_tpu.data.device_aug import render_umich_hm

    H, W, C, M = 24, 32, 4, 6
    rng = np.random.RandomState(9)
    hm_host = np.zeros((H, W, C), np.float32)
    ct = np.zeros((M, 2), np.int32)
    radius = np.zeros((M,), np.int32)
    cls = np.zeros((M,), np.int32)
    mask = np.zeros((M,), np.uint8)
    for k in range(M - 1):  # last object left invalid
        x, y = rng.randint(0, W), rng.randint(0, H)  # incl. borders
        r = rng.randint(1, 7)
        c = rng.randint(0, C)
        ct[k] = (x, y)
        radius[k] = r
        cls[k] = c
        mask[k] = 1
        sl = np.ascontiguousarray(hm_host[:, :, c])
        draw_umich_gaussian(sl, (x, y), r)
        hm_host[:, :, c] = sl
    hm_dev = np.asarray(render_umich_hm(
        ct[None], radius[None], cls[None], mask[None], H, W, C))[0]
    np.testing.assert_allclose(hm_dev, hm_host, rtol=1e-6, atol=1e-6)
