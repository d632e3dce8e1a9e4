"""Color augmentation (PCA lighting + brightness/contrast/saturation).

Port of reference lib/utils/image.py:196-234 — operates in-place on a
float32 HWC image in [0,1], matching the reference's random call order.
"""

from __future__ import annotations

import random

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def grayscale(image):
    if cv2 is not None:
        return cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
    return image @ np.array([0.114, 0.587, 0.299], image.dtype)


def lighting_(data_rng, image, alphastd, eigval, eigvec):
    alpha = data_rng.normal(scale=alphastd, size=(3,))
    image += np.dot(eigvec, eigval * alpha)


def blend_(alpha, image1, image2):
    image1 *= alpha
    image2 *= (1 - alpha)
    image1 += image2


def saturation_(data_rng, image, gs, gs_mean, var):
    alpha = 1.0 + data_rng.uniform(low=-var, high=var)
    blend_(alpha, image, gs[:, :, None])


def brightness_(data_rng, image, gs, gs_mean, var):
    alpha = 1.0 + data_rng.uniform(low=-var, high=var)
    image *= alpha


def contrast_(data_rng, image, gs, gs_mean, var):
    alpha = 1.0 + data_rng.uniform(low=-var, high=var)
    blend_(alpha, image, gs_mean)


def color_aug(data_rng, image, eig_val, eig_vec, py_random=None):
    """py_random=None keeps the reference's process-global python-random
    shuffle (exact stream parity); passing a numpy RandomState keeps the
    op-order draw on the same explicit stream as the alphas, so the host
    path stays deterministic under multi-worker loading (matching
    device_aug.draw_color_aug_params)."""
    functions = [brightness_, contrast_, saturation_]
    if py_random is None:
        random.shuffle(functions)
    else:
        py_random.shuffle(functions)
    gs = grayscale(image)
    gs_mean = gs.mean()
    for f in functions:
        f(data_rng, image, gs, gs_mean, 0.4)
    lighting_(data_rng, image, 0.1, eig_val, eig_vec)
