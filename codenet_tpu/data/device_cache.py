"""HBM-resident dataset cache: train without per-step image transfer.

TPU-native extension (no reference counterpart — the reference's GPUs sit
next to the host, ours sits behind a thin tunnel where shipping a warped
256^2 uint8 batch costs ~100x the device step). The raw images of a
small/medium dataset (Pascal VOC train2007+2012 at full res is ~2.8 GB
uint8 — a fraction of one chip's HBM) are padded to one (N, Hmax, Wmax, 3)
uint8 array and placed on device ONCE. Per step the host ships only:

  img_idx  (B,)      int32  — row into the cache
  warp_ti  (B, 2, 3) f32    — model-input px -> RAW-image px affine
                               (random crop/scale AND horizontal flip are
                               folded into the matrix)

plus the existing 7 floats of color-aug state and the sparse targets.
The jitted train step gathers the rows, applies the affine warp
(data/affine.py warp_affine_jax — bilinear, zero border like
cv2.warpAffine's borderValue=0; the pad region is zero so sampling past
the true extent matches cv2's constant border), then the usual device
color-aug + normalize (device_aug.device_preprocess).

The host sampler keeps drawing the SAME random crop/scale/flip/color
stream as the reference path, so the augmentation distribution is
unchanged; only the interpolation arithmetic moves (cv2's 5-bit
fixed-point bilinear -> f32), a <=1 LSB pixel difference
(tests/test_device_cache.py pins it).
"""

from __future__ import annotations

import numpy as np


def flip_compose(trans_inv, width):
    """Fold a horizontal flip into an output-px -> raw-px affine.

    The sampler's host path flips the pixels first (img[:, ::-1]) and
    computes the warp against the flipped frame; `trans_inv` therefore
    lands in flipped coordinates x_f. The cached image is unflipped, so
    compose with x_raw = (width - 1) - x_f (reference sample/ctdet.py:57
    flip semantics)."""
    out = np.asarray(trans_inv, np.float32).copy()
    out[0, :] = -out[0, :]
    out[0, 2] += width - 1
    return out


class ImageCache:
    """Padded uint8 stack of every image in a dataset split."""

    def __init__(self, images_u8, dims):
        self.images = images_u8          # (N, Hmax, Wmax, 3) uint8
        self.dims = dims                 # (N, 2) int32 (h, w)

    @property
    def nbytes(self):
        return self.images.nbytes

    @classmethod
    def build(cls, dataset):
        """Read every image of `dataset` once (its sampler's own loader,
        so file layout/BGR order match the host path exactly)."""
        n = len(dataset)
        dims = np.zeros((n, 2), np.int32)
        raws = []
        for i in range(n):
            img = dataset.load_raw_image(i)
            dims[i] = img.shape[0], img.shape[1]
            raws.append(img)
        hmax = int(dims[:, 0].max())
        wmax = int(dims[:, 1].max())
        stack = np.zeros((n, hmax, wmax, 3), np.uint8)
        for i, img in enumerate(raws):
            stack[i, :img.shape[0], :img.shape[1]] = img
        return cls(stack, dims)

    def to_device(self, mesh=None):
        """Place the stack on device, replicated over `mesh` if given.
        Returns the device array (host copy is then droppable)."""
        import jax
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            return jax.device_put(self.images,
                                  NamedSharding(mesh, PartitionSpec()))
        return jax.device_put(self.images)
