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


WARN_GB = 8.0  # padded-stack size past which HBM fit is doubtful (v5e: 16G)


class ImageCache:
    """Padded uint8 stack of every image in a dataset split."""

    def __init__(self, images_u8, dims):
        self.images = images_u8          # (N, Hmax, Wmax, 3) uint8
        self.dims = dims                 # (N, 2) int32 (h, w)
        self.nbytes = images_u8.nbytes   # survives the to_device() drop

    @classmethod
    def build(cls, dataset):
        """Read every image of `dataset` once (its sampler's own loader,
        so file layout/BGR order match the host path exactly).

        The stack is allocated up front from the annotation metadata's
        (height, width) records when available, so the build holds ONE
        decoded image at a time — not the whole split twice (decoded list
        + padded stack). Falls back to a two-pass read when metadata dims
        are missing, or when a decoded image exceeds the metadata extent
        (EXIF rotation, stale records). Decoded dims always win."""
        n = len(dataset)
        dims = np.zeros((n, 2), np.int32)
        meta = _metadata_dims(dataset)
        if meta is not None:
            hmax, wmax = int(meta[:, 0].max()), int(meta[:, 1].max())
            stack = np.zeros((n, hmax, wmax, 3), np.uint8)
            warned = False
            for i in range(n):
                img = dataset.load_raw_image(i)
                h, w = img.shape[0], img.shape[1]
                if h > hmax or w > wmax:
                    print("device_cache: image {} decodes {}x{}, past the "
                          "metadata extent {}x{}; rebuilding via the "
                          "two-pass path".format(i, h, w, hmax, wmax))
                    return cls._build_two_pass(dataset)
                if not warned and (h, w) != (int(meta[i, 0]),
                                             int(meta[i, 1])):
                    print("device_cache: image {} is {}x{} on disk but "
                          "the annotations say {}x{}; using decoded dims"
                          .format(i, h, w, int(meta[i, 0]),
                                  int(meta[i, 1])))
                    warned = True
                dims[i] = h, w
                stack[i, :h, :w] = img
            return cls(stack, dims)
        return cls._build_two_pass(dataset)

    @classmethod
    def _build_two_pass(cls, dataset):
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
        for i in range(n):
            stack[i, :raws[i].shape[0], :raws[i].shape[1]] = raws[i]
            raws[i] = None  # free as we go; peak ~1x instead of 2x
        return cls(stack, dims)

    def to_device(self, mesh=None, shard=False):
        """Place the stack on device. Returns the device array; the host
        copy is DROPPED (self.images becomes None — `nbytes`/`dims` stay
        valid).

        shard=False: replicated over `mesh` (every chip holds all rows —
        simple, but caps the cache at one chip's HBM).
        shard=True: rows partitioned over the mesh's 'data' axis (chip d
        holds rows [d*rps, (d+1)*rps) of the row-padded stack), so the
        aggregate cache scales with the pod instead of replicating. Each
        shard ships straight from a view of the host stack (no padded
        host copy). The row gather then runs under shard_map
        (device_aug.model_input cache_mesh=...), and the LOADER must
        route batch slot-block s to shard s's rows — `self.shard_ranges`
        (set here) is the per-shard (lo, hi) real-row contract for
        DataLoader(shard_ranges=...)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec
        n, h, w = self.images.shape[:3]
        if shard:
            if mesh is None:
                raise ValueError("shard=True needs a mesh")
            d = mesh.shape.get("data", 1)
            if n < d:
                raise ValueError(
                    "--device_cache_shard: dataset ({} images) is smaller "
                    "than the data mesh ({} devices)".format(n, d))
            rps = -(-n // d)  # ceil: rows per shard
            _warn_if_large(n, h, w, shards=d)
            self.shard_rows = rps
            self.shard_ranges = [(min(s * rps, n), min((s + 1) * rps, n))
                                 for s in range(d)]
            gshape = (rps * d,) + self.images.shape[1:]
            sharding = NamedSharding(mesh, PartitionSpec("data"))
            # per-device placement from host VIEWS — the padded global
            # stack is never materialized on host (only the tail shard
            # needs a small zero-padded copy)
            tail = None
            devs, shards = [], []
            for dev, idx in sharding.addressable_devices_indices_map(
                    gshape).items():
                lo, hi, _ = idx[0].indices(gshape[0])
                if hi <= n:
                    host = self.images[lo:hi]
                elif lo >= n:
                    # fully-empty shard: share one all-zero buffer (never
                    # the partial shard's, which carries real image rows)
                    if tail is None:
                        tail = np.zeros((hi - lo,) + gshape[1:], np.uint8)
                    host = tail
                else:
                    # the (single) partial shard: fresh zero-padded copy
                    host = np.zeros((hi - lo,) + gshape[1:], np.uint8)
                    host[:n - lo] = self.images[lo:n]
                devs.append(dev)
                shards.append(jax.device_put(host, dev))
            out = jax.make_array_from_single_device_arrays(
                gshape, sharding, shards)
        elif mesh is not None:
            _warn_if_large(n, h, w)
            out = jax.device_put(self.images,
                                 NamedSharding(mesh, PartitionSpec()))
        else:
            _warn_if_large(n, h, w)
            out = jax.device_put(self.images)
        self.images = None
        return out


def _metadata_dims(dataset):
    """(N, 2) (h, w) from the dataset's annotation records, or None."""
    coco = getattr(dataset, "coco", None)
    images = getattr(dataset, "images", None)
    if coco is None or images is None:
        return None
    try:
        infos = coco.loadImgs(ids=list(images))
        return np.asarray([[int(i["height"]), int(i["width"])]
                           for i in infos], np.int32)
    except (KeyError, TypeError):
        return None


def _warn_if_large(n, hmax, wmax, shards=1):
    gb = n * hmax * wmax * 3 / 1e9 / shards
    if gb > WARN_GB:
        what = ("per-shard slice" if shards > 1 else "padded stack")
        print("WARNING: device_cache {} is {:.1f} GB "
              "({} x {} x {} x 3 uint8 over {} shard(s)) — likely too "
              "large next to model + optimizer + activations; consider "
              "dropping --device_cache".format(
                  what, gb, n, hmax, wmax, shards))
