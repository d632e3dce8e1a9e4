"""Oracle (ground-truth substitution) maps for --eval_oracle_* probes.

Reference lib/utils/oracle_utils.py:8-42 uses a numba BFS to fill every
position with the feature of its nearest ground-truth point (L1/BFS metric).
Here: scipy's exact euclidean distance transform with return_indices — the
same nearest-GT fill without numba (not bit-identical on equidistant ties,
which the diagnostic doesn't care about). Output NHWC.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def gen_oracle_map(feat, ind, w, h):
    """feat: (B, maxN, C); ind: (B, maxN) flat y*w+x. Returns (B, h, w, C)."""
    feat = np.asarray(feat)
    ind = np.asarray(ind)
    b, max_objs, c = feat.shape
    out = np.zeros((b, h, w, c), dtype=np.float32)
    for i in range(b):
        seeded = np.zeros((h, w), dtype=bool)
        seed_feat = np.zeros((h, w, c), dtype=np.float32)
        for j in range(max_objs):
            if ind[i][j] > 0:
                x, y = int(ind[i][j] % w), int(ind[i][j] // w)
                seed_feat[y, x] = feat[i][j]
                seeded[y, x] = True
        if not seeded.any():
            continue
        _, (iy, ix) = ndimage.distance_transform_edt(
            ~seeded, return_indices=True)
        out[i] = seed_feat[iy, ix]
    return out
