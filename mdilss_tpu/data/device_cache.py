"""Device-resident dataset cache: upload once, sample on-device for 150 epochs.

The reference re-reads and re-decodes every image from disk every epoch —
150 passes over the dataset through the host (train_RAPFT_step1.py:136-155).
On TPU the economics invert: the full training sets fit in HBM as uint8
(Cityscapes train 2975 x 512x1024 x 4 B/px ~= 4.7 GB; BDD ~11 GB of a v5e's
16 GB), the model is 2M params, and host->device bandwidth — not compute —
bounds the streamed pipeline. So the cache uploads each (image, label) pair
ONCE (streamed through the normal loader, overlapped with the first epoch's
compute) and every later batch is a device-side gather: per-step H2D drops
from ~12.6 MB to the batch indices.

Epoch semantics are identical to the streaming Loader: the same
`default_rng(seed + epoch)` permutation, same drop-last batching — a cached
run reproduces the streamed run's batch sequence exactly (tests).
"""
from __future__ import annotations

import numpy as np

from .loader import Loader, SyntheticSource


def cache_bytes(n: int, height: int, width: int) -> int:
    """uint8 images [N,H,W,3] + labels [N,H,W]."""
    return n * height * width * 4


class DeviceCache:
    """Whole-dataset uint8 arrays on device + deterministic epoch batching."""

    def __init__(self, loader: Loader):
        import jax
        import jax.numpy as jnp

        self.loader = loader
        self.batch_size = loader.batch_size
        n = len(loader.source)
        h, w = loader.height, loader.width
        # decode through the loader's own pipeline (native decoder + threads),
        # in source order, then ship in chunks to bound host memory
        order_loader = Loader(
            loader.source, batch_size=loader.batch_size, height=h, width=w,
            shuffle=False, drop_last=False, num_threads=loader.num_threads,
        )
        img_chunks, lbl_chunks = [], []
        for imgs, lbls, valid in order_loader:
            k = int(np.sum(valid))
            img_chunks.append(jax.device_put(imgs[:k]))
            lbl_chunks.append(jax.device_put(lbls[:k]))
        self.images = jnp.concatenate(img_chunks, axis=0)
        self.labels = jnp.concatenate(lbl_chunks, axis=0)
        assert self.images.shape[0] == n, (self.images.shape, n)
        self.n = n

    def epoch_batches(self, epoch: int, *, shuffle: bool = True):
        """Yields (images, labels, valid) device batches; same order and
        drop-last/padding semantics as the streaming Loader at the same
        (seed, epoch)."""
        order = np.arange(self.n)
        if shuffle:
            np.random.default_rng(self.loader.seed + epoch).shuffle(order)
        nb = self.n // self.batch_size if shuffle else -(-self.n // self.batch_size)
        for b in range(nb):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            valid = np.ones(self.batch_size, bool)
            if len(idx) < self.batch_size:  # padded final batch (eval)
                valid[len(idx):] = False
                idx = np.concatenate([idx, np.zeros(self.batch_size - len(idx), np.int64)])
            imgs, lbls = self.take(idx)
            yield imgs, lbls, valid

    def take(self, idx: np.ndarray):
        """Device-side gather of one batch."""
        import jax.numpy as jnp

        di = jnp.asarray(idx, jnp.int32)
        return jnp.take(self.images, di, axis=0), jnp.take(self.labels, di, axis=0)


def should_cache(source, *, height: int, width: int, budget_bytes: int) -> bool:
    """Fit heuristic: cache when the uint8 dataset fits in `budget_bytes`."""
    if isinstance(source, SyntheticSource):
        return True  # tiny by construction in tests/benches
    return cache_bytes(len(source), height, width) <= budget_bytes
