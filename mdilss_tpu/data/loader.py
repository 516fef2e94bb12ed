"""Host input pipeline: multithreaded decode + prefetch, static-shape batches.

The reference fed each GPU from 4 forked DataLoader workers
(train_RAPFT_step1.py:152-155). Here a thread pool decodes PIL images (PIL
releases the GIL during decode/resize) into pinned numpy batches and a
bounded prefetch queue overlaps host decode with device compute; the device
side (normalize/augment/relabel) lives inside the jitted train step
(transforms.py), so batches cross H2D as uint8.

Static shapes: JAX recompiles on shape change, so the last partial batch of an
epoch is dropped when `drop_last` (default for training; the reference kept
partial batches — a <=0.2% difference in seen samples per epoch). Evaluation
uses drop_last=False with a final padded batch + validity mask.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from .sources import Source
from .transforms import decode_pair


class SyntheticSource:
    """Deterministic random data with the same interface as an indexed Source;
    used by tests and benchmarks (no dataset download in CI)."""

    def __init__(self, num_classes: int, n: int = 64, height: int = 512, width: int = 1024, seed: int = 0):
        self.name = f"synthetic{num_classes}"
        self.num_classes = num_classes
        self._n = n
        self._h, self._w = height, width
        self._seed = seed

    def __len__(self):
        return self._n

    def decode(self, idx: int, height: int, width: int):
        rng = np.random.default_rng(self._seed * 100003 + idx)
        img = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
        lbl = rng.integers(0, self.num_classes, size=(height, width)).astype(np.uint8)
        # sprinkle ignore pixels like real data
        lbl[rng.random((height, width)) < 0.05] = 255
        return img, lbl


class LearnableSource(SyntheticSource):
    """Synthetic data with a LEARNABLE pixel->class mapping (labels are a
    deterministic function of image content), for metric-level convergence
    tests: a correct trainer drives val mIoU well above chance in a few
    epochs, while a wrong loss / wrong freeze mask / broken label remap
    keeps it at noise level. SyntheticSource's labels are pure noise and can
    only test mechanics, not learning.

    Images are spatially-coherent color patches (low-res random grid,
    nearest-upsampled); the label of a pixel is its red-channel value
    quantized into num_classes-1 bins (the last class stays the ignore
    class, like real data), plus a 5% sprinkle of ignore pixels.
    """

    def decode(self, idx: int, height: int, width: int):
        rng = np.random.default_rng(self._seed * 100003 + idx)
        gh, gw = max(height // 8, 1), max(width // 8, 1)
        grid = rng.integers(0, 256, size=(gh, gw, 3), dtype=np.uint8)
        img = np.repeat(np.repeat(grid, height // gh, 0), width // gw, 1)
        img = img[:height, :width]
        n_real = self.num_classes - 1
        lbl = (img[:, :, 0].astype(np.int32) * n_real // 256).astype(np.uint8)
        lbl[rng.random((height, width)) < 0.05] = 255
        return img, lbl


def device_prefetch(iterator, *, depth: int = 2, put=None):
    """Overlap host->device transfer with device compute.

    Wraps a batch iterator, issuing `put` (default jax.device_put of every
    array element) for up to `depth` batches ahead before yielding the
    current one. JAX transfers are asynchronous, so the copy of batch i+1
    rides alongside the compute of batch i instead of serializing in front
    of it — on a remote-tunnel backend the transfer is the pipeline
    bottleneck (~12.6 MB/batch at 512x1024/bs6), so this matters far more
    than on a local PCIe link.
    """
    import collections

    import jax
    import numpy as np

    if put is None:
        def put(item):
            return tuple(
                jax.device_put(x) if isinstance(x, np.ndarray) else x for x in item
            )

    q = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(depth):
            q.append(put(next(it)))
    except StopIteration:
        pass
    while q:
        out = q.popleft()
        try:
            q.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def batch_indices(n: int, batch_size: int, *, seed: int, epoch: int,
                  shuffle: bool, drop_last: bool):
    """THE batching rule (one place): per-epoch `default_rng(seed + epoch)`
    permutation, drop-last for training, zero-index padding + valid mask for
    the final eval batch. Shared by the streaming Loader and the device
    cache so cached runs reproduce streamed batch sequences exactly.

    Yields (idx [batch_size] int64, valid [batch_size] bool).
    """
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    nb = n // batch_size if drop_last else -(-n // batch_size)
    for b in range(nb):
        idx = order[b * batch_size : (b + 1) * batch_size]
        valid = np.ones(batch_size, bool)
        if len(idx) < batch_size:
            valid[len(idx):] = False
            idx = np.concatenate([idx, np.zeros(batch_size - len(idx), np.int64)])
        yield idx, valid


class Loader:
    """Iterable over uint8 (images [N,H,W,3], labels [N,H,W]) numpy batches.

    Deterministic per-epoch shuffling: epoch e uses rng(seed + e), so resume
    reproduces the exact batch order of the reference's epoch loop.
    """

    def __init__(
        self,
        source: Source | SyntheticSource,
        *,
        batch_size: int,
        height: int = 512,
        width: int = 1024,
        shuffle: bool = False,
        drop_last: bool | None = None,
        num_threads: int = 8,
        prefetch: int = 4,
        seed: int = 0,
    ):
        self.source = source
        self.batch_size = batch_size
        self.height = height
        self.width = width
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        # device caches re-derive drop_last from their per-call shuffle flag
        # UNLESS the caller pinned it here explicitly (cached-vs-streamed
        # batch parity must hold for that configuration too)
        self._drop_last_explicit = drop_last is not None
        # 0 is valid reference usage (torch DataLoader num_workers=0 =
        # in-process decode); here it still means "minimal": one pool thread
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.source)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _decode(self, idx: int):
        if isinstance(self.source, SyntheticSource):
            return self.source.decode(idx, self.height, self.width)
        img_path, lbl_path = self.source.pairs[idx]
        return decode_pair(
            img_path, lbl_path,
            height=self.height, width=self.width,
            label_map=getattr(self.source, "label_map", None),
        )

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yields (images, labels, valid_mask). valid_mask is all-ones except
        for a padded final batch (drop_last=False)."""
        plan = list(batch_indices(
            len(self.source), self.batch_size, seed=self.seed, epoch=self.epoch,
            shuffle=self.shuffle, drop_last=self.drop_last,
        ))
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item):
            # stop-aware put: if the consumer abandons the generator mid-epoch
            # (multitask pulls min-loader iters), a plain q.put on the full
            # queue would block this thread forever — the generator's finally
            # sets `stop` but nothing ever drains the queue again
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return
                except queue.Full:
                    continue

        def produce():
            # a producer-side exception must reach the consumer: swallowing it
            # here would leave q.get() blocked forever (decode errors, bad
            # paths). The sentinel is (None, exc_or_None).
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for idxs, valid in plan:
                        if stop.is_set():
                            return
                        pairs = list(pool.map(self._decode, idxs))
                        images = np.stack([p[0] for p in pairs])
                        labels = np.stack([p[1] for p in pairs])
                        put((images, labels, valid))
                put((None, None))
            except BaseException as e:  # noqa: BLE001
                put((None, e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if len(item) == 2 and item[0] is None:
                    if item[1] is not None:
                        raise item[1]
                    break
                yield item
        finally:
            stop.set()
