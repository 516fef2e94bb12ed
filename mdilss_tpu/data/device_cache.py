"""Device-resident dataset cache: upload once, sample on-device for 150 epochs.

The reference re-reads and re-decodes every image from disk every epoch —
150 passes over the dataset through the host (train_RAPFT_step1.py:136-155).
On TPU the economics invert: the full training sets fit in HBM as uint8
(Cityscapes train 2975 x 512x1024 x 4 B/px (RGB image + label) ~= 6.2 GB;
BDD 7000 imgs ~= 14.7 GB, over a v5e's 16 GB so it streams), the model is
2M params, and host->device bandwidth — not compute —
bounds the streamed pipeline. So the cache uploads each (image, label) pair
ONCE (decoded through the normal loader, assembled on the host, shipped as
one transfer so device peak is exactly the dataset size) and every later
batch is a device-side gather: per-step H2D drops from ~12.6 MB to the
batch indices.

Epoch semantics are identical to the streaming Loader by construction: both
batch through `loader.batch_indices` (same permutation, drop-last and
padding rule), so a cached run reproduces the streamed run's batch sequence
exactly (tests/test_device_cache.py).
"""
from __future__ import annotations

import numpy as np

from .loader import Loader, batch_indices


def cache_bytes(n: int, height: int, width: int) -> int:
    """uint8 images [N,H,W,3] + labels [N,H,W]."""
    return n * height * width * 4


def _cache_drop_last(loader: Loader, shuffle: bool) -> bool:
    """drop_last for a cache epoch: an explicit Loader override wins (the
    cache must reproduce the wrapped loader's batching rule exactly);
    otherwise derive from the per-call shuffle flag the same way the Loader
    constructor derives its default (train: drop, eval: pad+mask)."""
    return loader.drop_last if loader._drop_last_explicit else shuffle


class DeviceCache:
    """Whole-dataset uint8 arrays on device + deterministic epoch batching.

    With `mesh`, the dataset is SHARDED over the mesh's 'data' axis (per-chip
    cache memory divides by the data-parallel degree — BDD's ~14.7 GB fits a
    4-chip v5e slice 4-way sharded where it cannot fit one chip) and the
    per-batch gather runs as one jitted sharded op: XLA routes the few rows
    each chip needs over ICI (~12.6 MB/step at 512x1024 bs6, negligible next
    to the step), and the batch comes out batch-sharded ready for the train
    step. Without a mesh (or a 1-device mesh) everything stays on the default
    device as before.
    """

    def __init__(self, loader: Loader, mesh=None):
        import jax

        self.loader = loader
        self.batch_size = loader.batch_size
        n = len(loader.source)
        h, w = loader.height, loader.width
        # decode through the loader's own pipeline (native decoder + threads)
        # into host buffers, then ship in ONE transfer each: device-side peak
        # is the dataset size, not 2x (chunked device_puts would coexist with
        # the concatenated copy). Sharding pad rows are allocated up front —
        # a post-hoc np.concatenate would transiently double HOST memory for
        # exactly the datasets this cache exists to make fit.
        sharded = mesh is not None and mesh.devices.size > 1
        data = mesh.shape["data"] if sharded else 1
        pad = (-n) % data  # N must divide the data axis for sharding
        images = np.empty((n + pad, h, w, 3), np.uint8)
        labels = np.empty((n + pad, h, w), np.uint8)
        if pad:
            images[n:] = 0
            labels[n:] = 0
        order_loader = Loader(
            loader.source, batch_size=loader.batch_size, height=h, width=w,
            shuffle=False, drop_last=False, num_threads=loader.num_threads,
        )
        pos = 0
        for imgs, lbls, valid in order_loader:
            k = int(np.sum(valid))
            images[pos : pos + k] = imgs[:k]
            labels[pos : pos + k] = lbls[:k]
            pos += k
        assert pos == n, (pos, n)
        self._gather = None
        if sharded:
            import jax.numpy as jnp
            from jax.sharding import NamedSharding, PartitionSpec as P

            row_sh = NamedSharding(mesh, P("data"))
            self.images = jax.device_put(images, row_sh)
            self.labels = jax.device_put(labels, row_sh)
            # batch gather: rows live on whichever shard holds them; XLA
            # moves each to the chip that owns that batch position over ICI
            out_sh = NamedSharding(mesh, P("data", "spatial"))
            self._gather = jax.jit(
                lambda im, lb, idx: (jnp.take(im, idx, axis=0), jnp.take(lb, idx, axis=0)),
                out_shardings=(out_sh, out_sh),
            )
        else:
            self.images = jax.device_put(images)
            self.labels = jax.device_put(labels)
        self.n = n

    def epoch_batches(self, epoch: int, *, shuffle: bool = True):
        """Yields (images, labels, valid) device batches; same order and
        drop-last/padding semantics as the streaming Loader at the same
        (seed, epoch) — both sides use loader.batch_indices."""
        for idx, valid in batch_indices(
            self.n, self.batch_size, seed=self.loader.seed, epoch=epoch,
            shuffle=shuffle, drop_last=_cache_drop_last(self.loader, shuffle),
        ):
            imgs, lbls = self.take(idx)
            yield imgs, lbls, valid

    def take(self, idx: np.ndarray):
        """Device-side gather of one batch (sharded when mesh-backed)."""
        import jax.numpy as jnp

        di = jnp.asarray(idx, jnp.int32)
        if self._gather is not None:
            return self._gather(self.images, self.labels, di)
        # single-device: one jitted program (module-level _gather), not two
        # eager jnp.takes — every eager op is its own device launch
        return _gather(self.images, self.labels, di)


def _lazy_jit(fn):
    """jax.jit applied on first CALL, not at module import: this module is
    imported by non-device code paths (fit heuristics, CLI arg plumbing) and
    must stay import-light like every other jax use in the file."""
    import functools

    cache = []

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        if not cache:
            import jax

            cache.append(jax.jit(fn))
        return cache[0](*a, **kw)

    return wrapper


@_lazy_jit
def _gather(images, labels, di):
    import jax.numpy as jnp

    return jnp.take(images, di, axis=0), jnp.take(labels, di, axis=0)


@_lazy_jit
def _gather_scatter(images, labels, di, pos, up_imgs, up_lbls):
    import jax.numpy as jnp

    # uncached positions gather a clipped dummy row, then get overwritten
    imgs = jnp.take(images, di, axis=0).at[pos].set(up_imgs)
    lbls = jnp.take(labels, di, axis=0).at[pos].set(up_lbls)
    return imgs, lbls


def should_cache(source, *, height: int, width: int, budget_bytes: int) -> bool:
    """Fit heuristic: cache when the uint8 dataset fits in `budget_bytes`
    (applies to synthetic sources too, so device_cache='off' -> budget 0
    genuinely disables caching everywhere)."""
    return cache_bytes(len(source), height, width) <= budget_bytes


def plan_cache(source, *, height: int, width: int, budget_bytes: int,
               batch_size: int = 1):
    """Cache-mode decision: ("full", n) when the whole uint8 dataset fits in
    `budget_bytes`; ("hybrid", k) caching the k = budget // row_bytes rows
    that fit (IDD's ~14.7 GB vs a one-v5e ~8 GB budget lands here); otherwise
    ("stream", 0). Hybrid needs at least one batch's worth of cached rows to
    be worth the per-batch scatter."""
    n = len(source)
    row = height * width * 4
    if n * row <= budget_bytes:
        return "full", n
    k = int(budget_bytes // row)
    if k >= max(batch_size, 1):
        return "hybrid", min(k, n)
    return "stream", 0


class HybridCache:
    """Partial device cache for datasets that exceed the device budget.

    Rows [0, max_rows) live on device as uint8 (decoded once, like
    DeviceCache); rows >= max_rows decode host-side each epoch in a
    background thread and are scattered into the gathered batch on device.
    Epoch batch order/content is IDENTICAL to the streaming Loader and to a
    full DeviceCache at the same (seed, epoch) — all three batch through
    `loader.batch_indices` — so switching cache modes never changes the
    training trajectory (tests/test_device_cache.py).

    Per-step H2D drops from a full batch to only the batch's uncached rows
    (expected fraction 1 - max_rows/n); the device-side combine is one gather
    plus one scatter of <= batch_size rows. The combine compiles at most
    batch_size+1 trivial variants (one per uncached-row count). Single-device
    only: on a mesh the full dataset shards across the data axis and fits
    (DeviceCache(mesh=...)), which is strictly better than hybrid.
    """

    def __init__(self, loader: Loader, max_rows: int):
        import jax

        assert 0 < max_rows < len(loader.source), (max_rows, len(loader.source))
        self.loader = loader
        self.batch_size = loader.batch_size
        self.n = len(loader.source)
        self.k = int(max_rows)
        h, w = loader.height, loader.width
        images = np.empty((self.k, h, w, 3), np.uint8)
        labels = np.empty((self.k, h, w), np.uint8)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(loader.num_threads) as pool:
            for i, (img, lbl) in enumerate(pool.map(loader._decode, range(self.k))):
                images[i] = img
                labels[i] = lbl
        self.images = jax.device_put(images)
        self.labels = jax.device_put(labels)

    def epoch_batches(self, epoch: int, *, shuffle: bool = True):
        """Yields (images, labels, valid) device batches; order identical to
        the streaming Loader at the same (seed, epoch). Host decode of the
        uncached rows runs in a producer thread (bounded queue) so it overlaps
        the device compute of preceding batches."""
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        import jax

        plan = list(batch_indices(
            self.n, self.batch_size, seed=self.loader.seed, epoch=epoch,
            shuffle=shuffle, drop_last=_cache_drop_last(self.loader, shuffle),
        ))
        q: queue.Queue = queue.Queue(maxsize=3)
        stop = threading.Event()

        def put(item):
            # stop-aware put: an abandoned generator (multitask pulls only
            # min-loader iters per epoch) sets `stop` in its finally but never
            # drains the queue again — a plain q.put would pin this thread
            # (and the device-resident batches it queued) forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return
                except queue.Full:
                    continue

        def produce():
            # exceptions must reach the consumer (a swallowed decode error
            # would leave q.get() blocked forever); sentinel = (None, exc?)
            try:
                with ThreadPoolExecutor(self.loader.num_threads) as pool:
                    for idx, valid in plan:
                        if stop.is_set():
                            return
                        pos = np.where(idx >= self.k)[0]
                        if len(pos):
                            pairs = list(pool.map(self.loader._decode, idx[pos]))
                            up_imgs = np.stack([p[0] for p in pairs])
                            up_lbls = np.stack([p[1] for p in pairs])
                            # async H2D: rides under the device compute of the
                            # batches already queued ahead of this one
                            up = (jax.device_put(up_imgs), jax.device_put(up_lbls))
                        else:
                            up = None
                        put((idx, valid, pos, up))
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
                idx, valid, pos, up = item
                yield (*self._combine(idx, pos, up), valid)
        finally:
            stop.set()

    def _combine(self, idx: np.ndarray, pos: np.ndarray, up):
        # ONE jitted dispatch per batch (per-op eager dispatch is expensive
        # on remote-tunnel backends); retraces once per distinct
        # uncached-row count, i.e. <= batch_size+1 trivial programs total
        di = np.minimum(idx, self.k - 1).astype(np.int32)
        if len(pos):
            return _gather_scatter(self.images, self.labels, di,
                                   pos.astype(np.int32), up[0], up[1])
        return _gather(self.images, self.labels, di)
