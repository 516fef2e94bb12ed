"""Profiler tracing: jax.profiler device traces around training steps.

The reference's only observability was wall-clock accumulation printed every
50 batches ("Avg time/img", train_RAPFT_step1.py:295-317). Here a window of
train steps is captured as a real profiler trace (XLA ops, fusion boundaries,
HBM traffic) viewable in TensorBoard's profile plugin / Perfetto.
"""
from __future__ import annotations

import jax


class StepTracer:
    """Traces steps [start, start+n) of the first profiled epoch.

    `sync` (optional) is called before stop_trace to block until the
    asynchronously-dispatched traced steps have actually executed on device —
    without it the trace can close while the device is still running them
    (train dispatch is async; see bench.py's synchronization note). The
    trainer passes a block_until_ready over its train state.
    """

    def __init__(self, logdir: str | None, *, start: int = 2, n: int = 8, sync=None):
        self.logdir = logdir
        self.start = start
        self.n = n
        self.sync = sync
        self._step = 0
        self._active = False
        self._done = logdir is None

    def tick(self) -> None:
        """Call once per train step (before launching it)."""
        if self._done:
            return
        if self._step == self.start:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._step == self.start + self.n:
            self.stop()
        self._step += 1

    def stop(self) -> None:
        if self._active:
            if self.sync is not None:
                self.sync()
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.logdir}")
        self._done = True
