"""Profiling / tracing utilities.

The reference's observability is wall-clock log timers
(``post_processor_rotated_boxes.py:74-82``, dataset-load timers).  The
TPU-native equivalents here:

* ``trace(logdir)``: a ``jax.profiler`` trace context (viewable in
  TensorBoard / XProf) capturing XLA execution on device,
* ``stage_timer``: a wall-clock stage timer that *forces completion* of the
  traced computation before stopping the clock — ``block_until_ready`` can
  be a no-op on tunneled backends, so timing materializes outputs,
* ``Timings``: a running per-stage accumulator for pipeline reports.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("jax profiler trace written to %s", logdir)


def force(tree):
    """Materialize every array in a pytree on the host (true barrier)."""
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


class Timings:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result_ref: Optional[list] = None):
        t0 = time.perf_counter()
        yield
        if result_ref:
            result_ref[0] = force(result_ref[0])
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            avg = 1000 * self.totals[name] / max(self.counts[name], 1)
            lines.append(f"{name}: {avg:.1f} ms avg over {self.counts[name]}")
        return "\n".join(lines)


@contextlib.contextmanager
def stage_timer(name: str, level=logging.INFO):
    t0 = time.perf_counter()
    yield
    logger.log(level, "%s: %.1f ms", name, 1000 * (time.perf_counter() - t0))
