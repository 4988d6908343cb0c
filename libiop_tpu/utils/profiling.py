"""Nested block profiler — role of libff's enter_block/leave_block timing
tree (SURVEY.md §5: the reference's primary observability artifact)."""
from __future__ import annotations

import contextlib
import os
import time
from typing import List


class BlockProfiler:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        #: sync mode: wait for ALL outstanding device work at block exit so
        #: each block's seconds are its own compute, not whatever async
        #: dispatches happened to drain inside it.  Diagnostic only (kills
        #: dispatch/compute overlap); enable via LIBIOP_TPU_PROFILE_SYNC=1.
        self.sync = os.environ.get("LIBIOP_TPU_PROFILE_SYNC") == "1"
        self._stack: List[tuple] = []
        self.records: List[tuple] = []  # (depth, name, seconds)

    def _maybe_sync(self):
        if self.sync:
            try:
                import jax.numpy as jnp
                # devices execute enqueued programs in order: blocking on a
                # freshly enqueued no-op drains everything before it
                (jnp.zeros((), jnp.uint32) + 1).block_until_ready()
            except Exception:
                pass

    @contextlib.contextmanager
    def block(self, name: str):
        if not self.enabled:
            yield
            return
        self._maybe_sync()
        depth = len(self._stack)
        t0 = time.time()
        self._stack.append((name, t0))
        try:
            yield
        finally:
            self._maybe_sync()
            self._stack.pop()
            self.records.append((depth, name, time.time() - t0))

    def enter_block(self, name: str):
        self._stack.append((name, time.time()))

    def leave_block(self, name: str):
        nm, t0 = self._stack.pop()
        assert nm == name, (nm, name)
        self.records.append((len(self._stack), nm, time.time() - t0))

    def print_report(self):
        # records complete in leave order; print as an indented tree
        for depth, name, secs in self.records:
            print(f"{'  ' * depth}[{secs:8.3f}s] {name}")

    def report(self) -> list:
        """[(depth, name, seconds)] — JSON-serializable timing tree."""
        return [(d, n, round(s, 4)) for d, n, s in self.records]


PROFILER = BlockProfiler()
