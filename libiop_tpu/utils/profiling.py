"""Nested block profiler — role of libff's enter_block/leave_block timing
tree (SURVEY.md §5: the reference's primary observability artifact)."""
from __future__ import annotations

import contextlib
import time
from typing import List


class BlockProfiler:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._stack: List[tuple] = []
        self.records: List[tuple] = []  # (depth, name, seconds)

    @contextlib.contextmanager
    def block(self, name: str):
        if not self.enabled:
            yield
            return
        depth = len(self._stack)
        t0 = time.time()
        self._stack.append((name, t0))
        try:
            yield
        finally:
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
