"""Hierarchical phase profiler (reference plonky2/src/util/timing.rs
TimingTree + timed! macro): nested named scopes with wall-clock durations,
printed as an indented tree."""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import List, Optional


def _phase_trace() -> bool:
    """PLONKY2_TPU_PHASE_TRACE=1: emit a JSON line to stderr as each
    prover phase starts/ends — a killed long-compile run (the multichip
    dryrun's round-4 failure mode) then still leaves evidence of how deep
    it got."""
    import os
    return os.environ.get("PLONKY2_TPU_PHASE_TRACE") == "1"


class _Scope:
    def __init__(self, name: str):
        self.name = name
        self.start = time.perf_counter()
        self.duration: Optional[float] = None
        self.children: List["_Scope"] = []


class TimingTree:
    def __init__(self, root_name: str = "root"):
        self.root = _Scope(root_name)
        self.stack = [self.root]

    @contextmanager
    def scope(self, name: str):
        s = _Scope(name)
        self.stack[-1].children.append(s)
        self.stack.append(s)
        trace = _phase_trace()
        if trace:
            import sys
            print(f'{{"phase_start": "{name}"}}', file=sys.stderr,
                  flush=True)
        try:
            yield
        finally:
            s.duration = time.perf_counter() - s.start
            self.stack.pop()
            if trace:
                import sys
                print(f'{{"phase_end": "{name}", '
                      f'"seconds": {s.duration:.1f}}}',
                      file=sys.stderr, flush=True)

    def timed(self, name: str, fn, *args, **kwargs):
        with self.scope(name):
            return fn(*args, **kwargs)

    def print(self, min_seconds: float = 0.0) -> str:
        self.root.duration = time.perf_counter() - self.root.start
        lines: List[str] = []

        def rec(s: _Scope, depth: int):
            if s.duration is not None and s.duration >= min_seconds:
                lines.append(f"{'  ' * depth}{s.duration:.4f}s {s.name}")
                for c in s.children:
                    rec(c, depth + 1)

        rec(self.root, 0)
        out = "\n".join(lines)
        print(out)
        return out


class NoopTimingTree(TimingTree):
    @contextmanager
    def scope(self, name: str):
        yield

    def print(self, min_seconds: float = 0.0) -> str:
        return ""
