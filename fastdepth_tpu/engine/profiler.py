"""Profiling utilities.

The reference's only timing is wall-clock ``time.time()`` pairs with the
CUDA syncs commented out (reference main.py:69-77 — async-skewed;
SURVEY.md §5).  Here: correct scalar-fetch-synced wall timing lives in
engine/benchmark.py, and this module adds ``jax.profiler`` device traces
(viewable in TensorBoard/Perfetto) around arbitrary callables.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(out_dir: Optional[str]) -> Iterator[None]:
    """Device trace context; no-op when out_dir is falsy."""
    if not out_dir:
        yield
        return
    import jax

    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
