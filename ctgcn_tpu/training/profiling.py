# coding: utf-8
"""Opt-in ``jax.profiler`` tracing for training loops.

The reference's observability is wall-clock prints (embedding.py:244-257)
plus the ``record_time`` CSV.  Here the same surface exists, and a real
device trace can be captured on top: set ``profile_dir`` in the method's
embedding config block (or the ``CTGCN_TPU_PROFILE_DIR`` env var) and the
trainer records a TensorBoard/XProf trace of the steady-state epochs —
the tool for reading MXU utilization, HBM traffic and fusion layout off
the real chip.

Only steady-state epochs are captured (the first epoch is compile +
warmup, which would drown the trace in compilation events).
"""
from __future__ import annotations

import os

import jax


class EpochTracer:
    """Start/stop ``jax.profiler`` around a steady-state epoch window.

    Usage in an epoch loop::

        tracer = EpochTracer(profile_dir, n_epochs)
        for i in range(n_epochs):
            tracer.before_epoch(i)
            with tracer.annotate(i):
                ... run epoch ...
            tracer.after_epoch(i)
        tracer.close()
    """

    #: first epoch captured (0-indexed; epoch 0 is compile+warmup)
    FIRST = 1
    #: number of epochs captured
    SPAN = 3

    def __init__(self, profile_dir, n_epochs):
        self.dir = profile_dir or os.environ.get("CTGCN_TPU_PROFILE_DIR")
        first = min(self.FIRST, max(n_epochs - 1, 0))
        self.first = first
        self.last = min(first + self.SPAN - 1, n_epochs - 1)
        self.active = False

    def before_epoch(self, i):
        if self.dir and i == self.first and not self.active:
            jax.profiler.start_trace(self.dir)
            self.active = True

    def annotate(self, i):
        if self.active:
            return jax.profiler.StepTraceAnnotation("epoch", step_num=i)
        import contextlib

        return contextlib.nullcontext()

    def after_epoch(self, i):
        if self.active and i >= self.last:
            jax.profiler.stop_trace()
            self.active = False
            print(f"profiler trace written to {self.dir} "
                  f"(epochs {self.first}..{self.last})")

    def close(self):
        if self.active:            # loop shorter than the capture window
            jax.profiler.stop_trace()
            self.active = False
