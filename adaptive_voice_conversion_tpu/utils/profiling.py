"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference).

``profile_trace`` wraps a code region in a jax.profiler trace (viewable in
TensorBoard / Perfetto / xprof); ``step_timer`` gives blocking wall-clock
timings of individual dispatches for quick roofline checks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a device+host profiler trace of the enclosed region:

        with profile_trace("prof/"):
            for _ in range(20):
                params, opt, m = step(...)
            jax.block_until_ready(m)

    Works on standard TPU/CPU/GPU backends. Caveat: on tunneled/experimental
    PJRT backends (e.g. the remote 'axon' dev backend) starting a trace can
    wedge compilation — profile on real TPU hosts.
    """
    options = None
    try:
        options = jax.profiler.ProfileOptions()
        options.host_tracer_level = host_tracer_level
    except Exception:
        pass
    if options is not None:
        jax.profiler.start_trace(logdir, profiler_options=options)
    else:
        jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(label: str, result_holder: Optional[dict] = None):
    """Blocking wall-clock timer: synchronizes all devices on exit."""
    t0 = time.time()
    try:
        yield
    finally:
        (jax.device_put(0) + 0).block_until_ready()
        dt = time.time() - t0
        if result_holder is not None:
            result_holder[label] = dt
        else:
            print(f"[{label}] {dt * 1000:.2f} ms")
