"""Profiling — the tracing subsystem the reference lacks (SURVEY.md §5.1).

Wraps ``jax.profiler``: capture Perfetto/XProf traces around any callable or
as a context manager, plus a trace-server starter for live capture from
TensorBoard's profile plugin.

    from vggt_qwen3_tpu.utils.profiling import trace
    with trace("/tmp/profile"):
        step(...)

    python -m vggt_qwen3_tpu.utils.profiling --port 9012   # live server
"""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Iterator


@contextlib.contextmanager
def trace(logdir: str | Path, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a device+host trace into ``logdir`` (view with XProf/Perfetto
    or TensorBoard's profile plugin)."""
    import jax

    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in traces (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def start_server(port: int = 9012):
    """Start the profiler server for on-demand capture."""
    import jax

    return jax.profiler.start_server(port)


def main() -> None:
    import argparse
    import time

    ap = argparse.ArgumentParser(description="Run a profiler trace server.")
    ap.add_argument("--port", type=int, default=9012)
    args = ap.parse_args()
    start_server(args.port)
    print(f"jax.profiler server on :{args.port} — capture via TensorBoard profile plugin. Ctrl-C to stop.")
    while True:
        time.sleep(3600)


if __name__ == "__main__":
    main()
