"""Tracing / profiling hooks (SURVEY.md §5).

Host side: `vprint` mirrors the reference's compile-time `vprintln!` macro
(lib.rs:24-33) as an env-gated trace (ZSTD_TPU_VERBOSE=1). Device side:
`scope` wraps jax.profiler.TraceAnnotation so every kernel shows up named in
XProf/Perfetto captures; `profile_to` runs a callable under a profiler trace
directory for offline inspection.
"""

import contextlib
import os
import sys

VERBOSE = os.environ.get("ZSTD_TPU_VERBOSE", "") not in ("", "0")


def vprint(*args) -> None:
    if VERBOSE:
        print("[zstd-tpu]", *args, file=sys.stderr)


def scope(name: str):
    """Named device-trace scope; no-op cost when profiling is off."""
    try:
        import jax

        return jax.named_scope(name)
    except Exception:
        return contextlib.nullcontext()


@contextlib.contextmanager
def profile_to(trace_dir: str):
    """Capture a jax.profiler trace around a block of work."""
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
