"""Runtime override of the chained/far-path size caps.

The production caps (framer.GROUP_OUT_CAP, framer.STREAM_WINDOW_CAP,
pallas_execute.WINDOW_VMEM_CAP, ...) are sized for real-TPU VMEM. On the
virtual CPU mesh the Pallas kernels run in interpret mode at minutes per
MiB, so the multichip dryrun and the fast test tier shrink every cap and
exercise the same code paths (group chaining, windowed exec, far-mode HBM
gather) at tiny shapes.

All caps are env-overridable at import (ZSTD_TPU_GROUP_OUT_CAP etc.);
set_caps() additionally patches the already-imported modules so an
in-process caller (pytest, dryrun after other imports) works too.
"""

import os
import sys

# (env var, module, attr) for every cap and each import-time copy of it
_SITES = {
    "group_out": [("ZSTD_TPU_GROUP_OUT_CAP",
                   "zstd_tpu.models.framer", "GROUP_OUT_CAP")],
    "group_seq": [("ZSTD_TPU_GROUP_SEQ_CAP",
                   "zstd_tpu.models.framer", "GROUP_SEQ_CAP")],
    "stream_window": [("ZSTD_TPU_STREAM_WINDOW_CAP",
                       "zstd_tpu.models.framer", "STREAM_WINDOW_CAP"),
                      ("ZSTD_TPU_STREAM_WINDOW_CAP",
                       "zstd_tpu.models.batch_decoder", "STREAM_WINDOW_CAP")],
    "window_vmem": [("ZSTD_TPU_WINDOW_VMEM_CAP",
                     "zstd_tpu.ops.pallas_execute", "WINDOW_VMEM_CAP"),
                    ("ZSTD_TPU_WINDOW_VMEM_CAP",
                     "zstd_tpu.models.batch_decoder", "WINDOW_VMEM_CAP")],
}

TINY = dict(group_out=1 << 15, group_seq=3 * 1024,
            stream_window=1 << 16, window_vmem=1 << 14)


def set_caps(**caps) -> dict:
    """Set caps by name (see TINY for the names); returns the previous
    values for restore_caps(). Patches env (for not-yet-imported modules)
    and every already-imported copy."""
    old = {}
    for name, value in caps.items():
        sites = _SITES[name]
        for env, modname, attr in sites:
            old.setdefault(name, os.environ.get(env))
            os.environ[env] = str(int(value))
            mod = sys.modules.get(modname)
            if mod is not None:
                setattr(mod, attr, int(value))
    return old


def restore_caps(old: dict) -> None:
    for name, env_val in old.items():
        for env, modname, attr in _SITES[name]:
            if env_val is None:
                os.environ.pop(env, None)
                default = {"group_out": (1 << 21) - (1 << 17),
                           "group_seq": 80 * 1024,
                           "stream_window": 1 << 23,
                           "window_vmem": 1 << 22}[name]
            else:
                os.environ[env] = env_val
                default = int(env_val)
            mod = sys.modules.get(modname)
            if mod is not None:
                setattr(mod, attr, default)


class tiny_caps:
    """Context manager applying the TINY cap set (CPU-mesh testing)."""

    def __init__(self, **over):
        self.caps = dict(TINY, **over)

    def __enter__(self):
        self.old = set_caps(**self.caps)
        return self

    def __exit__(self, *exc):
        restore_caps(self.old)
        return False
