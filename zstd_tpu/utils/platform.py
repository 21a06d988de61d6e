"""Platform selection helpers.

The deployment image's sitecustomize imports jax at interpreter start with
the axon (tunneled TPU) backend pre-registered, which makes JAX_PLATFORMS
env overrides ineffective. These helpers switch backends through jax.config,
which still works post-import as long as no backend has been used yet.
"""

import os


_cache_enabled = False


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — the tunnel's remote compiles cost
    ~a minute per shape, so caching across processes matters. Called by
    every device-pipeline entry point (idempotent); ZSTD_TPU_NO_CACHE=1
    disables it."""
    global _cache_enabled
    if _cache_enabled or os.environ.get("ZSTD_TPU_NO_CACHE"):
        return
    import jax

    cache = path or os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return  # read-only install dir etc. — caching is best-effort
    _cache_enabled = True


def force_cpu(n_virtual_devices: int = 8) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_virtual_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def tpu_available() -> bool:
    import jax

    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


def use_pallas_kernels() -> bool:
    """Pallas (Mosaic) kernels run on real TPU backends only; the CPU
    backend would need interpret mode (orders of magnitude slower), so the
    XLA formulations remain the CPU path. ZSTD_TPU_NO_PALLAS=1 forces the
    XLA path on TPU too (A/B benchmarking, Mosaic-regression escape hatch).
    """
    if os.environ.get("ZSTD_TPU_NO_PALLAS"):
        return False
    return tpu_available()
