"""jampack-tpu: a TPU-native lossless BWT block codec.

Format-compatible with Jampack v0.80 archives (see SURVEY.md for the
structural analysis of the reference); compute path designed for JAX/XLA/
Pallas with a host C++ runtime for the inherently serial encoder loops.
"""

__version__ = "0.1.0"

import os as _os


def enable_compile_cache(path: str = None) -> None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    The fused device-decode graphs take minutes to compile on a slow host
    CPU but are byte-stable across processes; caching makes every process
    after the first (tests, bench, the driver's multi-chip dry run) start
    warm.  Set JAMPACK_NO_COMPILE_CACHE=1 to opt out."""
    if _os.environ.get("JAMPACK_NO_COMPILE_CACHE"):
        return
    try:
        import sys as _sys

        cache = path or _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "build", "jax_cache",
        )
        _os.makedirs(cache, exist_ok=True)
        # env var so we never force a jax import here (the native-engine CLI
        # path does not need jax at all); applied via config when jax is
        # already loaded
        _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
        _os.environ.setdefault(
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0"
        )
        if "jax" in _sys.modules:
            import jax

            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0
            )
    except Exception:
        pass


enable_compile_cache()
