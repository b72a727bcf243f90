"""Hardware discovery (sys_detect.cpp:20-154 counterpart).

The reference caches core count, available memory, and CUDA presence/VRAM
to clamp thread counts and decide GPU offload.  Here the accelerator side
is jax.devices() and the host side is os/sysconf; HybridEngine gates its
BWT device offload on `fits_on_device` the way the reference gates its
CUDA path on the 80%-of-VRAM test (format.hpp:27, bwt.cpp:102-114).
"""

import os


def core_count() -> int:
    """Host cores (sys_detect.cpp:22-55)."""
    return os.cpu_count() or 1


def available_memory() -> int:
    """Host bytes available (sys_detect.cpp:57-84)."""
    try:
        return os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError, AttributeError):
        return 1 << 32


def tpu_devices():
    """Accelerator inventory; [] when JAX has no accelerator."""
    try:
        import jax

        return [d for d in jax.devices() if d.platform != "cpu"]
    except Exception:
        return []


def device_memory(device=None) -> int:
    """Per-device HBM bytes; falls back to 16 GiB when the platform does
    not expose memory stats (the tunneled device does not)."""
    devs = tpu_devices()
    d = device or (devs[0] if devs else None)
    if d is not None:
        try:
            stats = d.memory_stats()
            if stats and "bytes_limit" in stats:
                return int(stats["bytes_limit"])
        except Exception:
            pass
    return 16 << 30


def fits_on_device(block_size: int, budget: float = 0.8) -> bool:
    """The reference's GPU-offload test: ~6 bytes of working set per input
    byte must fit in `budget` of device memory (format.hpp:27)."""
    if not tpu_devices():
        return False
    return 6 * block_size <= budget * device_memory()
