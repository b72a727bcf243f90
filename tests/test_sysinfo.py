"""Hardware discovery (sys_detect counterpart)."""

from jampack_tpu.runtime import sysinfo


def test_core_count_positive():
    assert sysinfo.core_count() >= 1


def test_available_memory_positive():
    assert sysinfo.available_memory() > 0


def test_device_memory_positive():
    assert sysinfo.device_memory() > 0


def test_fits_on_device_consistent():
    # tests run on the CPU backend: no accelerator -> never "fits"
    assert sysinfo.fits_on_device(8 << 20) in (True, False)
