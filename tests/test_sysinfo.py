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


def test_plan_workers_memory_clamp(monkeypatch):
    """OOM guard: K is clamped so the reference's 6N*K memory model (plus
    the read-ahead window) fits in available memory (jampack.cpp:186-192)."""
    from jampack_tpu import cli
    from jampack_tpu.runtime.pipeline import Options

    monkeypatch.setattr(sysinfo, "core_count", lambda: 16)
    monkeypatch.setattr(sysinfo, "available_memory", lambda: 1 << 30)  # 1 GiB
    # -b1000: one worker needs ~8 GB of buffers -> clamp to 1 despite 16 cores
    opt = Options(blocksize=1000 << 20, threads=0)
    assert cli.plan_workers(opt) == 1
    # 8 MB blocks: 16 workers * 64 MB fits in 1 GiB
    opt = Options(blocksize=8 << 20, threads=0)
    assert cli.plan_workers(opt) == 16
    # explicit -t wins below the memory cap
    opt = Options(blocksize=8 << 20, threads=3)
    assert cli.plan_workers(opt) == 3
    # single-block mode is always one instance
    opt = Options(blocksize=8 << 20, threads=8, multiblock=False)
    assert cli.plan_workers(opt) == 1


def test_plan_workers_default_is_core_count(monkeypatch):
    from jampack_tpu import cli
    from jampack_tpu.runtime.pipeline import Options

    monkeypatch.setattr(sysinfo, "core_count", lambda: 5)
    monkeypatch.setattr(sysinfo, "available_memory", lambda: 64 << 30)
    assert cli.plan_workers(Options(blocksize=8 << 20, threads=0)) == 5
