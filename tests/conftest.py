import os
import subprocess
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware; must be set before jax is imported.
# Force the virtual CPU mesh: the axon TPU tunnel plugin (sitecustomize)
# overrides jax_platforms via jax.config.update, so setting the env var is
# not enough — counter-update the config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ORACLE = os.path.join(REPO, "build", "jampack_ref")


def _ensure_oracle():
    """Build the reference binary (golden oracle) if it isn't present."""
    if os.path.exists(ORACLE):
        return ORACLE
    os.makedirs(os.path.dirname(ORACLE), exist_ok=True)
    cmd = (
        "g++ -std=c++14 -fopenmp -O2 -w "
        "-D'__min(a,b)=(((a)<(b))?(a):(b))' -D'__max(a,b)=(((a)>(b))?(a):(b))' "
        f"/root/reference/*.cpp -o {ORACLE}"
    )
    subprocess.run(cmd, shell=True, check=True)
    return ORACLE


@pytest.fixture(scope="session")
def oracle():
    path = _ensure_oracle()
    if not os.path.exists(path):
        pytest.skip("reference oracle binary unavailable")

    class Oracle:
        path = ORACLE

        @staticmethod
        def compress(src, dst, *args):
            subprocess.run(
                [ORACLE, "c", str(src), str(dst), "-t1", *args],
                check=True, capture_output=True,
            )

        @staticmethod
        def decompress(src, dst, *args):
            subprocess.run(
                [ORACLE, "d", str(src), str(dst), "-t1", *args],
                check=True, capture_output=True,
            )

    return Oracle
