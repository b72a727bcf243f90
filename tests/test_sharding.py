"""Multi-chip (virtual 8-device CPU mesh) sharded codec step tests."""

import numpy as np
import pytest

import jax

from jampack_tpu.runtime.sharding import make_mesh, roundtrip_blocks


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_roundtrip(n_devices):
    mesh = make_mesh(n_devices)
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, (n_devices * 2, 120 * 8), dtype=np.uint8)
    recon, bwt, metric = roundtrip_blocks(blocks, mesh)
    assert np.array_equal(recon, blocks)
    # psum'd metric equals the host-side total over all blocks' BWTs
    assert metric == int(bwt.astype(np.uint64).sum())


def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert np.array_equal(np.asarray(out[0]), args[0])
    g.dryrun_multichip(8)
