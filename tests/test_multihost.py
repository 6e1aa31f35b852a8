"""Hybrid (DCN x ICI) mesh construction on the virtual 8-device CPU mesh.

The real DCN path (jax.distributed.initialize + multislice) needs multiple
hosts; what IS testable single-process is the axis-ordering contract —
cross-slice axes major, intra-slice axes minor — and that shardings over a
hybrid mesh execute collectives correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsq_tpu.parallel import multihost as MH


def test_hybrid_mesh_axis_order_and_shape():
    mesh = MH.hybrid_mesh({"dp": 2}, {"tp": 4})
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (2, 4)
    # minor (tp) axis must hold contiguous device ids on a single slice:
    # those are the ICI-neighbour chips
    ids = np.array([[d.id for d in row] for row in mesh.devices])
    for row in ids:
        assert list(row) == list(range(row[0], row[0] + 4))


class _FakeDev:
    """Minimal device stand-in carrying slice_index, enough to drive the
    n_slices>1 branch of hybrid_mesh single-process (real multislice needs
    a multi-host job)."""

    def __init__(self, i, sl):
        self.id = i
        self.slice_index = sl
        self.process_index = sl
        self.platform = "cpu"
        self.device_kind = "cpu"

    def __repr__(self):
        return f"D{self.id}s{self.slice_index}"


def test_hybrid_mesh_multislice_keeps_ici_axes_within_a_slice():
    """With >1 ICI axis (dcn={dp:2}, ici={tp:2,sp:2}) every dp row must hold
    devices of exactly one slice — tp/sp collectives must never span DCN.
    Regression for the rank-mismatched create_hybrid_device_mesh call whose
    trailing reshape interleaved slices (ADVICE r3 #1)."""
    devs = [_FakeDev(i, i // 4) for i in range(8)]
    mesh = MH.hybrid_mesh({"dp": 2}, {"tp": 2, "sp": 2}, devices=devs)
    assert mesh.devices.shape == (2, 2, 2)
    for i in range(2):
        slices = {d.slice_index for d in mesh.devices[i].ravel()}
        assert len(slices) == 1, f"dp row {i} spans slices {slices}"
    # and the two rows are distinct slices
    assert ({mesh.devices[0, 0, 0].slice_index}
            != {mesh.devices[1, 0, 0].slice_index})


def test_hybrid_mesh_device_count_mismatch():
    with pytest.raises(ValueError, match="need 16 devices"):
        MH.hybrid_mesh({"dp": 4}, {"tp": 4})


def test_serving_mesh_defaults():
    mesh = MH.serving_mesh(n_hosts=2)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (2, 4)


def test_collectives_over_hybrid_mesh():
    """A dp-psum + tp-psum under shard_map over the hybrid mesh must equal
    the unsharded sum — the pattern every data-parallel Hessian/gradient
    step and every row-parallel matmul epilogue uses."""
    from jax.sharding import PartitionSpec as P

    mesh = MH.hybrid_mesh({"dp": 2}, {"tp": 4})
    x = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)

    def f(xs):
        local = jnp.sum(xs)
        return jax.lax.psum(jax.lax.psum(local, "tp"), "dp")[None]

    got = jax.shard_map(f, mesh=mesh, in_specs=P("dp", "tp"),
                        out_specs=P("dp"))(x)
    np.testing.assert_allclose(np.asarray(got), float(jnp.sum(x)))
