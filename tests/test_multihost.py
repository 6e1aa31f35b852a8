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
