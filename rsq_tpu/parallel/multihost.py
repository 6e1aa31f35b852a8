"""Multi-host (DCN) mesh construction and distributed runtime init.

The reference has no distributed backend at all (SURVEY.md §2.4: no
torch.distributed/NCCL anywhere; multi-GPU = independent shell jobs,
scripts/job_allocater.sh).  On TPU pods the equivalent capability is
first-class: `jax.distributed.initialize()` + a HYBRID device mesh whose
outer axes span hosts over DCN and inner axes span the chips of each
slice over ICI.  The sharding rules follow the scaling-book recipe:

  * tensor-parallel (`tp`) and sequence-parallel (`sp`) axes carry
    per-layer collectives (psum / all-gather of activations) every step —
    they MUST ride ICI, so they map to the mesh's minor (intra-slice)
    dimensions;
  * data-parallel (`dp`) and pipeline (`pp`) axes communicate rarely
    (gradient psum / one boundary transfer per microbatch) — they tolerate
    DCN latency, so they map to the major (cross-slice) dimensions.

`hybrid_mesh` encodes that convention; everything else in rsq_tpu
(parallel/tp.py, tp_paged.py, pp.py, sp.py) takes a Mesh and is agnostic
to whether its axes are ICI or DCN.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime for a multi-host pod/multislice
    job.  On Cloud TPU all three arguments are auto-detected from the
    environment; pass them explicitly only for manual (e.g. DCN multislice)
    launches.  Safe to call once per process, before any jax device use."""
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def hybrid_mesh(dcn_axes: dict[str, int], ici_axes: dict[str, int],
                devices=None) -> Mesh:
    """Build a Mesh whose leading axes span hosts/slices (DCN) and whose
    trailing axes span the chips within a slice (ICI).

    dcn_axes: {axis_name: size} for cross-slice axes (dp/pp — infrequent,
      latency-tolerant collectives).
    ici_axes: {axis_name: size} for intra-slice axes (tp/sp — per-layer
      collectives that need ICI bandwidth).

    Uses mesh_utils.create_hybrid_device_mesh when more than one slice is
    present (it orders devices so that ICI neighbours are mesh-minor), and
    a plain contiguous reshape on a single host/slice (including the CPU
    simulation used in tests)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    names = tuple(dcn_axes) + tuple(ici_axes)
    dcn_shape = tuple(dcn_axes.values())
    ici_shape = tuple(ici_axes.values())
    total = math.prod(dcn_shape) * math.prod(ici_shape)
    if total != len(devices):
        raise ValueError(
            f"mesh axes {dict(**dcn_axes, **ici_axes)} need {total} devices, "
            f"got {len(devices)}")

    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices > 1:
        from jax.experimental import mesh_utils
        # create_hybrid_device_mesh requires mesh_shape and dcn_mesh_shape to
        # have the SAME rank (the result is their elementwise product).  Pad
        # each with 1s so every axis is either pure-DCN or pure-ICI: the
        # result then has shape dcn_shape + ici_shape directly, with no
        # reshape that could interleave devices across slices (a trailing
        # reshape after a rank-mismatched call would mix slice devices into
        # the ICI axes, putting tp/sp traffic on DCN).
        ici_s = ici_shape if ici_shape else (1,)
        dcn_s = dcn_shape if dcn_shape else (1,)
        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1,) * len(dcn_s) + ici_s, dcn_s + (1,) * len(ici_s),
            devices=devices)
        # result already has shape dcn_s + ici_s; only trivial padded-1 axes
        # are removed here, so no cross-slice reordering can occur.
        dev_array = dev_array.reshape(dcn_shape + ici_shape)
    else:
        # single slice (or CPU simulation): contiguous reshape keeps
        # ICI-neighbour chips adjacent in the minor axes
        dev_array = np.asarray(devices).reshape(dcn_shape + ici_shape)
    return Mesh(dev_array, names)


def serving_mesh(n_hosts: int = 1, chips_per_host: int | None = None,
                 tp: int | None = None, devices=None) -> Mesh:
    """The north-star serving topology (BASELINE.md): `dp` over hosts
    (DCN), `tp` over each host's chips (ICI).  tp defaults to all chips of
    a host; dp = n_hosts."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if chips_per_host is None:
        chips_per_host = len(devices) // n_hosts
    if tp is None:
        tp = chips_per_host
    dp = len(devices) // tp
    return hybrid_mesh({"dp": dp}, {"tp": tp}, devices=devices)
