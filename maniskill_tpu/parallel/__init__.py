"""Multi-chip / multi-host parallelism utilities.

The TPU-native replacement for the reference's process-pool CPU
vectorization and (absent) distributed backend (SURVEY.md §2.10): one
sharded program over a ``jax.sharding.Mesh``, with XLA inserting the ICI
collectives. The planners (``planners/mppi.py``, ``planners/cem.py``)
accept a mesh and shard the rollout axis; envs shard the env axis the same
way.

Typical use::

    from maniskill_tpu.parallel import init_distributed, rollout_mesh
    init_distributed()            # no-op single-host; jax.distributed else
    mesh = rollout_mesh()         # 1-D mesh over every visible device
    planner = MPPI(env, cfg, mesh=mesh)
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX when launched as one process per host.

    Single-process runs are a no-op. Multi-host settings come from the
    arguments or the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) / cloud-TPU metadata that
    ``jax.distributed.initialize`` auto-detects.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env(
        "JAX_PROCESS_ID"
    )
    if coordinator_address is None and num_processes in (None, 1):
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def rollout_mesh(
    axis_name: str = "rollout", devices: Optional[Sequence] = None
) -> Mesh:
    """1-D mesh over all (global) devices — the layout for sharding the
    embarrassingly parallel rollout/env axis so collectives (the MPPI
    softmax reductions) ride ICI."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def hierarchical_mesh(
    axis_names: Sequence[str] = ("dcn", "ici"),
    dcn_size: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-level (DCN × ICI) mesh per SURVEY §2.10: the outer axis spans
    hosts/slices (cross-data-center-network collectives), the inner axis
    the chips within a slice (ICI collectives). Shard the rollout batch
    over BOTH axes — ``PartitionSpec(("dcn", "ici"))`` — so the MPPI
    softmax reduction becomes a two-stage tree: chip-local partials over
    ICI, then one small cross-host combine over DCN.

    ``dcn_size`` defaults to ``jax.process_count()`` (1 in single-host
    runs; pass an explicit factor to exercise the layout on a virtual
    mesh)."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    d = dcn_size or max(jax.process_count(), 1)
    assert n % d == 0, f"{n} devices not divisible into {d} DCN groups"
    grid = np.asarray(devices).reshape(d, n // d)
    return Mesh(grid, tuple(axis_names))


def shard_rollouts(x, mesh: Mesh, axis_name: str = "rollout"):
    """Constrain the leading axis of a pytree to be sharded over the mesh."""
    sharding = NamedSharding(
        mesh, PartitionSpec(axis_name)
    )

    def put(a):
        spec = PartitionSpec(axis_name, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, spec)
        )

    return jax.tree.map(put, x)


def replicate(x, mesh: Mesh):
    """Constrain a pytree to be fully replicated over the mesh."""
    def put(a):
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, PartitionSpec())
        )

    return jax.tree.map(put, x)
