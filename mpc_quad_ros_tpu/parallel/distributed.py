"""Multi-process (multi-HOST) distribution of the scenario batch.

The reference is strictly single-process (SURVEY §2: one MPC solve per ROS
callback); cross-host scaling is a new, first-class axis here (BASELINE
config 5: "100k+ scenarios sharded across N>=2 hosts, QP reductions +
convergence checks over ICI/DCN").

Design — jax multi-controller SPMD, the scaling-book recipe unchanged:

- every process runs the SAME program; `initialize()` wires them into one
  runtime (`jax.distributed.initialize` — coordinator rendezvous, then
  `jax.devices()` spans ALL processes' devices);
- `global_mesh()` builds the one data-parallel mesh over those devices —
  `parallel.mesh.sharded_step_fn` works UNCHANGED on it: inside shard_map
  each device still sees its per-device scenario shard, and the same
  `lax.psum` that reduced metrics across local devices now rides ICI within
  a host and DCN between hosts (XLA inserts the hierarchical collective);
- each process materializes only its OWN scenarios;
  `make_global_batch` assembles the global jax.Array from process-local
  shards (`jax.make_array_from_process_local_data`) without ever gathering
  the batch anywhere.

Correctness is testable with ZERO multi-host hardware: spawn N local
processes with K virtual CPU devices each (gloo collectives over localhost,
jax's default CPU cross-process backend) — `tests/test_multiprocess.py` and
`parallel/mp_worker.py` do exactly that, asserting shard-exact agreement
with the single-process oracle.  On real TPU pods the same worker runs one
process per host with no platform flags.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_virtual_devices: Optional[int] = None,
               platform: Optional[str] = None) -> None:
    """Join this process into the multi-controller runtime.

    All arguments fall back to the standard env vars
    (`JAX_COORDINATOR_ADDRESS`, `JAX_NUM_PROCESSES`, `JAX_PROCESS_ID`) and,
    on TPU pods, to automatic cluster detection (plain
    `jax.distributed.initialize()`).

    local_virtual_devices: CPU-testing convenience — forces this process to
    expose K virtual CPU devices.  Must be applied before any jax backend is
    touched; the launcher sets XLA_FLAGS in the child env instead, so this
    is only a guard for direct callers.
    """
    if local_virtual_devices is not None and not jax._src.xla_bridge._backends:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={local_virtual_devices}"
            ).strip()
    if platform:
        jax.config.update("jax_platforms", platform)
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def global_mesh(axis: str = "dp") -> Mesh:
    """One data-parallel mesh over every device of every process.

    Device order is jax's global enumeration (process-major), so scenario
    block b of a batch sharded over `axis` lands on process b*nproc//nshards
    — contiguous per-process slices, which is what `make_global_batch`
    assumes."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_slice(global_batch: int) -> slice:
    """The contiguous slice of a size-`global_batch` scenario axis owned by
    THIS process (device order is process-major in `global_mesh`)."""
    nproc = jax.process_count()
    if global_batch % nproc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{nproc} processes")
    per = global_batch // nproc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def make_global_batch(mesh: Mesh, local_tree, axis: str = "dp"):
    """Assemble a mesh-global batch from per-process local shards.

    Each leaf's leading dim is this process's scenario count; the returned
    jax.Arrays have global shape (local * process_count, ...) sharded over
    `axis`, with no cross-process data movement (every process donates the
    shard it already holds — `jax.make_array_from_process_local_data`)."""
    sharding = NamedSharding(mesh, P(axis))
    nproc = jax.process_count()

    def put(leaf):
        leaf = np.asarray(leaf)
        gshape = (leaf.shape[0] * nproc,) + leaf.shape[1:]
        return jax.make_array_from_process_local_data(sharding, leaf, gshape)

    return jax.tree.map(put, local_tree)


def local_shard(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, as one numpy
    block (addressable shards concatenated in device order)."""
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
