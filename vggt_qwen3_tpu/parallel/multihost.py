"""Multi-host (multi-process) launch wiring.

Replaces the reference's rank-launch layer (``train_fixed.sh:373-378``,
``scripts/slurm/stage2_3d_2xb200.sbatch:24-29``, ``run.sh:6-8``) the TPU way:
``jax.distributed.initialize()`` joins every process into one JAX runtime, the
mesh spans ALL devices, and each host feeds only its process-local rows of the
global batch via ``jax.make_array_from_process_local_data`` — XLA's
collectives (ICI within a slice, DCN across hosts) do the rest.

On Cloud TPU pods ``initialize()`` needs no arguments (coordinator discovery
comes from the TPU metadata); on CPU/GPU clusters pass the coordinator
address, process count, and process id explicitly (or via env:
``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the distributed runtime. No-op if already initialized."""
    import jax

    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        if "already initialized" not in str(e):
            raise


def global_batch_from_local(local_batch: Any, sharding) -> Any:
    """Assemble per-host numpy rows into global jax.Arrays.

    Each process holds the contiguous row block the ``data_loader``'s
    ``shard_rank``/``shard_count`` contract assigned to it;
    ``jax.make_array_from_process_local_data`` places those rows onto this
    process's addressable shards of ``sharding`` without any host gather.
    """
    import jax

    def one(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(one, local_batch)
