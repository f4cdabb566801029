"""Multi-host runtime initialization.

TPU-native replacement for the reference's TPUClusterResolver.connect()
(neural_network.py:142-144). On a pod slice, every host process calls
initialize() before any jax op; afterwards jax.devices() spans the whole
slice and the ('data','model') mesh from parallel.mesh lays collectives
over ICI. Single-host (or already-initialized) environments no-op.

Data loading stays host-local: each host feeds only the batch rows for its
addressable devices (host_batch_slice), so no global batch ever
materializes on one host — the SPMD equivalent of tf.data sharding.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; returns True when
    a multi-process runtime is active after the call.

    With no arguments, relies on the TPU environment's auto-detection
    (metadata on Cloud TPU VMs) or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    """
    if jax.process_count() > 1:
        return True  # already initialized by the launcher
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # Single-host run; nothing to initialize.
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_count() > 1


def host_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host is responsible for feeding.

    Batches are sharded over the 'data' axis; with jax.Array + NamedSharding
    each host only needs to materialize the rows for its addressable
    devices. Assumes the global batch divides evenly by process count.
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
