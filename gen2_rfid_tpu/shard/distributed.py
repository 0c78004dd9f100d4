"""Multi-host distributed decode driver (pod-scale capture processing).

The reference is strictly single-process (SURVEY.md section 2.5); this is
the new-framework path for decoding very long captures across a multi-host
TPU slice:

* `init_distributed` wires `jax.distributed.initialize` (no-op for single
  process);
* each process memory-maps only its devices' time slices of the capture
  file (`io/tracefile.py`) and assembles a global `jax.Array` with
  `jax.make_array_from_single_device_arrays`;
* the decode itself is the same `shard_map` program as single-host
  (`decode_capture_sharded._shard_body`): halos ride ICI between neighbor
  shards and DCN only between boundary shards of adjacent hosts;
* stats come back replicated; process 0 reports.

Testable without a pod: the same code path runs on the virtual multi-device
CPU platform (process count 1), which is how tests/test_sharded.py exercises
it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import ReaderConfig
from ..io.tracefile import read_trace, trace_num_samples
from ..runtime.inventory import DecodedEvents
from ..runtime.stats import InventoryStats
from .decode_sharded import decode_capture_sharded
from .mesh import CHAN_AXIS, TIME_AXIS, make_mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (multi-host).  With no
    arguments relies on the TPU environment's auto-detection; a no-op when
    only one process is configured."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    # Multi-process CPU (localhost validation of the pod path) needs a
    # cross-process collectives backend; gloo ships in jaxlib.  On TPU the
    # platform's own collectives are used and this config is ignored.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def stats_to_host(stats: InventoryStats) -> InventoryStats:
    """Fetch a stats pytree to host numpy on every process.

    `decode_file_distributed` jits with fully-replicated out_shardings, so
    each leaf is readable locally on any process (`np.asarray` on a
    fully-replicated global array never needs cross-process traffic at
    read time — the replication happened on-device inside the program).
    """
    return jax.tree.map(np.asarray, stats)


def _planar_slice(path: str, offset: int, count: int) -> np.ndarray:
    iq = read_trace(path, offset, count)
    return np.stack([iq.real.astype(np.float32), iq.imag.astype(np.float32)])


def decode_file_distributed(
    path: str,
    cfg: ReaderConfig,
    n_chan: int = 1,
    events_per_shard: int = 256,
) -> Tuple[InventoryStats, DecodedEvents]:
    """Decode a single-channel capture file across all hosts/devices.

    Every process loads only the byte ranges its own devices shard; the
    global array is assembled without any host ever holding the full
    capture.
    """
    mesh = make_mesh(n_chan=n_chan)
    n_time = mesh.shape[TIME_AXIS]
    n = trace_num_samples(path)
    n_block = (n // (n_time * cfg.decim)) * cfg.decim
    n_used = n_block * n_time
    sharding = NamedSharding(mesh, P(CHAN_AXIS, None, TIME_AXIS))

    # Build the global (C=1, 2, N_used) planar array from per-device local
    # shards; each process only touches its addressable slice of the file.
    local = []
    for d in mesh.local_devices:
        # Device's coordinates in the mesh decide its time-slice.
        idx = np.argwhere(mesh.devices == d)
        t_i = int(idx[0][0])
        x = _planar_slice(path, t_i * n_block, n_block)  # (2, n_block)
        local.append(jax.device_put(x[None], d))
    global_shape = (1, 2, n_used)
    iq2 = jax.make_array_from_single_device_arrays(global_shape, sharding, local)

    from .decode_sharded import make_sharded_decoder

    # Replicated outputs: every process holds the full stats + event
    # tables, so reporting needs no post-hoc cross-process gather (the
    # tables are tiny — the all-gather already happened for the global
    # replay sort, replication just keeps the result everywhere).
    fn = jax.jit(
        make_sharded_decoder(cfg, mesh, events_per_shard),
        out_shardings=NamedSharding(mesh, P()),
    )
    return fn(iq2)
