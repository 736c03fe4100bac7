"""Multi-host (pod / DCN) initialization.

The reference's distributed story is vestigial single-process DDP
(nerf/utils.py:439-441, 1415-1430 -- never launched).  The TPU-native
equivalent for pods is `jax.distributed.initialize` once per host
process, after which `jax.devices()` is the GLOBAL device list and the
same GSPMD meshes in `sharding.py` span hosts: the 'data' axis should be
laid out DCN-major (process index outermost) so gradient all-reduces
ride ICI within a host and cross DCN only for the final stage.

On the single-chip bench hardware this is a 1-process no-op; the
plumbing exists so a pod launch is `initialize_multihost()` + the
existing trainers, nothing else (SURVEY.md section 5.8).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host launch.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS
    / JAX_NUM_PROCESSES / JAX_PROCESS_ID, as set by most TPU pod
    launchers).  With no coordinator configured anywhere this is a
    single-process no-op returning False -- safe to call unconditionally
    from entry points.  Idempotent.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None:
        return False
    if num_processes is None or process_id is None:
        # A coordinator without explicit process counts: pod launchers on
        # TPU rely on jax.distributed.initialize auto-detection.  A silent
        # single-host no-op here would quietly drop the distributed run.
        jax.distributed.initialize(coordinator_address=coordinator_address)
        _initialized = True
        return True
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def make_global_mesh(model: int = 1, devices=None) -> Mesh:
    """('data', 'model') mesh over the GLOBAL device list, DCN-major.

    Devices are ordered process-outermost, so consecutive 'data' shards
    within one host are ICI neighbours and the data axis crosses DCN
    only between process blocks; the 'model' (tensor-parallel) axis is
    always intra-host (it carries a psum per MLP layer pair and must
    never ride DCN)."""
    devices = list(devices if devices is not None else jax.devices())
    per_proc: dict[int, list] = {}
    for d in devices:
        per_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    if model > 1:
        for pid, devs in per_proc.items():
            if len(devs) % model != 0:
                raise ValueError(
                    f"model={model} does not divide process {pid}'s "
                    f"{len(devs)} devices; tensor parallelism must stay "
                    "intra-host")
    ordered = [d for pid in sorted(per_proc) for d in per_proc[pid]]
    n = len(ordered)
    data = n // model
    devs = np.asarray(ordered[:data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))
