"""Multi-host (multi-process) bring-up — SURVEY.md §5's "distributed
communication backend": ``jax.distributed.initialize`` + SPMD via
pjit/shard_map over a global device mesh.

Single-host usage is unchanged (nothing here runs unless asked).  For a
multi-host deployment each process runs the SAME program (launcher
``--multihost`` or ``RAGConfig.mesh.multihost = True``):

    RAG_COORDINATOR=host0:8476 RAG_NUM_PROCESSES=4 RAG_PROCESS_ID=0 \
        python -m modular_rag_system_tpu.launcher --multihost --daemon

On TPU pods the three variables may all be omitted — JAX auto-detects
the pod topology from the TPU runtime — which is the normal production
path; the env vars exist for CPU/GPU clusters and for smoke tests.

After initialization, ``jax.devices()`` is the GLOBAL device list.  The
index mesh is laid out as a (process, local-device) grid so the
hierarchical top-k merge (``parallel/sharded.py``) keeps its traffic
shape: full-width merges ride ICI *within* a process's slice, and only
``k`` candidates per slice cross the DCN axis between hosts.

The reference has no counterpart (SURVEY §2.7: no distributed layer at
all); the contract here is SURVEY.md:446-451.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

# env names (RAG_* preferred; falls back to JAX's own conventions)
ENV_COORD = "RAG_COORDINATOR"
ENV_NPROC = "RAG_NUM_PROCESSES"
ENV_PID = "RAG_PROCESS_ID"

_initialized = False


def is_initialized() -> bool:
    """True once ``jax.distributed`` has a live client (ours or anyone's)."""
    if _initialized:
        return True
    import jax

    # public accessor (jax >= 0.4.35); keep the legacy private-attr probe
    # only as a fallback for older installs (ADVICE r4: don't let a JAX
    # upgrade silently turn this into a double-initialize)
    probe = getattr(jax.distributed, "is_initialized", None)
    if probe is not None:
        try:
            return bool(probe())
        except Exception:
            pass
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return _initialized


def initialize_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Bring up the JAX distributed runtime (idempotent).

    Resolution order per parameter: explicit argument -> RAG_* env var
    -> None (JAX auto-detection, which works out of the box on TPU
    pods).  Returns True if a client is live after the call.

    ``num_processes=1`` is a legitimate smoke configuration: it starts
    the coordinator service and exercises the full bring-up path on one
    host (used by ``__graft_entry__.dryrun_multichip`` and the test
    suite, so the code path is validated without a real pod).
    """
    global _initialized
    if is_initialized():
        logger.info("jax.distributed already initialized; skipping")
        return True

    import jax

    coordinator = coordinator or os.environ.get(ENV_COORD) or None
    if num_processes is None and os.environ.get(ENV_NPROC):
        num_processes = int(os.environ[ENV_NPROC])
    if process_id is None and os.environ.get(ENV_PID):
        process_id = int(os.environ[ENV_PID])

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # someone else (test harness, embedding app) already brought the
        # runtime up — that is success for an idempotent bring-up
        if "already initialized" not in str(e).lower():
            raise
        logger.info("jax.distributed was already initialized elsewhere")
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global device(s)",
        jax.process_index(), jax.process_count(), jax.device_count())
    return True


def global_device_grid(devices=None):
    """Global devices as a (n_processes, devices_per_process) grid.

    Rows are processes in ``process_index`` order; this is the layout
    ``make_hierarchical_index_mesh`` expects flattened (slice-major), so
    the ``dcn`` mesh axis falls on the host boundary and the ``ici``
    axis stays within each host's slice.  Raises if the per-process
    device counts are uneven (heterogeneous pods are not supported).

    Defaults to ``mesh.default_devices()`` — the framework-wide device
    resolution (honors ``jax_default_device``, so tests and smoke runs
    steer onto the virtual CPU mesh); on a real pod that is simply the
    global ``jax.devices()`` list."""
    import numpy as np

    from modular_rag_system_tpu.parallel.mesh import default_devices

    devices = list(devices if devices is not None else default_devices())
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    counts = {len(v) for v in by_proc.values()}
    if len(counts) != 1:
        raise ValueError(
            f"uneven devices per process: { {p: len(v) for p, v in by_proc.items()} }")
    rows = [by_proc[p] for p in sorted(by_proc)]
    return np.array(rows, dtype=object)


def apply_multihost_defaults(cfg) -> None:
    """Fill mesh-config defaults from the GLOBAL device list.

    After bring-up, an unconfigured ``index_shards`` (<= 1) becomes
    one shard per global device, and ``dcn_slices`` one slice per
    process — the layout whose merge traffic matches the hardware.
    Explicit non-default values are left untouched."""
    import jax

    grid = global_device_grid()
    n_proc, per_proc = grid.shape
    if cfg.mesh.index_shards <= 1:
        cfg.mesh.index_shards = n_proc * per_proc
    if cfg.mesh.dcn_slices <= 1 and n_proc > 1:
        cfg.mesh.dcn_slices = n_proc
    logger.info(
        "multihost mesh defaults: index_shards=%d dcn_slices=%d "
        "(%d process(es) x %d device(s))",
        cfg.mesh.index_shards, cfg.mesh.dcn_slices, n_proc, per_proc)


def ensure_multihost(cfg) -> None:
    """Engine hook: bring up the distributed runtime (env-driven) and
    derive mesh defaults.  Called when ``cfg.mesh.multihost`` is set."""
    initialize_multihost(
        coordinator=cfg.mesh.coordinator or None,
        num_processes=cfg.mesh.num_processes or None,
        process_id=(cfg.mesh.process_id
                    if cfg.mesh.process_id >= 0 else None),
    )
    apply_multihost_defaults(cfg)
