"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip behavior (sharded index, ICI top-k merge, dp/tp training step)
is tested without TPU hardware via
``--xla_force_host_platform_device_count=8`` — the TPU analog of "test
multi-node without a cluster" (SURVEY §4).

This container's sitecustomize eagerly registers the axon TPU backend, so
``JAX_PLATFORMS=cpu`` can't be set after the fact.  Instead we rely on
JAX's lazy per-platform client init: the CPU client is only created at
first use, so setting ``XLA_FLAGS`` here (before any ``jax.devices("cpu")``
call) still yields 8 virtual CPU devices, and ``jax_default_device``
steers all test computation onto them.  Set ``MRS_TPU_TESTS_ON_TPU=1`` to
run the suite on the real chip instead.
"""

import os

# Must happen before the CPU PJRT client is instantiated.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if os.environ.get("MRS_TPU_TESTS_ON_TPU") != "1":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_mesh_devices(n: int = 8):
    cpus = jax.devices("cpu")
    if len(cpus) < n:
        pytest.skip(f"need {n} CPU devices, have {len(cpus)}")
    return cpus[:n]


@pytest.fixture()
def tmp_storage(tmp_path):
    return str(tmp_path / "rag_storage")


@pytest.fixture()
def fake_config(tmp_storage):
    from modular_rag_system_tpu.config import RAGConfig

    cfg = RAGConfig()
    cfg = cfg.merged(
        {
            "embedding": {"model": "fake", "dim": 384, "batch_size": 64},
            "store": {"storage_path": tmp_storage},
            "index": {"initial_capacity": 1024},
            "retrieval": {"similarity_threshold": 0.0},
        }
    )
    return cfg


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
