"""Multi-host runtime initialization + serving roles.

Reference analog (ref: vllm_i64/parallel/launcher.py:29-59 torchrun spawn +
worker.py broadcast loop). On TPU pods there is no process launcher to
write: every host starts the SAME program, ``jax.distributed.initialize``
joins them into one runtime, and the pjit'd step function spans all chips —
XLA compiles the collectives, so the reference's explicit broadcast-driven
worker loop (worker.py:127-182) has no equivalent code here. Host 0 serves
HTTP; other hosts participate through the shared computation
(SPMD: their engine loop executes the same jitted programs).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger("vllm_i64_tpu.launcher")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join the multi-host JAX runtime. Returns this host's process index.

    No-ops on a single host. Arguments default to the standard TPU pod
    environment (auto-detected by jax.distributed on Cloud TPU)."""
    import jax

    env_addr = coordinator_address or os.environ.get("VLLM_I64_TPU_COORDINATOR")
    env_n = num_processes or _int_env("VLLM_I64_TPU_NUM_HOSTS")
    env_id = process_id if process_id is not None else _int_env(
        "VLLM_I64_TPU_HOST_ID")

    if env_addr or env_n:
        jax.distributed.initialize(
            coordinator_address=env_addr,
            num_processes=env_n,
            process_id=env_id,
        )
        logger.info("joined distributed runtime: host %d/%d",
                    jax.process_index(), jax.process_count())
    return jax.process_index()


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def is_serving_host() -> bool:
    """Host 0 runs the HTTP server (ref: worker.py:97-121 rank-0 role)."""
    import jax

    return jax.process_index() == 0


def launch_cross_host_serving(engine_factory, run_server=None,
                              host_ip: Optional[str] = None):
    """Cross-host continuous batching role split (ref: worker.py:97-121,
    generalized): after init_distributed, host 0 builds a CrossHostRouter
    over every other host's engine worker (parallel/cross_host.py) and runs
    the HTTP server against it; hosts >0 block serving their engine until
    the router shuts them down. Returns the router on host 0, None on
    worker hosts."""
    from .cross_host import launch_cross_host

    # host_ip must be a cross-host-reachable address on real pods —
    # defaults to $VLLM_I64_TPU_HOST_IP (loopback only for local tests)
    router = launch_cross_host(engine_factory, host_ip=host_ip)
    if router is None:
        return None  # worker host finished serving
    if run_server is not None:
        run_server(router)
    return router
