"""Multi-host controller bring-up, importable BEFORE any backend init.

jax.distributed.initialize must run before anything touches the XLA
backend; zkrollup.dist.mesh (and most of the package) builds device
constants at import, so multi-host launchers import THIS module first:

    from zkrollup.dist.launch import init_distributed
    init_distributed("host0:1234", num_processes=N, process_id=r)
    from zkrollup.dist.mesh import ...   # heavy imports AFTER

Exercised end-to-end (2 controller processes over loopback, global mesh,
cross-process collectives) by tools/multihost_sim.py.
"""

from __future__ import annotations

from typing import Optional


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up; no-op when single-process."""
    if num_processes and num_processes > 1:
        import jax
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
