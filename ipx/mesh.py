"""Device mesh construction + sharding policies (SURVEY.md component N13).

Mesh axes (SURVEY.md §2.2):
  "batch" — data-parallel over independent LP instances (configs 3, 5)
  "row"   — model-parallel over the large dimension: columns of A for the
            Schur reduction, row panels of the normal matrix (config 4)

The reference repo has no parallelism at all (SURVEY.md §2.2); everything
here is new TPU-native capability.  Multi-host bootstrap goes through
``jax.distributed.initialize`` (DCN), after which ``jax.devices()`` is global
and the same mesh-building code applies.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
ROW_AXIS = "row"


def make_mesh(batch: int = 1, row: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (batch, row) mesh from ``batch * row`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    need = batch * row
    if len(devs) < need:
        raise ValueError(f"need {need} devices for mesh ({batch}x{row}), "
                         f"have {len(devs)}")
    arr = np.array(devs[:need]).reshape(batch, row)
    return Mesh(arr, (BATCH_AXIS, ROW_AXIS))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap over DCN (BASELINE config 5).

    No-op when running single-process.  Arguments default to the JAX
    environment variables (JAX_COORDINATOR_ADDRESS etc.) set by the launcher.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def batch_lp_sharding(mesh: Mesh):
    """NamedShardings for a batched LP pytree: batch over BATCH_AXIS,
    constraint rows of each A over ROW_AXIS."""
    return dict(
        c=NamedSharding(mesh, P(BATCH_AXIS, None)),
        A=NamedSharding(mesh, P(BATCH_AXIS, ROW_AXIS, None)),
        b=NamedSharding(mesh, P(BATCH_AXIS, ROW_AXIS)),
        obj_offset=NamedSharding(mesh, P(BATCH_AXIS)),
    )


def large_lp_sharding(mesh: Mesh):
    """NamedShardings for one large LP (config 4): variables (columns of A)
    sharded over ROW_AXIS for the Schur reduction; m-vectors replicated."""
    return dict(
        c=NamedSharding(mesh, P(ROW_AXIS)),
        A=NamedSharding(mesh, P(None, ROW_AXIS)),
        b=NamedSharding(mesh, P()),
        obj_offset=NamedSharding(mesh, P()),
    )
