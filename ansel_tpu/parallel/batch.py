"""Multi-chip execution: batch-export sharding + spatial sharding.

The reference's batch parallelism is one export job per image on a
serialized queue (`/root/reference/src/control/jobs.h:52-60`,
DT_JOB_QUEUE_USER_EXPORT); its out-of-memory strategy is halo tiling
(src/develop/tiling.c).  TPU-native mapping (SURVEY.md §2.9, §5.7):

  * batch axis  -> data-parallel sharding of a padded image batch over the
    device mesh ("dp"); one jit, N images in flight per step.
  * spatial axis -> GSPMD row-sharding ("sp") of a single large image; XLA
    inserts the halo collective-permutes for the stencil ops automatically,
    which is exactly the tiling engine's overlap machinery done by the
    compiler over ICI instead of by hand over PCIe.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import RawMeta
from ..ops import base as ops_base
from ..pipeline.engine import CompiledPipe, HistoryItem, Pipeline


def make_mesh(n_devices: Optional[int] = None, spatial: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % spatial == 0, (n, spatial)
    arr = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(arr, axis_names=("dp", "sp"))


class BatchPipeline:
    """vmap'd pipeline over a batch of same-shape raws, dp-sharded over the
    mesh and row-sharded over the sp axis."""

    def __init__(self, meta: RawMeta, history: List[HistoryItem], mesh: Mesh):
        self.pipe = Pipeline(meta, history)
        self.mesh = mesh
        self._coeffs = self.pipe.coeffs()
        run = self.pipe.trace_fn()
        in_sharding = NamedSharding(mesh, P("dp", "sp", None))
        out_sharding = NamedSharding(mesh, P("dp", None, "sp", None))
        self._fn = jax.jit(
            jax.vmap(run, in_axes=(0, None)),
            in_shardings=(in_sharding, None),
            out_shardings=out_sharding,
        )

    def __call__(self, raw_batch: np.ndarray) -> jax.Array:
        """raw_batch: (B, H, W) mosaics in sensor units (padded or not)."""
        spec = self.pipe.spec_in
        if raw_batch.shape[1:] != spec.array_shape:
            raw_batch = np.stack(
                [ops_base.pad_to(r, spec) for r in raw_batch]
            )
        dev = jax.device_put(
            jnp.asarray(raw_batch),
            NamedSharding(self.mesh, P("dp", "sp", None)),
        )
        return self._fn(dev, self._coeffs)


def spatial_sharded_pipe(meta: RawMeta, history: List[HistoryItem],
                         mesh: Mesh):
    """Single-image pipe with the mosaic row-sharded over ALL mesh devices
    (dp*sp) — the HBM-bound big-image path (45MP+ configs)."""
    pipe = Pipeline(meta, history)
    coeffs = pipe.coeffs()
    run = pipe.trace_fn()
    in_sharding = NamedSharding(mesh, P(("dp", "sp"), None))
    out_sharding = NamedSharding(mesh, P(None, ("dp", "sp"), None))
    fn = jax.jit(run, in_shardings=(in_sharding, None),
                 out_shardings=out_sharding)

    def call(raw: np.ndarray):
        spec = pipe.spec_in
        if raw.shape != spec.array_shape:
            raw = ops_base.pad_to(raw, spec)
        dev = jax.device_put(jnp.asarray(raw), in_sharding)
        return fn(dev, coeffs)

    return call, pipe
