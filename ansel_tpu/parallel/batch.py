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
    """Production batch-export pipe over the mesh's "dp" axis.

    Each device runs the FULL fused pipe (Pallas kernels included) on its
    local shard of the batch via `lax.map` — the pattern bench.py proves
    on one chip — wrapped in `shard_map` so the batch axis spreads over
    dp.  A bare `vmap` cannot do this: Pallas ANY-space refs don't take a
    batch dimension, so the fused pointwise chain and the halo-tile
    kernels (RCD, EAW, NLM, warp) would fail to trace.  With shard_map
    the per-device body is exactly the single-chip program.

    The mesh's "sp" axis must be 1 here: spatial GSPMD sharding and
    manual-SPMD shard_map don't compose for Pallas bodies (use
    `spatial_sharded_pipe` for the XLA-only big-image path).
    """

    def __init__(self, meta: RawMeta, history: List[HistoryItem],
                 mesh: Mesh, forms=None):
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        from ..core import conf as conf_mod

        self.pipe = Pipeline(meta, history, forms=forms)
        self.mesh = mesh
        assert mesh.shape.get("sp", 1) == 1, \
            "BatchPipeline shards over dp only; build the mesh spatial=1"
        self._coeffs = self.pipe.coeffs()

        import inspect

        kw = {}
        sig = inspect.signature(shard_map).parameters
        # pallas_call bodies don't carry varying-mesh-axis metadata;
        # replication checking must be off (check_vma on jax>=0.8,
        # check_rep before)
        if "check_vma" in sig:
            kw["check_vma"] = False
        elif "check_rep" in sig:
            kw["check_rep"] = False

        # segmented compile, exactly like the single-chip CompiledPipe:
        # a ~60-module sidecar as ONE monolithic XLA program exhausts
        # the compiler; each segment is its own shard_mapped jit, with
        # the raster-mask/rawdetail carry flowing between them as
        # dp-sharded arrays.
        max_per = conf_mod.get_int("pipe.max_stages_per_jit", 12)
        stages = self.pipe.stages
        weights = [getattr(s.op, "compile_weight", 1) for s in stages]
        if 0 < max_per < sum(weights):
            bounds = []
            a, acc = 0, 0
            for i, wt in enumerate(weights):
                if acc and acc + wt > max_per:
                    bounds.append((a, i))
                    a, acc = i, 0
                acc += wt
            bounds.append((a, len(stages)))
        else:
            bounds = [(0, len(stages))]
        self._bounds = bounds

        def mk_seg(a, b):
            seg = self.pipe.trace_fn(a, b, segmented=True)

            def per_device(xs, coeffs, carry):
                return jax.lax.map(
                    lambda xc: seg(xc[0], coeffs, xc[1]), (xs, carry))

            return jax.jit(shard_map(
                per_device, mesh=mesh,
                in_specs=(P("dp"), P(), P("dp")),
                out_specs=(P("dp"), P("dp")),
                **kw,
            ))

        self._seg_fns = [mk_seg(a, b) for a, b in bounds]

    def __call__(self, raw_batch: np.ndarray) -> jax.Array:
        """raw_batch: (B, H, W) mosaics in sensor units (padded or not).
        B must be a multiple of the dp axis size."""
        spec = self.pipe.spec_in
        if raw_batch.shape[1:] != spec.array_shape:
            raw_batch = np.stack(
                [ops_base.pad_to(r, spec) for r in raw_batch]
            )
        x = jax.device_put(
            jnp.asarray(raw_batch),
            NamedSharding(self.mesh, P("dp", None, None)),
        )
        carry = ({}, None)
        for (a, b), f in zip(self._bounds, self._seg_fns):
            x, carry = f(x, self._coeffs[a:b], carry)
        return x


def spatial_sharded_pipe(meta: RawMeta, history: List[HistoryItem],
                         mesh: Mesh):
    """Single-image pipe with the mosaic row-sharded over ALL mesh devices
    (dp*sp) — the HBM-bound big-image path (45MP+ configs).

    GSPMD partitions the XLA graph and inserts the stencil halo
    exchanges; Pallas kernels cannot be auto-partitioned, so engine
    fusion is forced off for this pipe (the XLA twins of every kernel
    carry the graph)."""
    pipe = Pipeline(meta, history)
    pipe.disable_fusion = True
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
