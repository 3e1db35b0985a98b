"""Non-local-means as a Pallas TPU kernel.

Behavioral reference: `/root/reference/src/pixel/nlmeans_core.c` (patch-SSD
weighted average over the search lattice; iop weighting :405, denoiseprofile
weighting :417-423).  The XLA scan formulation (pixel/nlmeans.py) pays ~9
full-plane HBM round trips per search offset — 225 offsets x ~2 GB ≈ 450 GB
of traffic ≈ 1 s/instance at 24 MP.  Here each grid step DMAs one haloed
tile into VMEM and runs every offset on the resident tile: one HBM read +
one write total, VPU-bound.

Search offsets (incl. the scatter lattice) are static Python values, but a
fully static 225-body unroll blows Mosaic's 16MB scoped-VMEM stack, so both
kernels walk the offsets with `fori_loop` + dynamic `pltpu.roll` shifts
(wrap garbage stays in the discarded halo, the rcd_pallas halo-tile
pattern); the grouped variant hoists one static lane shift per distinct dx
and rolls only sublanes per dy.  Traced scalars (sharpness, center-weight)
ride the SMEM consts vector.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pixel.fastmath import dt_fast_mexp2f

TILE_H = 64             # default; see nlm_pallas(tile_h=, tile_w=)
TILE_W = 512
BORDER_W = 128          # lane-aligned halo; max |dx| + P must fit


def _round_up(v, m):
    return -(-int(v) // m) * m


def _kernel(consts_ref, off_ref, hbm_ref, o0_ref, o1_ref, o2_ref, tile,
            sem, *, n_off, P, variant, bh, bw, th, tw):
    i = pl.program_id(0)
    j = pl.program_id(1)
    buf_h, buf_w = th + 2 * bh, tw + 2 * bw
    copy = pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(i * th, buf_h), pl.ds(j * tw, buf_w)],
        tile, sem)
    copy.start()
    copy.wait()
    x0, x1, x2 = tile[0], tile[1], tile[2]
    sharp = consts_ref[0]
    cp_norm = consts_ref[1]
    inv1cw = consts_ref[2]
    norm = (consts_ref[3], consts_ref[4], consts_ref[5])

    # center crop used for the SSD (tile + P ring)
    ch, cw_ = th + 2 * P, tw + 2 * P
    cs = (slice(bh - P, bh - P + ch), slice(bw - P, bw - P + cw_))
    c0, c1, c2 = x0[cs], x1[cs], x2[cs]
    ts = (slice(P, P + th), slice(P, P + tw))
    ks = (slice(bh, bh + th), slice(bw, bw + tw))

    # fori_loop with SMEM offsets + dynamic rolls: a fully unrolled
    # offset loop (up to 225 stamps) blows the kernel's scoped-VMEM
    # stack; the rolled loop keeps one offset's temporaries live
    def body(k, carry):
        acc0, acc1, acc2, wsum = carry
        dy = off_ref[k, 0]
        dx = off_ref[k, 1]
        s0 = pltpu.roll(pltpu.roll(x0, -dy, 0), -dx, 1)
        s1 = pltpu.roll(pltpu.roll(x1, -dy, 0), -dx, 1)
        s2 = pltpu.roll(pltpu.roll(x2, -dy, 0), -dx, 1)
        d2 = (norm[0] * (c0 - s0[cs]) ** 2
              + norm[1] * (c1 - s1[cs]) ** 2
              + norm[2] * (c2 - s2[cs]) ** 2)
        # patch sum, separable static slices (2P+1 taps per axis)
        r = None
        for a in range(2 * P + 1):
            t = d2[a:a + th, :]
            r = t if r is None else r + t
        ssd = None
        for b in range(2 * P + 1):
            t = r[:, b:b + tw]
            ssd = t if ssd is None else ssd + t
        if variant == 0:      # iop nlmeans (nlmeans_core.c:405)
            w = dt_fast_mexp2f(ssd * sharp)   # gh() = dt_fast_mexp2f
        else:                 # denoiseprofile (nlmeans_core.c:417-423)
            dis = (ssd + d2[ts] * cp_norm) * inv1cw
            w = dt_fast_mexp2f(jnp.maximum(0.0, dis * sharp - 2.0))
        return (acc0 + s0[ks] * w, acc1 + s1[ks] * w,
                acc2 + s2[ks] * w, wsum + w)

    z = jnp.zeros((th, tw), jnp.float32)
    acc0, acc1, acc2, wsum = jax.lax.fori_loop(
        0, n_off, body, (z, z, z, z))
    inv = 1.0 / jnp.maximum(wsum, 1e-12)
    o0_ref[:] = acc0 * inv
    o1_ref[:] = acc1 * inv
    o2_ref[:] = acc2 * inv


def _kernel_grouped(consts_ref, dys_ref, hbm_ref, o0_ref, o1_ref, o2_ref,
                    tile, sem, *, groups, P, variant, bh, bw, th, tw):
    """Offsets grouped by their static dx: per group ONE static lane-shifted
    view of each channel is hoisted, then a fori_loop walks that group's dy
    list (SMEM) with ONE dynamic SUBLANE roll per channel — Mosaic rejects
    dynamic-start vector loads whose sublane offset it can't prove 8-aligned
    ("cannot statically prove that index in dimension 1 is a multiple of 8"),
    so the row shift must be a `pltpu.roll` (tpu.dynamic_rotate), which is
    legal for any shift.  vs the plain rolled kernel this still halves the
    rotate work (3 sublane rolls on the lane-cropped buffer instead of 6
    full-buffer lane+sublane rolls per offset) while keeping per-iteration
    temporaries bounded (the fully static unroll OOMs the 16MB scoped-VMEM
    stack: 225 live loop bodies).

    groups: static tuple of (dx, start, count) into the flat dys vector.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    buf_h, buf_w = th + 2 * bh, tw + 2 * bw
    copy = pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(i * th, buf_h), pl.ds(j * tw, buf_w)],
        tile, sem)
    copy.start()
    copy.wait()
    x0, x1, x2 = tile[0], tile[1], tile[2]
    sharp = consts_ref[0]
    cp_norm = consts_ref[1]
    inv1cw = consts_ref[2]
    norm = (consts_ref[3], consts_ref[4], consts_ref[5])

    ch, cw_ = th + 2 * P, tw + 2 * P
    c0 = x0[bh - P:bh - P + ch, bw - P:bw - P + cw_]
    c1 = x1[bh - P:bh - P + ch, bw - P:bw - P + cw_]
    c2 = x2[bh - P:bh - P + ch, bw - P:bw - P + cw_]

    z = jnp.zeros((th, tw), jnp.float32)
    carry = (z, z, z, z)
    rs = slice(bh - P, bh - P + ch)
    for dx, start, count in groups:
        xs = bw - P + dx          # static lane offset, hoisted per group
        g0 = x0[:, xs:xs + cw_]
        g1 = x1[:, xs:xs + cw_]
        g2 = x2[:, xs:xs + cw_]

        def body(k, carry, g0=g0, g1=g1, g2=g2, start=start):
            acc0, acc1, acc2, wsum = carry
            dy = dys_ref[start + k]
            # dynamic sublane roll (legal for any shift) + static row crop;
            # wrap garbage stays in the discarded halo rows
            s0 = pltpu.roll(g0, -dy, 0)[rs]
            s1 = pltpu.roll(g1, -dy, 0)[rs]
            s2 = pltpu.roll(g2, -dy, 0)[rs]
            d2 = (norm[0] * (c0 - s0) ** 2 + norm[1] * (c1 - s1) ** 2
                  + norm[2] * (c2 - s2) ** 2)
            r = None
            for a in range(2 * P + 1):
                t = d2[a:a + th, :]
                r = t if r is None else r + t
            ssd = None
            for b in range(2 * P + 1):
                t = r[:, b:b + tw]
                ssd = t if ssd is None else ssd + t
            if variant == 0:
                w = dt_fast_mexp2f(ssd * sharp)   # gh(), bit-exact
            else:
                dis = (ssd + d2[P:P + th, P:P + tw] * cp_norm) \
                    * inv1cw
                w = dt_fast_mexp2f(jnp.maximum(0.0, dis * sharp - 2.0))
            return (acc0 + s0[P:P + th, P:P + tw] * w,
                    acc1 + s1[P:P + th, P:P + tw] * w,
                    acc2 + s2[P:P + th, P:P + tw] * w,
                    wsum + w)

        carry = jax.lax.fori_loop(0, count, body, carry)
    acc0, acc1, acc2, wsum = carry
    inv = 1.0 / jnp.maximum(wsum, 1e-12)
    o0_ref[:] = acc0 * inv
    o1_ref[:] = acc1 * inv
    o2_ref[:] = acc2 * inv


@functools.partial(jax.jit, static_argnames=(
    "offsets", "P", "variant", "interpret", "static_unroll",
    "tile_h", "tile_w"))
def nlm_pallas(img, offsets, P: int, norm, sharpness, cp_norm, inv1cw,
               variant: int, interpret: bool = False,
               static_unroll: bool = True, tile_h: int = 128,
               tile_w: int = 512):
    """img (3, H, W); offsets: static tuple of (dy, dx); P: patch radius;
    norm: per-channel SSD weights (traced ok); sharpness/cp_norm/inv1cw:
    traced scalars.  -> weighted patch average (3, H, W).

    tile_h/tile_w: output block.  128x512 is the measured sweet spot at
    24MP on a v5e chip: bigger tiles cut the halo fraction but 256x512
    (and 128x1024 at P=2) exceed the 16MB scoped-VMEM limit — the cost
    is dominated by the per-offset center math anyway, so the tile
    choice moves the total only a few percent."""
    _, h, w = img.shape
    th, tw = tile_h, tile_w
    m = max((max(abs(o[0]), abs(o[1])) for o in offsets), default=0)
    bh = _round_up(m + P, 8)
    bw = BORDER_W
    assert m + P <= bw, (m, P)
    nh, nw = -(-h // th), -(-w // tw)
    pad_b = nh * th + 2 * bh - (h + bh)
    pad_r = nw * tw + 2 * bw - (w + bw)
    xp = jnp.pad(img, ((0, 0), (bh, pad_b), (bw, pad_r)), mode="edge")
    nrm = jnp.ravel(jnp.asarray(norm, jnp.float32))[:3]
    consts = jnp.concatenate([
        jnp.stack([jnp.asarray(sharpness, jnp.float32),
                   jnp.asarray(cp_norm, jnp.float32),
                   jnp.asarray(inv1cw, jnp.float32)]), nrm])
    off = jnp.asarray(list(offsets), jnp.int32).reshape(len(offsets), 2)

    out_shape = [jax.ShapeDtypeStruct((nh * th, nw * tw),
                                      jnp.float32)] * 3
    out_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((3, th + 2 * bh, tw + 2 * bw), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if static_unroll:
        by_dx = {}
        for dy, dx in offsets:
            by_dx.setdefault(dx, []).append(dy)
        groups, flat = [], []
        for dx in sorted(by_dx):
            groups.append((dx, len(flat), len(by_dx[dx])))
            flat.extend(sorted(by_dx[dx]))
        dys = jnp.asarray(flat, jnp.int32)
        kern = functools.partial(_kernel_grouped, groups=tuple(groups),
                                 P=P, variant=variant, bh=bh, bw=bw,
                                 th=th, tw=tw)
        o0, o1, o2 = pl.pallas_call(
            kern,
            grid=(nh, nw),
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=[out_spec] * 3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(consts, dys, xp)
        return jnp.stack([o0[:h, :w], o1[:h, :w], o2[:h, :w]])
    kern = functools.partial(_kernel, n_off=len(offsets), P=P,
                             variant=variant, bh=bh, bw=bw, th=th, tw=tw)
    o0, o1, o2 = pl.pallas_call(
        kern,
        grid=(nh, nw),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[out_spec] * 3,
        scratch_shapes=scratch,
        interpret=interpret,
    )(consts, off, xp)
    return jnp.stack([o0[:h, :w], o1[:h, :w], o2[:h, :w]])
