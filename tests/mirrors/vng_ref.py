"""NumPy mirror of the reference VNG demosaic interior math.

Transcribed (structure, not code) from
`/root/reference/src/iop/demosaic/vng.c` vng_interpolate :33-202 (dcraw
9.20 heritage: `terms`/`chood` tables :38-56, filters4 G1/G2 split
:66-73, per-class code precompute :91-129, gradient accumulation /
threshold / masked neighbour average :131-188, Bayer green mix
:194-198) and the bilinear pre-pass `lin_interpolate`
(`demosaic/basic.c:22-125`: border ring by in-frame color averages,
interior by the weight-lookup 3x3).

The C's brow ring buffer delays each result row by two rows before
writing it back, and the 5x5 read window of row r+1 never reaches the
just-written row r-2 — so the VNG pass reads only lin-interpolated
values and is evaluated here from a frozen copy (provably identical).
Scalar loops on purpose — unambiguous, test-only.
"""

import numpy as np

TERMS = [
    (-2, -2, +0, -1, 1, 0x01), (-2, -2, +0, +0, 2, 0x01),
    (-2, -1, -1, +0, 1, 0x01), (-2, -1, +0, -1, 1, 0x02),
    (-2, -1, +0, +0, 1, 0x03), (-2, -1, +0, +1, 2, 0x01),
    (-2, +0, +0, -1, 1, 0x06), (-2, +0, +0, +0, 2, 0x02),
    (-2, +0, +0, +1, 1, 0x03), (-2, +1, -1, +0, 1, 0x04),
    (-2, +1, +0, -1, 2, 0x04), (-2, +1, +0, +0, 1, 0x06),
    (-2, +1, +0, +1, 1, 0x02), (-2, +2, +0, +0, 2, 0x04),
    (-2, +2, +0, +1, 1, 0x04), (-1, -2, -1, +0, 1, 0x80),
    (-1, -2, +0, -1, 1, 0x01), (-1, -2, +1, -1, 1, 0x01),
    (-1, -2, +1, +0, 2, 0x01), (-1, -1, -1, +1, 1, 0x88),
    (-1, -1, +1, -2, 1, 0x40), (-1, -1, +1, -1, 1, 0x22),
    (-1, -1, +1, +0, 1, 0x33), (-1, -1, +1, +1, 2, 0x11),
    (-1, +0, -1, +2, 1, 0x08), (-1, +0, +0, -1, 1, 0x44),
    (-1, +0, +0, +1, 1, 0x11), (-1, +0, +1, -2, 2, 0x40),
    (-1, +0, +1, -1, 1, 0x66), (-1, +0, +1, +0, 2, 0x22),
    (-1, +0, +1, +1, 1, 0x33), (-1, +0, +1, +2, 2, 0x10),
    (-1, +1, +1, -1, 2, 0x44), (-1, +1, +1, +0, 1, 0x66),
    (-1, +1, +1, +1, 1, 0x22), (-1, +1, +1, +2, 1, 0x10),
    (-1, +2, +0, +1, 1, 0x04), (-1, +2, +1, +0, 2, 0x04),
    (-1, +2, +1, +1, 1, 0x04), (+0, -2, +0, +0, 2, 0x80),
    (+0, -1, +0, +1, 2, 0x88), (+0, -1, +1, -2, 1, 0x40),
    (+0, -1, +1, +0, 1, 0x11), (+0, -1, +2, -2, 1, 0x40),
    (+0, -1, +2, -1, 1, 0x20), (+0, -1, +2, +0, 1, 0x30),
    (+0, -1, +2, +1, 2, 0x10), (+0, +0, +0, +2, 2, 0x08),
    (+0, +0, +2, -2, 2, 0x40), (+0, +0, +2, -1, 1, 0x60),
    (+0, +0, +2, +0, 2, 0x20), (+0, +0, +2, +1, 1, 0x30),
    (+0, +0, +2, +2, 2, 0x10), (+0, +1, +1, +0, 1, 0x44),
    (+0, +1, +1, +2, 1, 0x10), (+0, +1, +2, -1, 2, 0x40),
    (+0, +1, +2, +0, 1, 0x60), (+0, +1, +2, +1, 1, 0x20),
    (+0, +1, +2, +2, 1, 0x10), (+1, -2, +1, +0, 1, 0x80),
    (+1, -1, +1, +1, 1, 0x88), (+1, +0, +1, +2, 1, 0x08),
    (+1, +0, +2, -1, 1, 0x40), (+1, +0, +2, +1, 1, 0x10)]

CHOOD = [(-1, -1), (-1, 0), (-1, +1), (0, +1),
         (+1, +1), (+1, 0), (+1, -1), (0, -1)]


def fc_bayer(filters, row, col):
    """The dcraw FC macro."""
    return (filters >> ((((row << 1) & 14) + (col & 1)) << 1)) & 3


def filters4_of(filters):
    """vng.c:66-73 — split the Bayer greens into colors 1/3."""
    if (filters & 3) == 1:
        return filters | 0x03030303
    return filters | 0x0C0C0C0C


def make_fcol(filters=None, xtrans=None):
    """-> (fcol(r, c), prow, pcol, colors) per vng.c:62-73."""
    if xtrans is not None:
        return (lambda r, c: xtrans[r % 6][c % 6]), 6, 6, 3
    f4 = filters4_of(filters)
    return (lambda r, c: fc_bayer(f4, r, c)), 8, 2, 4


def lin_interpolate(inp, fcol, colors):
    """basic.c:22-125 -> (H, W, 4) float32."""
    H, W = inp.shape
    out = np.zeros((H, W, 4), np.float32)

    # border ring (:28-56): the col==1 jump skips interior columns
    for row in range(H):
        col = 0
        while col < W:
            if col == 1 and 1 <= row < H - 1:
                col = W - 1
            s = [np.float32(0.0)] * 4
            count = [0] * 4
            for y in range(row - 1, row + 2):
                for x in range(col - 1, col + 2):
                    if 0 <= y < H and 0 <= x < W:
                        f = fcol(y, x)
                        s[f] += inp[y, x]
                        count[f] += 1
            f = fcol(row, col)
            for c in range(colors):
                if c != f and count[c]:
                    out[row, col, c] = s[c] / count[c]
                else:
                    out[row, col, c] = inp[row, col]
            col += 1

    # interior by the 3x3 weight lookup (:72-121)
    for row in range(1, H - 1):
        for col in range(1, W - 1):
            f = fcol(row, col)
            s = [np.float32(0.0)] * 4
            wsum = [0] * 4
            for y in (-1, 0, 1):
                for x in (-1, 0, 1):
                    weight = 1 << ((y == 0) + (x == 0))
                    color = fcol(row + y, col + x)
                    if color == f:
                        continue
                    s[color] += inp[row + y, col + x] * np.float32(weight)
                    wsum[color] += weight
            for c in range(colors):
                if c != f:
                    out[row, col, c] = s[c] / np.float32(wsum[c])
            out[row, col, f] = inp[row, col]
    return out


def _codes(fcol, prow, pcol):
    """vng.c:91-129 — per-class decoded term/chood lists."""
    classes = {}
    for row in range(prow):
        for col in range(pcol):
            terms = []
            for (y1, x1, y2, x2, weight, grads) in TERMS:
                color = fcol(row + y1, col + x1)
                if fcol(row + y2, col + x2) != color:
                    continue
                diag = 2 if (fcol(row, col + 1) == color
                             and fcol(row + 1, col) == color) else 1
                if abs(y1 - y2) == diag and abs(x1 - x2) == diag:
                    continue
                gs = [g for g in range(8) if grads & (1 << g)]
                terms.append(((y1, x1, color), (y2, x2, color),
                              weight, gs))
            center = fcol(row, col)
            chood = []
            for (y, x) in CHOOD:
                far = (fcol(row + y, col + x) != center
                       and fcol(row + 2 * y, col + 2 * x) == center)
                chood.append((y, x, far))
            classes[(row, col)] = (terms, chood)
    return classes


def vng_ref(inp, filters=None, xtrans=None, only_linear=False):
    """inp: (H, W) mosaic; filters = dcraw Bayer code OR xtrans = 6x6
    tuple-of-tuples.  -> (H, W, colors’) float32: 4 channels for Bayer
    (G mixed into channel 1 per :194-198, G2 left in channel 3),
    3 for X-Trans."""
    fcol, prow, pcol, colors = make_fcol(filters, xtrans)
    H, W = inp.shape
    f32 = np.float32
    out = lin_interpolate(inp.astype(np.float32), fcol, colors)
    if only_linear:
        return out

    classes = _codes(fcol, prow, pcol)
    vng = out.copy()  # frozen read copy (see module docstring)

    for row in range(2, H - 2):
        for col in range(2, W - 2):
            terms, chood = classes[(row % prow, col % pcol)]
            gval = [f32(0.0)] * 8
            for (t1, t2, weight, gs) in terms:
                y1, x1, c1 = t1
                y2, x2, c2 = t2
                diff = abs(out[row + y1, col + x1, c1]
                           - out[row + y2, col + x2, c2]) * f32(weight)
                for g in gs:
                    gval[g] += diff
            gmin, gmax = min(gval), max(gval)
            if gmax == 0.0:
                continue  # brow copy == identity on vng
            thold = gmin + gmax * f32(0.5)
            color = fcol(row, col)
            s = [f32(0.0)] * 4
            num = 0
            for g, (y, x, far) in enumerate(chood):
                if gval[g] <= thold:
                    for c in range(colors):
                        if c == color and far:
                            s[c] += (out[row, col, c]
                                     + out[row + 2 * y, col + 2 * x, c]
                                     ) * f32(0.5)
                        else:
                            s[c] += out[row + y, col + x, c]
                    num += 1
            for c in range(colors):
                tot = out[row, col, color]
                if c != color:
                    tot += (s[c] - s[color]) / f32(num)
                vng[row, col, c] = tot

    if xtrans is None:
        vng[:, :, 1] = (vng[:, :, 1] + vng[:, :, 3]) / f32(2.0)
    return vng
