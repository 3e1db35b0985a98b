"""Independent scalar-loop transcription of the reference Markesteijn
X-Trans demosaic, used as the oracle for
ansel_tpu/kernels/markesteijn*.py.

Transcribed from `/root/reference/src/iop/demosaic/markesteijn.c`
(xtrans_markesteijn_interpolate :47-523; dcraw 9.20 heritage):
  * allhex construction + hexmap             :53-104, :29-40
  * tile edge mirror/interpolate fill        :136-182
  * gmin/gmax over red/blue pairs            :192-244
  * green interpolation (4 directions)       :246-270
  * multipass: green recalc, solitary-green
    r/b, r<->b, 2x2-green r/b                :273-400
  * YPbPr conversion + directional drv       :411-449
  * homogeneity maps + 5x5 sums + blend      :451-517

Scalar Python loops over flat tile indices ON PURPOSE — slow,
unambiguous, test-only (use small images).  Float32 like the C.
"""

from __future__ import annotations

import numpy as np

TS = 122
ORTH = [1, 0, 0, 1, -1, 0, 0, -1, 1, 0, 0, 1]
PATT = [[0, 1, 0, -1, 2, 0, -1, 0, 1, 1, 1, -1, 0, 0, 0, 0],
        [0, 1, 0, -2, 1, 0, -2, 0, 1, 1, -2, -2, 1, -1, -1, 1]]
DIR4 = [1, TS, TS + 1, TS - 1]


def build_allhex(xtrans):
    """allhex[3][3][8] of flat tile offsets + (sgrow, sgcol)."""
    allhex = np.zeros((3, 3, 8), np.int32)
    sgrow = sgcol = 0
    for row in range(3):
        for col in range(3):
            ng = 0
            for d in range(0, 10, 2):
                g = 1 if xtrans[row % 6][col % 6] == 1 else 0
                if xtrans[(row + ORTH[d]) % 6][(col + ORTH[d + 2]) % 6] == 1:
                    ng = 0
                else:
                    ng += 1
                if ng == 4:
                    sgrow, sgcol = row, col
                if ng == g + 1:
                    for c in range(8):
                        v = ORTH[d] * PATT[g][c * 2] \
                            + ORTH[d + 1] * PATT[g][c * 2 + 1]
                        h = ORTH[d + 2] * PATT[g][c * 2] \
                            + ORTH[d + 3] * PATT[g][c * 2 + 1]
                        allhex[row][col][c ^ (g * 2 & d)] = h + v * TS
    return allhex, sgrow, sgcol


def _hexmap(row, col, allhex):
    return allhex[(row + 600) % 3][(col + 600) % 3]


def _translate(n, size):
    return (2 * size - n - 2) if n >= size else abs(n)


def markesteijn(raw, xtrans, passes=1, debug=None):
    """raw (H, W) float mosaic -> (H, W, 3) camera RGB."""
    raw = np.asarray(raw, np.float32)
    height, width = raw.shape
    fc = lambda r, c: xtrans[r % 6][c % 6]  # noqa: E731
    allhex, sgrow, sgcol = build_allhex(xtrans)
    ndir = 4 << (1 if passes > 1 else 0)
    pad_tile = 12 if passes == 1 else 17
    out = np.zeros((height, width, 3), np.float32)

    top = -pad_tile
    while top < height - pad_tile:
        left = -pad_tile
        while left < width - pad_tile:
            mrow = min(top + TS, height + pad_tile)
            mcol = min(left + TS, width + pad_tile)
            rgb = np.zeros((ndir, TS, TS, 3), np.float32)
            # ------------------------------------------------ tile fill
            for row in range(top, mrow):
                for col in range(left, mcol):
                    if 0 <= col < width and 0 <= row < height:
                        f = fc(row, col)
                        rgb[0, row - top, col - left, f] = raw[row, col]
                    else:
                        c = fc(row, col)
                        cy, cx = _translate(row, height), _translate(col, width)
                        if c == fc(cy, cx):
                            rgb[0, row - top, col - left, c] = raw[cy, cx]
                        else:
                            ssum = cnt = 0
                            for y in range(row - 1, row + 2):
                                for x in range(col - 1, col + 2):
                                    yy = _translate(y, height)
                                    xx = _translate(x, width)
                                    if fc(yy, xx) == c:
                                        ssum += raw[yy, xx]
                                        cnt += 1
                            rgb[0, row - top, col - left, c] = ssum / cnt
            for c in range(1, 4):
                rgb[c] = rgb[0]

            rgbf = rgb.reshape(ndir * TS * TS, 3)  # flat C-layout view

            # --------------------------------------------- gmin / gmax
            gmin = np.zeros((TS, TS), np.float32)
            gmax = np.zeros((TS, TS), np.float32)
            # NOTE: the C mutates `row` INSIDE the column loop (zigzag
            # over vertical red/blue pairs) — keep one row variable and
            # the exact for-loop structure (markesteijn.c:197-244)
            pad = 3
            row = top + pad
            while row < mrow - pad:
                mn, mx = np.finfo(np.float32).max, 0.0
                col = left + pad
                while col < mcol - pad:
                    if fc(row, col) == 1:
                        mn, mx = np.finfo(np.float32).max, 0.0
                        col += 1
                        continue
                    if mx == 0.0:
                        hexo = _hexmap(row, col, allhex)
                        base = (row - top) * TS + (col - left)
                        for c in range(6):
                            val = rgbf[base + hexo[c], 1]
                            mn = min(mn, val)
                            mx = max(mx, val)
                    gmin[row - top, col - left] = mn
                    gmax[row - top, col - left] = mx
                    # C modulo: negative dividends give negative remainders,
                    # matching NEITHER switch case (markesteijn.c:232-243)
                    m = int(np.fmod(row - sgrow, 3))
                    if m == 1:
                        if row < mrow - 4:
                            row += 1
                            col -= 1
                    elif m == 2:
                        mn, mx = np.finfo(np.float32).max, 0.0
                        col += 2
                        if col < mcol - 4 and row > top + 3:
                            row -= 1
                        col += 1
                        continue
                    col += 1
                row += 1

            if debug is not None:
                debug["gmin"] = gmin.copy()
                debug["gmax"] = gmax.copy()

            # ------------------------------------ green interpolation
            pad = 3
            for row in range(top + pad, mrow - pad):
                for col in range(left + pad, mcol - pad):
                    f = fc(row, col)
                    if f == 1:
                        continue
                    hexo = _hexmap(row, col, allhex)
                    base = (row - top) * TS + (col - left)
                    px = lambda k, ch: rgbf[base + k, ch]  # noqa: E731
                    color = np.zeros(8, np.float32)
                    color[0] = (0.6796875 * (px(hexo[1], 1) + px(hexo[0], 1))
                                - 0.1796875 * (px(2 * hexo[1], 1)
                                               + px(2 * hexo[0], 1)))
                    color[1] = (0.87109375 * px(hexo[3], 1)
                                + px(hexo[2], 1) * 0.13
                                + 0.359375 * (px(0, f) - px(-hexo[2], f)))
                    for c in range(2):
                        color[2 + c] = (
                            0.640625 * px(hexo[4 + c], 1)
                            + 0.359375 * px(-2 * hexo[4 + c], 1)
                            + 0.12890625 * (2 * px(0, f)
                                            - px(3 * hexo[4 + c], f)
                                            - px(-3 * hexo[4 + c], f)))
                    for c in range(4):
                        d = c ^ (0 if (row - sgrow) % 3 else 1)
                        rgb[d, row - top, col - left, 1] = np.clip(
                            color[c], gmin[row - top, col - left],
                            gmax[row - top, col - left])

            # ----------------------------------------- multipass loop
            rgb_base = 0
            for p_i in range(passes):
                if p_i == 1:
                    rgb[4:8] = rgb[0:4]
                    rgb_base = 4 * TS * TS

                if p_i:
                    padg = 6
                    for row in range(top + padg, mrow - padg):
                        for col in range(left + padg, mcol - padg):
                            f = fc(row, col)
                            if f == 1:
                                continue
                            hexo = _hexmap(row, col, allhex)
                            for d in range(3, 6):
                                dd = (d - 2) ^ (0 if (row - sgrow) % 3
                                                else 1)
                                base = (rgb_base + dd * TS * TS
                                        + (row - top) * TS + (col - left))
                                val = (rgbf[base - 2 * hexo[d], 1]
                                       + 2 * rgbf[base + hexo[d], 1]
                                       - rgbf[base - 2 * hexo[d], f]
                                       - 2 * rgbf[base + hexo[d], f]
                                       + 3 * rgbf[base, f])
                                rgbf[base, 1] = np.clip(
                                    val / 3.0,
                                    gmin[row - top, col - left],
                                    gmax[row - top, col - left])

                # solitary green pixels: interpolate r/b
                pad_rb_g = 6 if passes == 1 else 5
                # C integer division truncates toward zero
                row = int((top - sgrow + pad_rb_g + 2) / 3) * 3 + sgrow
                while row < mrow - pad_rb_g:
                    col = int((left - sgcol + pad_rb_g + 2) / 3) * 3 + sgcol
                    while col < mcol - pad_rb_g:
                        base0 = (rgb_base + (row - top) * TS
                                 + (col - left))
                        h = fc(row, col + 1)
                        diff = np.zeros(6, np.float32)
                        color = np.zeros((2, 6), np.float32)
                        base = base0
                        i = 1
                        d = 0
                        while d < 6:
                            for c in range(2):
                                g = (2 * rgbf[base, 1]
                                     - rgbf[base + (i << c), 1]
                                     - rgbf[base - (i << c), 1])
                                color[0 if h == 0 else 1, d] = (
                                    g + rgbf[base + (i << c), h]
                                    + rgbf[base - (i << c), h])
                                if d > 1:
                                    diff[d] += (
                                        (rgbf[base + (i << c), 1]
                                         - rgbf[base - (i << c), 1]
                                         - rgbf[base + (i << c), h]
                                         + rgbf[base - (i << c), h]) ** 2
                                        + g * g)
                                h ^= 2
                            if d < 2 or (d & 1):
                                d_out = d - (1 if (d > 1
                                            and diff[d - 1] < diff[d])
                                             else 0)
                                rgbf[base, 0] = color[0][d_out] / 2.0
                                rgbf[base, 2] = color[1][d_out] / 2.0
                                base += TS * TS
                            d += 1
                            i ^= TS ^ 1
                            h ^= 2
                        col += 3
                    row += 3

                # red for blue pixels and vice versa
                pad_rb_br = 6 if passes == 1 else 5
                for row in range(top + pad_rb_br, mrow - pad_rb_br):
                    for col in range(left + pad_rb_br, mcol - pad_rb_br):
                        f = 2 - fc(row, col)
                        if f == 1:
                            continue
                        c = TS if (row - sgrow) % 3 else 1
                        hh = 3 * (c ^ TS ^ 1)
                        base = (rgb_base + (row - top) * TS + (col - left))
                        for d in range(4):
                            if (d > 1 or ((d ^ c) & 1)
                                or ((abs(rgbf[base, 1] - rgbf[base + c, 1])
                                     + abs(rgbf[base, 1]
                                           - rgbf[base - c, 1]))
                                    < 2.0 * (abs(rgbf[base, 1]
                                                 - rgbf[base + hh, 1])
                                             + abs(rgbf[base, 1]
                                                   - rgbf[base - hh, 1])))):
                                i = c
                            else:
                                i = hh
                            rgbf[base, f] = (
                                rgbf[base + i, f] + rgbf[base - i, f]
                                + 2.0 * rgbf[base, 1]
                                - rgbf[base + i, 1]
                                - rgbf[base - i, 1]) / 2.0
                            base += TS * TS

                # fill r/b for 2x2 blocks of green
                pad_g22 = 8 if passes == 1 else 4
                for row in range(top + pad_g22, mrow - pad_g22):
                    if not (row - sgrow) % 3:
                        continue
                    for col in range(left + pad_g22, mcol - pad_g22):
                        if not (col - sgcol) % 3:
                            continue
                        hexo = _hexmap(row, col, allhex)
                        base = (rgb_base + (row - top) * TS + (col - left))
                        # d steps by 2 but the buffer advances ONE tile
                        # per iteration (markesteijn.c:386: d += 2,
                        # rfx += TS * TS)
                        for d in range(0, ndir, 2):
                            if hexo[d] + hexo[d + 1]:
                                g = (3.0 * rgbf[base, 1]
                                     - 2.0 * rgbf[base + hexo[d], 1]
                                     - rgbf[base + hexo[d + 1], 1])
                                for c in range(0, 4, 2):
                                    rgbf[base, c] = (
                                        g + 2.0 * rgbf[base + hexo[d], c]
                                        + rgbf[base + hexo[d + 1], c]) / 3.0
                            else:
                                g = (2.0 * rgbf[base, 1]
                                     - rgbf[base + hexo[d], 1]
                                     - rgbf[base + hexo[d + 1], 1])
                                for c in range(0, 4, 2):
                                    rgbf[base, c] = (
                                        g + rgbf[base + hexo[d], c]
                                        + rgbf[base + hexo[d + 1], c]) / 2.0
                            base += TS * TS

            # ------------------------- YPbPr + directional derivatives
            mrow_t = mrow - top
            mcol_t = mcol - left
            yuv = np.zeros((3, TS, TS), np.float32)
            drv = np.zeros((ndir, TS, TS), np.float32)
            yuvf = yuv.reshape(3, TS * TS)
            for d in range(ndir):
                pad_yuv = 8 if passes == 1 else 13
                for row in range(pad_yuv, mrow_t - pad_yuv):
                    for col in range(pad_yuv, mcol_t - pad_yuv):
                        rx = rgb[d, row, col]
                        y = (0.2627 * rx[0] + 0.6780 * rx[1]
                             + 0.0593 * rx[2])
                        yuv[0, row, col] = y
                        yuv[1, row, col] = (rx[2] - y) * 0.56433
                        yuv[2, row, col] = (rx[0] - y) * 0.67815
                f = DIR4[d & 3]
                pad_drv = 9 if passes == 1 else 14
                for row in range(pad_drv, mrow_t - pad_drv):
                    for col in range(pad_drv, mcol_t - pad_drv):
                        k = row * TS + col
                        drv[d, row, col] = (
                            (2 * yuvf[0, k] - yuvf[0, k + f]
                             - yuvf[0, k - f]) ** 2
                            + (2 * yuvf[1, k] - yuvf[1, k + f]
                               - yuvf[1, k - f]) ** 2
                            + (2 * yuvf[2, k] - yuvf[2, k + f]
                               - yuvf[2, k - f]) ** 2)

            # ------------------------------------------- homogeneity
            homo = np.zeros((ndir, TS, TS), np.int32)
            pad_homo = 10 if passes == 1 else 15
            for row in range(pad_homo, mrow_t - pad_homo):
                for col in range(pad_homo, mcol_t - pad_homo):
                    tr = drv[:, row, col].min() * 8.0
                    for d in range(ndir):
                        homo[d, row, col] = int(
                            (drv[d, row - 1:row + 2, col - 1:col + 2]
                             <= tr).sum())

            homosum = np.zeros((ndir, TS, TS), np.int32)
            for d in range(ndir):
                for row in range(pad_tile, mrow_t - pad_tile):
                    for col in range(pad_tile, mcol_t - pad_tile):
                        homosum[d, row, col] = homo[
                            d, row - 2:row + 3, col - 2:col + 3].sum()

            # --------------------------------------------- final blend
            for row in range(pad_tile, mrow_t - pad_tile):
                for col in range(pad_tile, mcol_t - pad_tile):
                    hm = [int(homosum[d, row, col]) for d in range(ndir)]
                    maxval = max(hm)
                    maxval -= maxval >> 3
                    if ndir > 4:
                        for d in range(ndir - 4):
                            if hm[d] < hm[d + 4]:
                                hm[d] = 0
                            elif hm[d] > hm[d + 4]:
                                hm[d + 4] = 0
                    avg = np.zeros(4, np.float32)
                    for d in range(ndir):
                        if hm[d] >= maxval:
                            avg[:3] += rgb[d, row, col]
                            avg[3] += 1
                    out[row + top, col + left] = avg[:3] / avg[3]
            left += TS - pad_tile * 2
        top += TS - pad_tile * 2
    return out
