"""Windowed application of drawn-mask tools (clone / heal / blur / fill).

The reference applies each form's tool only over the form's region
(per-form ROI: `src/iop/retouch.c` rt_process_forms computes the form
area, `src/pixel/heal.c:314` solves only the passed window).  Round 2
applied every tool to the full 24 MP plane — a ~300 px healing spot paid
a full-image 3-level Jacobi solve.  Here: the form's support bbox is
computed host-side (masks.form_bbox), the tool runs on a clamped static
window, and the result is pasted back with a static update-slice.
"""

from __future__ import annotations

from ..pipeline import masks as mk

# forms larger than this fraction of the plane gain nothing from
# windowing — fall back to the full-plane path
MAX_AREA_FRAC = 0.5


def plan_window(form, forms, spec, dy: int = 0, dx: int = 0,
                margin: int = 16):
    """-> (y0, y1, x0, x1) static window containing the form's support
    plus `margin`, clamped so that BOTH the window and its clone-source
    window (shifted by (dy, dx)) stay inside the image — or None when
    the support is unbounded / too large (caller uses the full plane).
    Computed at plan time; the result is baked into OpPlan.static."""
    H, W = spec.array_shape[-2], spec.array_shape[-1]
    box = mk.form_bbox(form, forms, spec.height, spec.width)
    if box is None:
        return None
    y0, y1, x0, x1 = box
    y0 -= margin
    x0 -= margin
    y1 += margin
    x1 += margin
    y0 = max(y0, 0, -dy)
    x0 = max(x0, 0, -dx)
    y1 = min(y1, H, H - dy)
    x1 = min(x1, W, W - dx)
    if y1 - y0 < 2 or x1 - x0 < 2:
        return None
    if (y1 - y0) * (x1 - x0) > MAX_AREA_FRAC * H * W:
        return None
    return (int(y0), int(y1), int(x0), int(x1))


def apply_windowed(x, form, forms, spec, win, tool, dy: int = 0,
                   dx: int = 0):
    """Run `tool(dst_win, src_win, mask_win) -> healed_win` on the static
    window `win` of x (C, H, W) and paste the result back.  src_win is
    the clone-source window (offset (dy, dx)); when (dy, dx) == (0, 0)
    src_win is dst_win."""
    y0, y1, x0, x1 = win
    dst = x[:, y0:y1, x0:x1]
    src = dst if (dy == 0 and dx == 0) else \
        x[:, y0 + dy:y1 + dy, x0 + dx:x1 + dx]
    m = mk.rasterize(form, forms, y1 - y0, x1 - x0,
                     norm_h=spec.height, norm_w=spec.width,
                     origin=(y0, x0))
    out = tool(dst, src, m)
    return x.at[:, y0:y1, x0:x1].set(out)
