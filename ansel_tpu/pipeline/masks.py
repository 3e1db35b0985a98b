"""Drawn (vector) masks: circle / ellipse / gradient / path / brush /
group, rasterized in-graph.

Reference: `/root/reference/src/develop/masks.h` (node structs :234-291,
type enum :134-145, states :171-181, DEVELOP_MASKS_VERSION 6) and
`src/develop/masks/{circle,ellipse,gradient,polygon,brush,group}.c`:
  - circle falloff (circle.c:_circle_get_mask — quadratic f^2 between
    radius and radius+border),
  - ellipse projection falloff (ellipse.c:_fill_mask),
  - gradient 0.5+0.5*erf((y' - curvature x'^2)/extent) (gradient.c),
  - group combine (group.c:310-410 — union=max, intersection=min,
    difference=b1(1-b2), exclusion=max((1-b1)b2, b1(1-b2))).

TPU-first: the reference rasterizes shapes into CPU buffers per ROI;
here shapes evaluate analytically over an iota grid inside the jit
graph (XLA folds the constant geometry).  Shape parameters are
trace-time constants, so a shape edit recompiles the blend stage —
the node values are part of the compile signature (form_signature).
Path/brush outlines are sampled host-side into polylines and evaluated
with a `lax.scan` over edges.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# dt_masks_type_t (masks.h:134-145)
MASK_CIRCLE = 1 << 0
MASK_POLYGON = 1 << 1
MASK_GROUP = 1 << 2
MASK_CLONE = 1 << 3
MASK_GRADIENT = 1 << 4
MASK_ELLIPSE = 1 << 5
MASK_BRUSH = 1 << 6

# dt_masks_points_states_t (masks.h:171-181)
STATE_INVERSE = 1 << 2
STATE_UNION = 1 << 3
STATE_INTERSECTION = 1 << 4
STATE_DIFFERENCE = 1 << 5
STATE_EXCLUSION = 1 << 6

ELLIPSE_PROPORTIONAL = 1  # dt_masks_ellipse_flags_t
GRADIENT_LINEAR = 0

MASKS_VERSION = 6


@dataclasses.dataclass
class Form:
    """One mask form (dt_masks_form_t analog)."""

    id: int
    type: int
    name: str = ""
    version: int = MASKS_VERSION
    nodes: List[tuple] = dataclasses.field(default_factory=list)
    # clone-source position in normalized coords (dt_masks_form_t.source,
    # serialized as the XMP mask_src blob)
    src: tuple = (0.0, 0.0)

    def points_blob(self) -> bytes:
        fmt, _ = _NODE_CODECS[_base_type(self.type)]
        return b"".join(struct.pack(fmt, *n) for n in self.nodes)

    def src_blob(self) -> bytes:
        return struct.pack("<2f", *self.src)


# struct formats per node type (masks.h:234-291)
_NODE_CODECS = {
    MASK_CIRCLE: ("<4f", 4),            # cx, cy, radius, border
    MASK_ELLIPSE: ("<6fi", 7),          # cx, cy, rx, ry, rotation, border, flags
    MASK_POLYGON: ("<8fi", 9),          # node2 ctrl1_2 ctrl2_2 border2 state
    MASK_BRUSH: ("<10fi", 11),          # ... + density, hardness, state
    MASK_GRADIENT: ("<6fi", 7),         # cx, cy, rotation, extent, steepness,
                                        # curvature, state
    MASK_GROUP: ("<3if", 4),            # formid, parentid, state, opacity
}


def _base_type(t: int) -> int:
    return t & (MASK_CIRCLE | MASK_POLYGON | MASK_GROUP | MASK_GRADIENT
                | MASK_ELLIPSE | MASK_BRUSH)


def decode_points(mask_type: int, blob: bytes, nb: int) -> List[tuple]:
    fmt, _n = _NODE_CODECS[_base_type(mask_type)]
    size = struct.calcsize(fmt)
    out = []
    for i in range(nb):
        chunk = blob[i * size:(i + 1) * size]
        if len(chunk) < size:
            break
        out.append(struct.unpack(fmt, chunk))
    return out


# --- device rasterizers ------------------------------------------------------


def _grid(H: int, W: int, origin=(0, 0)):
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + float(origin[0])
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + float(origin[1])
    return x, y


def _circle_mask(node, H, W, nh, nw, origin=(0, 0)):
    cx, cy, radius, border = (jnp.float32(v) for v in node[:4])
    x, y = _grid(H, W, origin)
    mind = float(min(nw, nh))
    l2 = (x - cx * nw) ** 2 + (y - cy * nh) ** 2
    r2 = (radius * mind) ** 2
    t2 = ((radius + border) * mind) ** 2
    f = jnp.clip((t2 - l2) / jnp.maximum(t2 - r2, 1e-9), 0.0, 1.0)
    return f * f


def _ellipse_mask(node, H, W, nh, nw, origin=(0, 0)):
    cx, cy, r0, r1, rotation, border = (jnp.float32(v) for v in node[:6])
    flags = int(node[6])
    x, y = _grid(H, W, origin)
    mind = float(min(nw, nh))
    xr = x - cx * nw
    yr = y - cy * nh
    if flags & ELLIPSE_PROPORTIONAL:
        t0, t1 = r0 * (1.0 + border), r1 * (1.0 + border)
    else:
        t0, t1 = r0 + border, r1 + border
    # axis ordering + rotation convention (ellipse.c:_ellipse_get_mask)
    swap = r0 < r1
    a = jnp.where(swap, r1, r0) * mind
    b = jnp.where(swap, r0, r1) * mind
    ta = jnp.where(swap, t1, t0) * mind
    tb = jnp.where(swap, t0, t1) * mind
    alpha = jnp.where(swap, rotation - 90.0, rotation) * (np.pi / 180.0)
    l2 = xr * xr + yr * yr
    l = jnp.sqrt(l2)
    inv = jnp.where(l > 0, 1.0 / jnp.maximum(l, 1e-20), 0.0)
    xn = xr * inv
    yn = jnp.where(l > 0, yr * inv, 1.0)
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    xrot = xn * ca + yn * sa
    yrot = -xn * sa + yn * ca
    cosv2, sinv2 = xrot * xrot, yrot * yrot
    radius2 = a * a * b * b / (a * a * sinv2 + b * b * cosv2)
    total2 = ta * ta * tb * tb / (ta * ta * sinv2 + tb * tb * cosv2)
    f = jnp.clip((total2 - l2) / jnp.maximum(total2 - radius2, 1e-9),
                 0.0, 1.0)
    return f * f


def _gradient_mask(node, H, W, nh, nw, origin=(0, 0)):
    cx, cy, rotation, extent, _steep, curvature = (
        jnp.float32(v) for v in node[:6])
    state = int(node[6])
    x, y = _grid(H, W, origin)
    hwscale = 1.0 / float(np.hypot(nw, nh))
    v = -rotation / 180.0 * np.pi
    sinv, cosv = jnp.sin(v), jnp.cos(v)
    xoff = cosv * cx * nw + sinv * cy * nh
    yoff = sinv * cx * nw - cosv * cy * nh
    ext = jnp.maximum(extent, 0.001)
    x0 = (cosv * x + sinv * y - xoff) * hwscale
    y0 = (sinv * x - cosv * y - yoff) * hwscale
    distance = y0 - curvature * x0 * x0
    if state == GRADIENT_LINEAR:
        val = 0.5 + 0.5 * distance / ext
    else:
        val = 0.5 + 0.5 * jax.scipy.special.erf(distance / ext)
    return jnp.clip(val, 0.0, 1.0)


def _bezier_polyline(nodes, nh, nw, samples_per_seg: int = 20):
    """Host-side: sample the closed cubic-bezier outline (and the border
    distances) into numpy arrays.  Coordinates are normalized -> pixels."""
    pts = []
    borders = []
    n = len(nodes)
    for i in range(n):
        p0 = np.array(nodes[i][0:2])
        c1 = np.array(nodes[i][4:6])          # ctrl2 of current
        nxt = nodes[(i + 1) % n]
        c2 = np.array(nxt[2:4])               # ctrl1 of next
        p1 = np.array(nxt[0:2])
        # border[0]/border[1] are normalized border RADII (after/before
        # the node), scaled by MIN(iwd, iht) — polygon.c:801-810,
        # brush.c:838-847
        b0 = float(nodes[i][7])
        b1 = float(nxt[6])
        t = np.linspace(0.0, 1.0, samples_per_seg, endpoint=False)[:, None]
        seg = ((1 - t) ** 3 * p0 + 3 * (1 - t) ** 2 * t * c1
               + 3 * (1 - t) * t ** 2 * c2 + t ** 3 * p1)
        pts.append(seg)
        borders.append((1 - t[:, 0]) * b0 + t[:, 0] * b1)
    P = np.concatenate(pts)           # (N, 2) normalized
    B = np.concatenate(borders)       # (N,) normalized border width
    P = P * np.array([nw, nh])
    B = B * min(nw, nh)
    return P.astype(np.float32), np.maximum(B, 1e-3).astype(np.float32)


def _scan_edges(P, B, H, W, inside_test: bool, origin=(0, 0)):
    """lax.scan over polyline edges computing (crossings, min signed
    distance, border width at nearest edge)."""
    x, y = _grid(H, W, origin)
    P0 = jnp.asarray(P)
    P1 = jnp.roll(P0, -1, axis=0)
    Bv = jnp.asarray(B)

    def body(carry, inp):
        cross, dmin, bsel = carry
        p0, p1, bw = inp
        ex, ey = p1[0] - p0[0], p1[1] - p0[1]
        # point-to-segment distance
        L2 = jnp.maximum(ex * ex + ey * ey, 1e-12)
        t = jnp.clip(((x - p0[0]) * ex + (y - p0[1]) * ey) / L2, 0.0, 1.0)
        qx = p0[0] + t * ex
        qy = p0[1] + t * ey
        d = jnp.sqrt((x - qx) ** 2 + (y - qy) ** 2)
        closer = d < dmin
        dmin = jnp.where(closer, d, dmin)
        bsel = jnp.where(closer, bw, bsel)
        if inside_test:
            # even-odd ray crossing (horizontal ray to +x)
            cond = ((p0[1] > y) != (p1[1] > y))
            xint = p0[0] + (y - p0[1]) / jnp.where(
                jnp.abs(ey) < 1e-12, 1e-12, ey) * ex
            cross = cross + jnp.where(cond & (xint > x), 1, 0)
        return (cross, dmin, bsel), None

    init = (jnp.zeros((H, W), jnp.int32),
            jnp.full((H, W), jnp.inf, jnp.float32),
            jnp.zeros((H, W), jnp.float32))
    (cross, dmin, bsel), _ = jax.lax.scan(
        body, init, (P0, P1, Bv))
    return cross, dmin, bsel


def _polygon_mask(nodes, H, W, nh, nw, origin=(0, 0)):
    """Filled bezier path with per-node feathering (masks/polygon.c) —
    boundary sampled host-side, falloff f^2 over the border width."""
    P, B = _bezier_polyline(nodes, nh, nw)
    cross, dmin, bsel = _scan_edges(P, B, H, W, inside_test=True,
                                    origin=origin)
    inside = (cross % 2) == 1
    f = jnp.clip(1.0 - dmin / jnp.maximum(bsel, 1e-3), 0.0, 1.0)
    fall = f * f
    return jnp.where(inside, 1.0, fall)


def _brush_mask(nodes, H, W, nh, nw, origin=(0, 0)):
    """Brush stroke: capsule falloff around the sampled bezier centerline
    with per-node radius/hardness/density (masks/brush.c)."""
    # nodes: node2 ctrl1_2 ctrl2_2 border2 density hardness state
    poly_nodes = [n[:9] for n in nodes]
    P, B = _bezier_polyline(poly_nodes, nh, nw)
    density = float(np.mean([n[8] for n in nodes])) or 1.0
    hardness = float(np.mean([np.clip(n[9], 0.01, 1.0) for n in nodes]))
    _cross, dmin, bsel = _scan_edges(P, B, H, W, inside_test=False,
                                     origin=origin)
    r_in = bsel * hardness
    f = jnp.clip(1.0 - (dmin - r_in) / jnp.maximum(bsel - r_in, 1e-3),
                 0.0, 1.0)
    return jnp.clip(f * f * density, 0.0, 1.0)


def rasterize(form: Form, forms: Dict[int, Form], H: int, W: int,
              norm_h: int = 0, norm_w: int = 0,
              _depth: int = 0, origin=(0, 0)) -> jnp.ndarray:
    """-> (H, W) float mask in [0, 1].  (H, W) is the (padded) grid;
    normalized shape coordinates refer to (norm_h, norm_w) — the valid
    image dims (default: the grid dims).  `origin` = (y0, x0) pixel
    offset of the grid within the image (windowed rasterization)."""
    nh, nw = norm_h or H, norm_w or W
    t = _base_type(form.type)
    if t == MASK_CIRCLE:
        return _circle_mask(form.nodes[0], H, W, nh, nw, origin)
    if t == MASK_ELLIPSE:
        return _ellipse_mask(form.nodes[0], H, W, nh, nw, origin)
    if t == MASK_GRADIENT:
        return _gradient_mask(form.nodes[0], H, W, nh, nw, origin)
    if t == MASK_POLYGON:
        return _polygon_mask(form.nodes, H, W, nh, nw, origin)
    if t == MASK_BRUSH:
        return _brush_mask(form.nodes, H, W, nh, nw, origin)
    if t == MASK_GROUP:
        if _depth > 4:
            return jnp.zeros((H, W), jnp.float32)
        mask = jnp.zeros((H, W), jnp.float32)
        for (formid, _parent, state, opacity) in form.nodes:
            sub = forms.get(formid)
            if sub is None:
                continue
            m = rasterize(sub, forms, H, W, nh, nw, _depth + 1, origin)
            if state & STATE_INVERSE:
                m = 1.0 - m
            m = m * float(opacity)
            if state & STATE_INTERSECTION:
                both = (mask > 0.0) & (m > 0.0)
                mask = jnp.where(both, jnp.minimum(mask, m), 0.0)
            elif state & STATE_DIFFERENCE:
                both = (mask > 0.0) & (m > 0.0)
                mask = jnp.where(both, mask * (1.0 - m), mask)
            elif state & STATE_EXCLUSION:
                both = (mask > 0.0) & (m > 0.0)
                mask = jnp.where(
                    both, jnp.maximum((1.0 - mask) * m, mask * (1.0 - m)),
                    jnp.maximum(mask, m))
            else:  # union (default)
                mask = jnp.maximum(mask, m)
        return mask
    return jnp.zeros((H, W), jnp.float32)


def form_bbox(form: Optional[Form], forms: Dict[int, Form],
              nh: int, nw: int, _depth: int = 0):
    """Host-side support bounding box of a form's mask in pixels:
    (y0, y1, x0, x1) half-open, UNCLAMPED (may extend past the image), or
    None when the support is unbounded (gradient, inverted member, depth
    overflow).  Mirrors the per-shape falloff extents used by the
    rasterizers above (reference: each shape's *_get_area in
    src/develop/masks/*.c)."""
    if form is None or not form.nodes:
        return None
    t = _base_type(form.type)
    mind = float(min(nw, nh))
    if t == MASK_CIRCLE:
        cx, cy, radius, border = form.nodes[0][:4]
        r = (float(radius) + float(border)) * mind
        return (int(np.floor(cy * nh - r)), int(np.ceil(cy * nh + r)) + 1,
                int(np.floor(cx * nw - r)), int(np.ceil(cx * nw + r)) + 1)
    if t == MASK_ELLIPSE:
        cx, cy, r0, r1, _rot, border = form.nodes[0][:6]
        flags = int(form.nodes[0][6])
        if flags & ELLIPSE_PROPORTIONAL:
            t0, t1 = r0 * (1.0 + border), r1 * (1.0 + border)
        else:
            t0, t1 = r0 + border, r1 + border
        r = max(float(t0), float(t1)) * mind  # rotation-safe outer radius
        return (int(np.floor(cy * nh - r)), int(np.ceil(cy * nh + r)) + 1,
                int(np.floor(cx * nw - r)), int(np.ceil(cx * nw + r)) + 1)
    if t in (MASK_POLYGON, MASK_BRUSH):
        nodes = form.nodes if t == MASK_POLYGON else [n[:9]
                                                      for n in form.nodes]
        P, B = _bezier_polyline(nodes, nh, nw)
        b = float(np.max(B))
        return (int(np.floor(P[:, 1].min() - b)),
                int(np.ceil(P[:, 1].max() + b)) + 1,
                int(np.floor(P[:, 0].min() - b)),
                int(np.ceil(P[:, 0].max() + b)) + 1)
    if t == MASK_GROUP:
        if _depth > 4:
            return None
        box = None
        for (formid, _parent, state, _opacity) in form.nodes:
            if state & STATE_INVERSE:
                return None
            sub = form_bbox(forms.get(formid), forms, nh, nw, _depth + 1)
            if sub is None:
                return None
            box = sub if box is None else (
                min(box[0], sub[0]), max(box[1], sub[1]),
                min(box[2], sub[2]), max(box[3], sub[3]))
        return box
    return None  # gradient etc: unbounded support


def form_signature(form: Optional[Form], forms: Dict[int, Form]) -> tuple:
    """Static digest for the compile cache: geometry is baked into the
    graph as constants, so the node values must key the cache."""
    if form is None:
        return ()
    t = _base_type(form.type)
    if t == MASK_GROUP:
        return (t,) + tuple(
            (fid, s, o) + form_signature(forms.get(fid), forms)
            for (fid, _p, s, o) in form.nodes)
    return (t,) + tuple(tuple(n) for n in form.nodes)
