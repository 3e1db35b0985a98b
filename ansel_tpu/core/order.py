"""Canonical pipeline ordering.

Mirrors the reference's v3.0 RAW module order table
(`/root/reference/src/develop/iop_order.c:194-303`, ``v30_order``) — the
behavioral contract for where each op sits in the scene-referred pipe.
Values are (order, name); ties broken by multi_priority then list position,
as in the reference's topological rules.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

V30_ORDER: List[Tuple[float, str]] = [
    (0.5, "basebuffer"),
    (1.0, "rawprepare"),
    (2.0, "invert"),
    (2.5, "rawdenoiseai"),
    (3.0, "temperature"),
    (4.0, "highlights"),
    (5.0, "cacorrect"),
    (6.0, "hotpixels"),
    (7.0, "rawdenoise"),
    (8.0, "demosaic"),
    (8.5, "detailmask"),
    (9.0, "denoiseprofile"),
    (10.0, "bilateral"),
    (11.0, "rotatepixels"),
    (12.0, "scalepixels"),
    (13.0, "lens"),
    (13.5, "cacorrectrgb"),
    (14.0, "hazeremoval"),
    (14.0, "initialscale"),
    (15.0, "ashift"),
    (16.0, "flip"),
    (17.0, "clipping"),
    (18.0, "liquify"),
    (19.0, "spots"),
    (20.0, "retouch"),
    (21.0, "exposure"),
    (22.0, "mask_manager"),
    (23.0, "tonemap"),
    (24.0, "toneequal"),
    (24.5, "crop"),
    (25.0, "graduatednd"),
    (26.0, "profile_gamma"),
    (28.0, "colorin"),
    (28.5, "channelmixerrgb"),
    (28.5, "diffuse"),
    (28.5, "censorize"),
    (28.5, "negadoctor"),
    (28.6, "restorescans"),
    (28.5, "blurs"),
    (29.0, "nlmeans"),
    (30.0, "colorchecker"),
    (31.0, "defringe"),
    (32.0, "atrous"),
    (33.0, "lowpass"),
    (34.0, "highpass"),
    (35.0, "sharpen"),
    (36.0, "lut3d"),
    (37.0, "colortransfer"),
    (38.0, "colormapping"),
    (39.0, "channelmixer"),
    (40.0, "basicadj"),
    (41.0, "colorbalance"),
    (41.4, "splittoningrgb"),
    (41.45, "colorprimaries"),
    (41.5, "colorbalancergb"),
    (41.6, "colorequal"),
    (41.7, "drawlayer"),
    (42.0, "rgbcurve"),
    (43.0, "rgblevels"),
    (44.0, "basecurve"),
    (45.0, "filmic"),
    (45.5, "crystgrain"),
    (46.0, "filmicrgb"),
    (47.0, "colisa"),
    (48.0, "tonecurve"),
    (49.0, "levels"),
    (50.0, "shadhi"),
    (51.0, "zonesystem"),
    (52.0, "globaltonemap"),
    (53.0, "relight"),
    (54.0, "bilat"),
    (55.0, "colorcorrection"),
    (56.0, "colorcontrast"),
    (57.0, "velvia"),
    (58.0, "vibrance"),
    (60.0, "colorzones"),
    (61.0, "bloom"),
    (62.0, "colorize"),
    (63.0, "lowlight"),
    (64.0, "monochrome"),
    (65.0, "grain"),
    (66.0, "soften"),
    (67.0, "splittoning"),
    (68.0, "vignette"),
    (69.0, "colorreconstruct"),
    (70.0, "colorout"),
    (72.0, "finalscale"),
    (73.0, "overexposed"),
    (74.0, "rawoverexposed"),
    (75.0, "dither"),
    (76.0, "borders"),
    (77.0, "watermark"),
    (78.0, "gamma"),
]

ORDER_OF: Dict[str, float] = {}
_POS: Dict[str, int] = {}
for _i, (_o, _n) in enumerate(V30_ORDER):
    ORDER_OF.setdefault(_n, _o)
    _POS.setdefault(_n, _i)


def default_order(op: str) -> float:
    return ORDER_OF.get(op, 999.0)


def sort_key(op: str, order: float = None, multi_priority: int = 0):
    """History sort key matching the reference's iop-order semantics:
    primary the (possibly per-image) order value, tie-break by canonical
    table position, then *descending* multi_priority (reference runs higher
    priorities first within an op)."""
    o = order if order is not None and order > 0 else default_order(op)
    return (o, _POS.get(op, 10_000), -multi_priority)
