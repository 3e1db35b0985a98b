"""Drawn-mask rasterization + blend integration + XMP round-trip."""

import numpy as np
import pytest

from ansel_tpu.pipeline import masks as mk


def test_circle_mask_geometry():
    # circle at center, radius 0.25 of min dim, border 0.1
    form = mk.Form(id=1, type=mk.MASK_CIRCLE, nodes=[(0.5, 0.5, 0.25, 0.1)])
    m = np.asarray(mk.rasterize(form, {}, 128, 128))
    assert m[64, 64] == pytest.approx(1.0)
    assert m[64, 64 + 30] == pytest.approx(1.0)  # inside r=32
    assert m[64, 64 + 50] == 0.0                 # outside r+border=44.8
    mid = m[64, 64 + 38]                         # in the falloff ring
    assert 0.0 < mid < 1.0


def test_ellipse_rotation():
    form = mk.Form(id=1, type=mk.MASK_ELLIPSE,
                   nodes=[(0.5, 0.5, 0.4, 0.15, 0.0, 0.05, 0)])
    m = np.asarray(mk.rasterize(form, {}, 128, 128))
    # wide along x, narrow along y
    assert m[64, 64 + 45] == pytest.approx(1.0)
    assert m[64 + 45, 64] == 0.0
    form90 = mk.Form(id=1, type=mk.MASK_ELLIPSE,
                     nodes=[(0.5, 0.5, 0.4, 0.15, 90.0, 0.05, 0)])
    m90 = np.asarray(mk.rasterize(form90, {}, 128, 128))
    assert m90[64 + 45, 64] == pytest.approx(1.0)
    assert m90[64, 64 + 45] == 0.0


def test_gradient_mask_direction():
    form = mk.Form(id=1, type=mk.MASK_GRADIENT,
                   nodes=[(0.5, 0.5, 0.0, 0.2, 0.0, 0.0, 1)])
    m = np.asarray(mk.rasterize(form, {}, 128, 128))
    # rotation 0: y' = -(y - cy*h), so the mask is 1 above, 0 below
    # (gradient.c sign convention)
    assert m[8, 64] > 0.9 and m[120, 64] < 0.1
    assert m[8, 64] >= m[64, 64] >= m[120, 64]


def test_polygon_mask_square():
    # axis-aligned square 0.25..0.75 with straight bezier handles
    def node(x, y):
        return (x, y, x, y, x, y, 0.04, 0.04)  # border radius 0.04

    nodes = [node(0.25, 0.25), node(0.75, 0.25),
             node(0.75, 0.75), node(0.25, 0.75)]
    form = mk.Form(id=1, type=mk.MASK_POLYGON,
                   nodes=[n + (0,) for n in nodes])
    m = np.asarray(mk.rasterize(form, {}, 128, 128))
    assert m[64, 64] == pytest.approx(1.0)   # center inside
    assert m[10, 10] == 0.0                  # far corner outside
    assert 0.0 < m[64, int(0.75 * 128) + 2] <= 1.0  # just outside: falloff


def test_group_union_and_difference():
    c1 = mk.Form(id=10, type=mk.MASK_CIRCLE, nodes=[(0.3, 0.5, 0.15, 0.02)])
    c2 = mk.Form(id=11, type=mk.MASK_CIRCLE, nodes=[(0.6, 0.5, 0.15, 0.02)])
    forms = {10: c1, 11: c2}
    grp = mk.Form(id=1, type=mk.MASK_GROUP, nodes=[
        (10, 0, mk.STATE_UNION, 1.0),
        (11, 0, mk.STATE_UNION, 1.0),
    ])
    m = np.asarray(mk.rasterize(grp, forms, 128, 128))
    assert m[64, int(0.3 * 128)] == pytest.approx(1.0)
    assert m[64, int(0.6 * 128)] == pytest.approx(1.0)
    grp2 = mk.Form(id=1, type=mk.MASK_GROUP, nodes=[
        (10, 0, mk.STATE_UNION, 1.0),
        (11, 0, mk.STATE_DIFFERENCE, 1.0),
    ])
    m2 = np.asarray(mk.rasterize(grp2, forms, 128, 128))
    # overlap region should be carved out of circle 1
    overlap_x = int(0.45 * 128)
    assert m2[64, overlap_x] < m[64, overlap_x]


def test_points_blob_roundtrip():
    form = mk.Form(id=3, type=mk.MASK_CIRCLE,
                   nodes=[(0.25, 0.75, 0.1, 0.05)])
    blob = form.points_blob()
    back = mk.decode_points(mk.MASK_CIRCLE, blob, 1)
    assert np.allclose(back[0], form.nodes[0])


def test_xmp_masks_roundtrip(tmp_path):
    from ansel_tpu.io.xmp import XMPDocument, parse_xmp, write_xmp
    from ansel_tpu.pipeline.engine import HistoryItem

    form = mk.Form(id=42, type=mk.MASK_CIRCLE, name="c1",
                   nodes=[(0.5, 0.5, 0.2, 0.1)])
    doc = XMPDocument(history=[HistoryItem("exposure", params=None)],
                      masks={42: form})
    p = str(tmp_path / "m.xmp")
    write_xmp(p, doc)
    back = parse_xmp(p)
    assert 42 in back.masks
    assert back.masks[42].type == mk.MASK_CIRCLE
    assert np.allclose(back.masks[42].nodes[0], form.nodes[0])


def test_drawn_mask_in_pipeline():
    """exposure blended through a circle mask: inside brightened,
    outside untouched."""
    import dataclasses

    from ansel_tpu.core.params import params_class
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.pipeline import blend as bl
    from ansel_tpu.pipeline.engine import HistoryItem, compile_pipeline

    raw, meta, _ = synth_raw(h=128, w=256)
    form = mk.Form(id=7, type=mk.MASK_CIRCLE, nodes=[(0.5, 0.5, 0.2, 0.05)])
    bp = bl.BlendParams(mask_mode=bl.MASK_ENABLED | bl.MASK_SHAPE,
                        mask_id=7, opacity=100.0)
    exp = dataclasses.replace(params_class("exposure")(), exposure=2.0)
    hist = [HistoryItem("exposure", params=exp, blend_params=bp)]
    base_hist = [HistoryItem("exposure",
                             params=params_class("exposure")())]
    pipe = compile_pipeline(meta, hist, forms={7: form})
    ref = compile_pipeline(meta, base_hist)
    out = np.asarray(pipe.output_array(raw))
    out_ref = np.asarray(ref.output_array(raw))
    h, w = out.shape[1:]
    # center (inside the circle): brightened vs the neutral render
    assert out[:, h // 2, w // 2].mean() > out_ref[:, h // 2, w // 2].mean()
    # far corner (outside): unchanged
    corner = np.abs(out[:, 5, 5] - out_ref[:, 5, 5]).max()
    assert corner < 1e-4, corner


def test_spots_heal_seamless():
    """heal removes the source's DC offset but keeps its texture."""
    import jax
    import jax.numpy as jnp

    from ansel_tpu.pixel.heal import heal

    H, W = 96, 128
    dst = np.full((3, H, W), 0.5, np.float32)
    yy, xx = np.mgrid[:H, :W]
    src = (np.full((3, H, W), 0.9)
           + 0.05 * np.sin(xx / 3)[None]).astype(np.float32)
    maskarr = (((yy - 48) ** 2 + (xx - 64) ** 2) < 20 ** 2).astype(np.float32)
    out = np.asarray(jax.jit(heal)(jnp.asarray(dst), jnp.asarray(src),
                                   jnp.asarray(maskarr)))
    inside = maskarr > 0.5
    assert abs(out[0][inside].mean() - 0.5) < 0.02   # DC matched to dest
    assert out[0][inside].std() > 0.02               # texture survives
    assert np.abs(out[0][~inside] - 0.5).max() < 1e-6
