"""rawdenoiseai U-Net: container round-trip, forward shape/finite,
pipeline integration with an injected tiny model."""

import numpy as np
import pytest


def test_anselnn_roundtrip(tmp_path):
    from ansel_tpu.io.anselnn import load_anselnn, random_unet, save_anselnn

    m = random_unet(base=4, depth=2)
    p = tmp_path / "tiny.anselnn"
    save_anselnn(str(p), m.cfg, m.tensors)
    back = load_anselnn(str(p))
    assert back.base == 4 and back.depth == 2 and back.in_channels == 5
    for k, v in m.tensors.items():
        assert np.allclose(back.tensors[k], v)


def test_unet_forward_shapes():
    import jax.numpy as jnp

    from ansel_tpu.io.anselnn import random_unet
    from ansel_tpu.kernels.unet import unet_forward

    m = random_unet(base=4, depth=2)
    x = jnp.ones((5, 40, 128), jnp.float32)
    y = np.asarray(unet_forward(m, x))
    assert y.shape == (1, 40, 128)
    assert np.isfinite(y).all()


def test_rawdenoiseai_in_pipeline():
    from ansel_tpu import HistoryItem
    from ansel_tpu.io.anselnn import random_unet
    from ansel_tpu.io.synthetic import synth_raw
    from ansel_tpu.ops import base as ob
    from ansel_tpu.ops.rawdenoiseai import MODEL_REGISTRY
    from ansel_tpu.pipeline.engine import Pipeline
    import jax

    MODEL_REGISTRY["testnet"] = random_unet(base=4, depth=2, seed=1)
    raw, meta, _ = synth_raw(h=64, w=128)
    pipe = Pipeline(meta, [
        HistoryItem("rawdenoiseai", {"custom_model": "testnet",
                                     "strength": 0.5}),
        HistoryItem("demosaic", {"demosaicing_method": 0}),
    ])
    names = [s.name for s in pipe.stages]
    assert names.index("rawdenoiseai") < names.index("temperature")
    fn = jax.jit(pipe.trace_fn())
    out = np.asarray(fn(ob.pad_to(raw, pipe.spec_in), pipe.coeffs()))
    assert np.isfinite(out).all()


def test_rawdenoiseai_without_model_is_identity():
    from ansel_tpu.core.types import CFAPattern, Colorspace, ImageSpec, RawMeta
    from ansel_tpu.ops import base as ob
    from ansel_tpu.ops.rawdenoiseai import RawDenoiseAI, RawDenoiseAIParams

    op = RawDenoiseAI()
    ctx = ob.PlanContext(meta=RawMeta(width=128, height=64))
    spec = ImageSpec(width=128, height=64, colorspace=Colorspace.RAW,
                     channels=1, cfa=CFAPattern.RGGB)
    p = RawDenoiseAIParams(custom_model="missing_model.anselnn")
    plan = op.plan(ctx, spec, p)
    x = np.ones(spec.array_shape, np.float32)
    out = op.apply(x, op.coeffs(ctx, plan, p), plan, ctx)
    assert out is x


def test_unet_ms_coarse_stage():
    """Multi-scale model: coarse superpixel net guides the fine net
    (rawdenoiseai.c:1317-1342, nn_model.c unet-ms wiring)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ansel_tpu.core.types import (CFAPattern, Colorspace, ImageSpec,
                                      RawMeta)
    from ansel_tpu.io.anselnn import random_unet_ms
    from ansel_tpu.ops import base as ob
    from ansel_tpu.ops import rawdenoiseai as rd

    m = random_unet_ms()
    assert m.stage("fine").in_channels == 8
    assert m.stage("coarse").out_channels == 3
    rd.MODEL_REGISTRY["test-ms"] = m

    h, w = 64, 128
    rng = np.random.default_rng(0)
    x = rng.uniform(100.0, 8000.0, (h, w)).astype(np.float32)
    meta = RawMeta(width=w, height=h, cfa=CFAPattern.RGGB)
    ctx = ob.PlanContext(meta=meta, scale=1.0)
    spec = ImageSpec(width=w, height=h, colorspace=Colorspace.RAW,
                     channels=1, cfa=CFAPattern.RGGB)
    op = rd.RawDenoiseAI()
    p = rd.RawDenoiseAIParams(custom_model="test-ms", strength=1.0)
    plan = op.plan(ctx, spec, p)
    assert plan.static == "test-ms"
    c = op.coeffs(ctx, plan, p)
    assert "weights_coarse" in c
    out = np.asarray(op.apply(jnp.asarray(x), c, plan, ctx))
    assert out.shape == (h, w)
    assert np.isfinite(out).all()
    # the random net must actually change the data (guide path active)
    assert not np.allclose(out, x)


def test_low_band_anchor_restores_measurement_dc():
    """The fusion anchor pins coarse-band means to the measurement
    (rawdenoiseai.c:1195-1260 hallucination-free guarantee)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ansel_tpu.core.types import CFAPattern
    from ansel_tpu.ops import _bayer
    from ansel_tpu.ops.rawdenoiseai import low_band_anchor

    h, w = 128, 128
    rng = np.random.default_rng(0)
    x = (1000.0 + rng.normal(0, 10.0, (h, w))).astype(np.float32)
    masks = np.asarray(_bayer.color_masks(CFAPattern.RGGB, h, w,
                                          jnp.float32))
    sigma = np.full((h, w), 10.0, np.float32)
    # a "model" that drifted: denoised = measurement - 50 (DC error)
    denoised = x - 50.0
    out = np.asarray(low_band_anchor(
        jnp.asarray(x), jnp.asarray(masks), jnp.asarray(sigma),
        jnp.asarray(denoised)))
    # flat field: the anchor must pull the DC back to the measurement
    assert abs(out.mean() - x.mean()) < 2.0, out.mean() - x.mean()
    assert np.isfinite(out).all()
