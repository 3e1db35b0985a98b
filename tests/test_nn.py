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
