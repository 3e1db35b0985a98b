"""Smoke: every registered op planned + applied inside a real pipeline
(defaults or representative params), finite output. The breadth guard —
any newly registered op gets executed here automatically."""

import numpy as np
import pytest

from ansel_tpu import HistoryItem
from ansel_tpu.io.synthetic import synth_raw
from ansel_tpu.ops import base as ops_base
from ansel_tpu.pipeline.engine import Pipeline

# ops needing non-default params to be representative
SPECIAL = {
    "exposure": {"exposure": 0.5},
    "diffuse": {"iterations": 1, "first": 0.1, "radius": 4},
    "denoiseprofile": {"a": (4e-4,) * 3, "b": (1e-5,) * 3},
    "crop": {"cx": 0.1, "cy": 0.1, "cw": 0.9, "ch": 0.9},
    "flip": {"orientation": 6},
    "monochrome": {},
    "invert": {},
    # layer_capture=0 prints nothing (black by design); keep layers small
    "crystgrain": {"layer_capture": 0.4, "layers": 4, "grain_size": 2.0},
    "colorprimaries": {"hue": (30.0, 0.0, 0.0, 0.0, 0.0, 0.0)},
    "colorequal": {"curve": tuple([0.1, 0.7, 0.5, 0.5, 0.9, 0.5]
                                  + [0.0] * 354),
                   "curve_num_nodes": tuple([3] + [0] * 8)},
}
# mandatory ops are always in the pipe; don't add twice
MANDATORY = {"rawprepare", "temperature", "highlights", "demosaic",
             "colorin", "colorout"}


@pytest.mark.parametrize("opname", sorted(
    n for n in ops_base.all_ops() if n not in MANDATORY))
def test_op_runs_in_pipeline(opname):
    raw, meta, _ = synth_raw(h=96, w=128)
    items = [HistoryItem(opname, SPECIAL.get(opname, {}))]
    if opname != "demosaic":
        # PPG demosaic: ~10x smaller graph, keeps per-case compiles quick
        items.append(HistoryItem("demosaic", {"demosaicing_method": 0}))
    pipe = Pipeline(meta, items)
    names = [s.name for s in pipe.stages]
    assert opname in names, f"{opname} was skipped: {pipe.unsupported}"
    import jax

    fn = jax.jit(pipe.trace_fn())
    out = np.asarray(fn(ops_base.pad_to(raw, pipe.spec_in), pipe.coeffs()))
    assert np.isfinite(out).all(), opname
    assert out.shape[0] == 3
