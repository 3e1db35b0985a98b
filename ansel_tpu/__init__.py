"""ansel_tpu — a TPU-native raw development engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Ansel
(aurelienpierreeng/ansel, a Darktable-4.0 fork): non-destructive,
scene-referred raw photo pipeline driven by history-stack semantics
(raw + XMP sidecar -> color-managed sRGB export).

Blueprint: SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from .core.types import CFAPattern, Colorspace, ImageSpec, RawMeta, ROI  # noqa: F401
from .pipeline.engine import (  # noqa: F401
    CompiledPipe,
    HistoryItem,
    Pipeline,
    compile_pipeline,
)

# import op modules for registration side effects
from .ops import ALL_OPS  # noqa: F401
