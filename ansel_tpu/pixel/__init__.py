"""Module-agnostic pixel algorithms — the TPU analog of the reference's
layer-2 `src/pixel/` library ("takes buffers, returns buffers, no pipeline
knowledge", src/pixel/README.md)."""
