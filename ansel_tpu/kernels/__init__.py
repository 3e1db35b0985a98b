"""Hand-optimized compute kernels (the TPU analog of the reference's
`data/kernels/*.cl` OpenCL programs + `src/pixel/` C hot loops).

Round-1 kernels are fused whole-image JAX dataflows; Pallas versions land
where XLA fusion is insufficient (profiling-driven, SURVEY.md §7).
"""
