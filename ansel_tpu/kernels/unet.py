"""U-Net inference for the built-in CNN denoiser.

Reference: `/root/reference/src/common/nn_model.c` — fixed "unet" topology
(nn_model.h:40-46): per encoder level two 3x3 conv + GELU and a 2x2
stride-2 down conv; two-conv bottleneck; decoder of nearest x2 upsample,
1x1 channel-reduction conv, skip concat, two 3x3 conv + GELU; final 3x3
head predicting the noise residual.

TPU-native: real multi-channel convolutions — XLA maps them onto the MXU
(this is the one place in the pipeline where convs belong on TPU; the
single-channel stencils elsewhere use shifted adds instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..io.anselnn import NNModel


def _conv(x, w, b, stride=1):
    """x: (C, H, W), w: (O, I, kh, kw) -> (O, H', W'), SAME padding for
    odd kernels, VALID-on-padded for the 2x2 down conv."""
    kh, kw = w.shape[2], w.shape[3]
    if kh == 2:  # stride-2 down conv: pad to even then VALID
        pad = ((0, x.shape[1] % 2), (0, x.shape[2] % 2))
        x = jnp.pad(x, ((0, 0),) + pad)
        padding = "VALID"
    else:
        padding = "SAME"
    y = jax.lax.conv_general_dilated(
        x[None], w, (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )[0]
    return y + b.reshape(-1, 1, 1)


def _upsample2(x, target_hw):
    """nearest x2 (nn_model.h decoder contract)."""
    c, h, w = x.shape
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return y[:, : target_hw[0], : target_hw[1]]


def unet_forward(model: NNModel, planes: jnp.ndarray,
                 weights=None) -> jnp.ndarray:
    """planes: (in_channels, H, W) -> noise prediction (out_channels, H, W).

    `weights`: optional pytree override (traced device weights); defaults
    to the model's host tensors.
    """
    t = weights if weights is not None else {
        k: jnp.asarray(v) for k, v in model.tensors.items()}
    depth = model.depth

    def gelu(v):
        return jax.nn.gelu(v, approximate=True)

    x = planes
    skips = []
    for l in range(depth):
        x = gelu(_conv(x, t[f"enc.{l}.0.weight"], t[f"enc.{l}.0.bias"]))
        x = gelu(_conv(x, t[f"enc.{l}.2.weight"], t[f"enc.{l}.2.bias"]))
        skips.append(x)
        x = _conv(x, t[f"down.{l}.weight"], t[f"down.{l}.bias"], stride=2)
    x = gelu(_conv(x, t["bot.0.weight"], t["bot.0.bias"]))
    x = gelu(_conv(x, t["bot.2.weight"], t["bot.2.bias"]))
    for i in range(depth):
        skip = skips[depth - 1 - i]
        x = _upsample2(x, skip.shape[1:])
        x = _conv(x, t[f"up.{i}.weight"], t[f"up.{i}.bias"])
        x = jnp.concatenate([x, skip], axis=0)
        x = gelu(_conv(x, t[f"dec.{i}.0.weight"], t[f"dec.{i}.0.bias"]))
        x = gelu(_conv(x, t[f"dec.{i}.2.weight"], t[f"dec.{i}.2.bias"]))
    return _conv(x, t["head.weight"], t["head.bias"])
