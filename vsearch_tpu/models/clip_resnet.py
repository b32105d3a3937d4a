"""CLIP ResNet building blocks: anti-aliased Bottleneck + attention pool.

Counterpart of the last two reference modules not previously rebuilt —
``Bottleneck`` and ``AttentionPool2d``
(reference src/ir/encoder/vdr_crossmodal_image.py:21-101). The reference
never wires them into a model (its image encoder is the ViT), but a
user porting a CLIP-RN checkpoint needs them, so they ship here with
executed-reference parity tests (tests/test_clip_resnet.py).

TPU-first layout: NHWC feature maps (XLA's native conv layout on TPU)
instead of the reference's NCHW; BatchNorm runs in inference mode with
stored statistics (these blocks only ever serve frozen CLIP weights).
``convert_bottleneck_params`` / ``convert_attnpool_params`` map a torch
state_dict onto the flax variables.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _avg_pool(x: jax.Array, stride: int) -> jax.Array:
    """AvgPool2d(stride) — window == stride, no padding (the CLIP
    'blurpool-style' downsampling before strided convs)."""
    if stride <= 1:
        return x
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class Bottleneck(nn.Module):
    """CLIP-RN bottleneck (reference vdr_crossmodal_image.py:21-65):
    1x1 -> 3x3 -> avgpool(stride) -> 1x1 with expansion 4; the shortcut
    downsamples with avgpool + 1x1 conv when shape changes. All convs
    are stride-1 (anti-aliased downsampling via the explicit avgpool).
    Input/output are NHWC.
    """

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f, (k, k), padding="SAME" if k > 1 else "VALID",
            use_bias=False, dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=True, epsilon=1e-5, dtype=self.dtype,
            name=name)

        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        out = _avg_pool(out, self.stride)
        out = bn("bn3")(conv(out_planes, 1, "conv3")(out))

        identity = x
        if self.stride > 1 or inplanes != out_planes:
            identity = _avg_pool(x, self.stride)
            identity = bn("downsample_bn")(
                conv(out_planes, 1, "downsample_conv")(identity))
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Attention pooling over a 2D feature map
    (reference vdr_crossmodal_image.py:68-101): flatten HW, prepend the
    spatial mean as a query token, add a learned positional embedding,
    run one multi-head attention layer with separate q/k/v projections,
    and return the attended mean-token. Input is NHWC; output [B, D_out].
    """

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        assert c == self.embed_dim, (c, self.embed_dim)
        x = x.reshape(b, h * w, c)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        pos = self.param(
            "positional_embedding",
            lambda key: (jax.random.normal(
                key, (self.spacial_dim ** 2 + 1, self.embed_dim))
                / self.embed_dim ** 0.5))
        x = x + pos[None].astype(x.dtype)

        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, dtype=self.dtype, name=name)
        q = dense(self.embed_dim, "q_proj")(x[:, :1])  # only the mean
        k = dense(self.embed_dim, "k_proj")(x)
        v = dense(self.embed_dim, "v_proj")(x)

        hd = self.embed_dim // self.num_heads
        split = lambda t: t.reshape(  # noqa: E731
            b, t.shape[1], self.num_heads, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
        att = jax.nn.softmax(att * hd ** -0.5, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, split(v))
        out = out.reshape(b, 1, self.embed_dim)
        out = dense(self.output_dim or self.embed_dim, "c_proj")(out)
        return out[:, 0]


# ---- torch state_dict -> flax variables --------------------------------

def _conv_w(w: np.ndarray) -> np.ndarray:
    # torch [out, in, kh, kw] -> flax [kh, kw, in, out]
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _bn(sd: Dict[str, Any], pfx: str):
    p = {"scale": np.asarray(sd[f"{pfx}.weight"], np.float32),
         "bias": np.asarray(sd[f"{pfx}.bias"], np.float32)}
    s = {"mean": np.asarray(sd[f"{pfx}.running_mean"], np.float32),
         "var": np.asarray(sd[f"{pfx}.running_var"], np.float32)}
    return p, s


def convert_bottleneck_params(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torch ``Bottleneck`` state_dict (numpy-valued) onto this
    module's ``{'params': ..., 'batch_stats': ...}`` variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = {"kernel": _conv_w(sd[f"conv{i}.weight"])}
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"bn{i}")
    if "downsample.0.weight" in sd:
        params["downsample_conv"] = {
            "kernel": _conv_w(sd["downsample.0.weight"])}
        params["downsample_bn"], stats["downsample_bn"] = _bn(
            sd, "downsample.1")
    return {"params": params, "batch_stats": stats}


def convert_attnpool_params(sd: Dict[str, Any]) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "positional_embedding": np.asarray(
            sd["positional_embedding"], np.float32)}
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        params[name] = {
            "kernel": np.asarray(sd[f"{name}.weight"],
                                 np.float32).T,
            "bias": np.asarray(sd[f"{name}.bias"], np.float32)}
    return {"params": params}
