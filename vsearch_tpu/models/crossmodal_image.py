"""Cross-modal VDR image encoder: image -> valid-vocab-subspace vector.

TPU-native rebuild of reference src/ir/encoder/vdr_crossmodal_image.py:
104-279 — a CLIP-style ViT (conv patchify -> pos embed -> pre-LN residual
attention blocks with QuickGELU -> post-LN) followed by a learned
projection onto the valid vocab subspace, max over patches, elu1p, L2
norm, top-k sparsification. Written in flax with fused attention; image
preprocessing is PIL+numpy (bicubic resize, center crop, CLIP
normalization) with no torchvision dependency.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import elu1p
from ..ops.sparse import build_topk_mask
from .valid_vocab import VALID_TOKEN_IDS

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class VDRImageEncoderConfig:
    resolution: int = 224
    tokenizer_id: str = "bert-base-uncased"
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    topk: int = 768
    num_valid_tokens: int = len(VALID_TOKEN_IDS)
    type: str = "vdr_crossmodal_image"

    @property
    def grid(self) -> int:
        return self.resolution // self.patch_size

    @property
    def out_dim(self) -> int:
        return self.num_valid_tokens

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "VDRImageEncoderConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items()
                      if k in known and v is not None})


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) (reference vdr_crossmodal_image.py:112-114)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        b, l, _ = h.shape
        head_dim = self.width // self.heads
        qkv = nn.Dense(3 * self.width, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (b, l, self.heads, head_dim)
        ctx = jax.nn.dot_product_attention(
            q.reshape(shape), k.reshape(shape), v.reshape(shape))
        ctx = ctx.reshape(b, l, self.width)
        x = x + nn.Dense(self.width, name="out_proj")(ctx)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, name="c_proj")(h)
        return x


class VDRImageModule(nn.Module):
    """pixels [B, H, W, 3] -> per-patch features [B, L, width] then the
    vocab head in ``embed_from_features``."""

    config: VDRImageEncoderConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.config
        x = nn.Conv(cfg.width, kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    use_bias=False, name="conv1")(pixels)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.width)  # [B, grid*grid, width]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(cfg.width ** -0.5),
                         (cfg.grid ** 2, cfg.width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads,
                                       name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        proj = self.param("proj", nn.initializers.ones,
                          (cfg.num_valid_tokens, cfg.width))
        logits = jax.lax.dot_general(
            x, proj, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [B, L, V_valid]
        emb = elu1p(logits.max(axis=1))
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


def preprocess_image(img, resolution: int = 224) -> np.ndarray:
    """PIL image -> [H, W, 3] float32, CLIP normalization (reference
    vdr_crossmodal_image.py:267-272)."""
    from PIL import Image

    if isinstance(img, str):
        img = Image.open(img).convert("RGB")
    w, h = img.size
    scale = resolution / min(w, h)
    img = img.resize((max(resolution, round(w * scale)),
                      max(resolution, round(h * scale))),
                     Image.BICUBIC)
    w, h = img.size
    left, top = (w - resolution) // 2, (h - resolution) // 2
    img = img.crop((left, top, left + resolution, top + resolution))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - _CLIP_MEAN) / _CLIP_STD


class VDRImageEncoder:
    """Host-facing image encoder (reference
    vdr_crossmodal_image.py:184-264)."""

    config_class = VDRImageEncoderConfig

    def __init__(self, config: VDRImageEncoderConfig, variables=None,
                 tokenizer=None, rng: Optional[jax.Array] = None):
        self.config = config
        self.module = VDRImageModule(config)
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, config.resolution, config.resolution, 3),
                              jnp.float32)
            # jitted for the same reason as the text encoders: one
            # compiled init program instead of per-param dispatches
            variables = jax.jit(self.module.init)(rng, dummy)
        self.variables = variables
        if tokenizer is None:
            from ..tokenization import get_tokenizer
            tokenizer = get_tokenizer(config.tokenizer_id)
        self.tokenizer = tokenizer
        self._fn_cache: Dict = {}

    def _embed_fn(self, topk: int):
        def fn(variables, pixels):
            emb = self.module.apply(variables, pixels)
            return emb * build_topk_mask(emb, k=topk)

        return jax.jit(fn)

    def embed(self, images, topk: Optional[int] = None,
              batch_size: int = 32, **_ignored) -> np.ndarray:
        """Images: path(s), PIL image(s), or [B, H, W, 3] array."""
        # clamp BEFORE the cache lookup: distinct oversized topk values
        # would otherwise compile duplicate identical programs
        topk = min(topk or self.config.topk,
                   self.config.num_valid_tokens)
        if isinstance(images, (str, bytes)) or hasattr(images, "crop"):
            images = [images]
        if isinstance(images, list):
            pixels = np.stack([
                preprocess_image(im, self.config.resolution)
                for im in images])
        else:
            pixels = np.asarray(images, dtype=np.float32)
            if pixels.ndim == 4 and pixels.shape[1] == 3:  # NCHW -> NHWC
                pixels = pixels.transpose(0, 2, 3, 1)
        if topk not in self._fn_cache:
            self._fn_cache[topk] = self._embed_fn(topk)
        # async dispatch: queue a bounded window of device batches
        # before fetching, so ViT compute overlaps host readback
        from .encoder_base import pipeline_window

        outs = pipeline_window(
            (self._fn_cache[topk](self.variables,
                                  jnp.asarray(pixels[s: s + batch_size]))
             for s in range(0, pixels.shape[0], batch_size)),
            np.asarray)
        return np.concatenate(outs, axis=0)

    def disentangle(self, image, topk: Optional[int] = None,
                    visual: bool = False, save_file: Optional[str] = None
                    ) -> Dict[str, float]:
        topk = topk or self.config.topk
        emb = self.embed(image)[0]
        k = min(topk, emb.shape[-1])
        idx = [int(i) for i in np.argsort(-emb)[:k] if emb[i] != 0]
        token_ids = [int(VALID_TOKEN_IDS[i]) if
                     self.config.num_valid_tokens == len(VALID_TOKEN_IDS)
                     else i for i in idx]
        tokens = self.tokenizer.convert_ids_to_tokens(token_ids)
        results = dict(zip(tokens, [float(emb[i]) for i in idx]))
        if visual:
            from ..utils.vis import wordcloud_from_dict
            wordcloud_from_dict(results, max_words=topk,
                                save_file=save_file)
        return results

    dst = disentangle

    def encode(self, *a, **k):
        raise NotImplementedError("image encoder has no text encode()")
