"""DPR dense encoder: text -> BERT [CLS] vector.

TPU-native rebuild of the reference's classic dense encoder (reference:
src/ir/encoder/dpr.py:23-97).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .bert import BertConfig, BertModel
from .encoder_base import TextEncoderBase


@dataclasses.dataclass(frozen=True)
class DPREncoderConfig:
    model_id: str = "bert-base-uncased"
    max_len: int = 256
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    type: str = "dpr"

    @property
    def out_dim(self) -> int:
        return self.bert.hidden_size

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DPREncoderConfig":
        bert_keys = {f.name for f in dataclasses.fields(BertConfig)}
        own_keys = {f.name for f in dataclasses.fields(cls)} - {"bert"}
        bert = BertConfig(**{k: v for k, v in d.items() if k in bert_keys})
        own = {k: v for k, v in d.items() if k in own_keys}
        return cls(bert=bert, **own)


class DPRModule(nn.Module):
    """tokens -> [B, H] CLS vector (reference src/ir/encoder/dpr.py:33-46)."""

    config: DPREncoderConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 *, deterministic: bool = True) -> jax.Array:
        h = BertModel(self.config.bert, name="bert")(
            input_ids, token_type_ids, attention_mask,
            deterministic=deterministic)
        return h[:, 0, :]


class DPREncoder(TextEncoderBase):
    config_class = DPREncoderConfig

    def __init__(self, config: DPREncoderConfig, variables=None,
                 tokenizer=None, rng: Optional[jax.Array] = None):
        self.module = DPRModule(config)
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, 8), dtype=jnp.int32)
            # jit the init: eager flax init dispatches one device op
            # per parameter (minutes over a remote device link);
            # compiled it is a single program
            variables = jax.jit(self.module.init)(rng, dummy,
                                                  dummy, dummy)
        if tokenizer is None:
            from ..tokenization import get_tokenizer
            tokenizer = get_tokenizer(config.model_id)
        super().__init__(config, variables, tokenizer)

    def embed(self, texts: Union[str, List[str]], batch_size: int = 128,
              max_len: Optional[int] = None, **_ignored) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        max_len = max_len or self.config.max_len

        def make(L):
            return jax.jit(lambda v, ids, tt, am: self.module.apply(
                v, ids, tt, am))

        return self._run_batches(texts, batch_size, max_len, "cls", make)
