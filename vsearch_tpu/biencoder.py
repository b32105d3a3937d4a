"""Bi-encoder: a query encoder + a passage encoder behind one config.

TPU-native rebuild of the reference's ``BiEncoder`` (reference:
src/ir/biencoder/biencoder.py:15-123): encoders are instantiated from
config dicts through the registry, optionally shared; checkpoints use a
native flax-msgpack format and can also be converted straight from the
reference's HF torch checkpoint directories.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Dict, List, Optional, Union

import numpy as np

from .models.registry import get_encoder_classes

logger = logging.getLogger(__name__)

_NATIVE_CONFIG = "vsearch_tpu_config.json"


def join_corpus(corpus) -> List[str]:
    """Normalize corpus entries to strings: dicts with title/text join
    as "title [SEP] text" (reference biencoder.py:88-109). Shared by
    encode_corpus and every Retriever.build_index path so dict corpora
    work identically for dense, sparse and bag-of-token indexes."""
    processed = []
    for p in corpus:
        if isinstance(p, str):
            processed.append(p)
        elif isinstance(p, dict):
            body = p.get("text") or p.get("contents") or ""
            if p.get("title"):
                processed.append(f"{p['title']} [SEP] {body}")
            else:
                processed.append(body)
        else:
            raise TypeError(
                f"corpus entries must be str or dict, got {type(p)}")
    return processed


@dataclasses.dataclass
class BiEncoderConfig:
    """Counterpart of reference BiEncoderConfig
    (src/ir/biencoder/biencoder.py:15-41)."""

    encoder_q: Dict[str, Any] = dataclasses.field(default_factory=dict)
    encoder_p: Dict[str, Any] = dataclasses.field(default_factory=dict)
    max_len: int = 512
    shared_encoder: bool = False

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "BiEncoderConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class BiEncoder:
    """Holds ``encoder_q`` and ``encoder_p`` (reference biencoder.py:44-59).

    Encoder construction goes through the registry: the config dicts carry
    a ``type`` key ('vdr' | 'dpr' | 'vdr_crossmodal_*').
    """

    config_class = BiEncoderConfig

    def __init__(self, config: BiEncoderConfig, tokenizer=None,
                 rng=None, _defer_encoders: bool = False):
        self.config = config
        self.default_batch_size = 32
        if _defer_encoders:
            return
        import jax

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rq, rp = jax.random.split(rng)
        q_cfg_cls, q_cls = get_encoder_classes(config.encoder_q["type"])
        self.encoder_q = q_cls(q_cfg_cls.from_dict(config.encoder_q),
                               tokenizer=tokenizer, rng=rq)
        if config.shared_encoder:
            # reference aliases p -> q and takes the larger max_len
            # (biencoder.py:57-59); our configs are frozen, so rebuild
            # the shared encoder with the max of both lengths.
            p_max = config.encoder_p.get("max_len", config.encoder_q.get(
                "max_len", 256))
            q_cfg = self.encoder_q.config
            if p_max > q_cfg.max_len:
                q_cfg = dataclasses.replace(q_cfg, max_len=p_max)
                self.encoder_q = q_cls(
                    q_cfg, variables=self.encoder_q.variables,
                    tokenizer=self.encoder_q.tokenizer)
            self.encoder_p = self.encoder_q
        else:
            p_cfg_cls, p_cls = get_encoder_classes(config.encoder_p["type"])
            self.encoder_p = p_cls(p_cfg_cls.from_dict(config.encoder_p),
                                   tokenizer=tokenizer, rng=rp)

    # -- training forward (reference biencoder.py:61-73) -------------------
    def forward(self, q_ids, q_segments, q_attn_mask,
                p_ids, p_segments, p_attn_mask, *,
                deterministic: bool = True, rngs=None):
        """Token tensors -> (q_emb, p_emb) raw embeddings, the
        reference's training forward. No topk/bow masking here — the
        loss applies its own sparsification (as in the reference, where
        compute_vdr_loss consumes the raw embeddings). The reference
        runs this under train() with dropout active; pass
        ``deterministic=False`` with ``rngs={"dropout": key}`` for that
        behavior (the default is inference mode). For actual training
        prefer ``train.step.make_train_step``, which fuses this with
        the loss into one SPMD program; this surface exists for API
        parity and ad-hoc use."""
        import jax
        import jax.numpy as jnp

        if not deterministic and rngs is None:
            # a silent fixed fallback key would reuse the SAME dropout
            # mask every call (and across both encoders) — refuse
            raise ValueError(
                "deterministic=False requires rngs={'dropout': key}; "
                "pass a fresh key per step (the reference draws new "
                "dropout masks from the global RNG each forward)")
        kw = dict(deterministic=deterministic)
        # fold a distinct lane per encoder: the reference's encoders
        # draw independent masks from one RNG stream, so sharing the
        # caller's key verbatim would correlate q/p dropout
        rngs_q = rngs_p = rngs
        if rngs is not None:
            rngs_q = {n: jax.random.fold_in(r, 0) for n, r in rngs.items()}
            rngs_p = {n: jax.random.fold_in(r, 1) for n, r in rngs.items()}
        q_emb = self.encoder_q.module.apply(
            self.encoder_q.variables, jnp.asarray(q_ids),
            jnp.asarray(q_segments), jnp.asarray(q_attn_mask),
            rngs=rngs_q, **kw)
        p_emb = self.encoder_p.module.apply(
            self.encoder_p.variables, jnp.asarray(p_ids),
            jnp.asarray(p_segments), jnp.asarray(p_attn_mask),
            rngs=rngs_p, **kw)
        return q_emb, p_emb

    __call__ = forward

    # -- encoding (reference biencoder.py:75-109) --------------------------
    def encode_queries(self, queries: List[str], batch_size: Optional[int]
                       = None, **kwargs) -> np.ndarray:
        batch_size = batch_size or self.default_batch_size
        return self.encoder_q.embed(queries, batch_size=batch_size,
                                    activate_lexical=False, **kwargs)

    def encode_corpus(self, corpus: Union[List[str], List[Dict[str, str]]],
                      batch_size: Optional[int] = None,
                      max_len: Optional[int] = None, **kwargs) -> np.ndarray:
        batch_size = batch_size or self.default_batch_size
        processed = join_corpus(corpus)
        return self.encoder_p.embed(processed, batch_size=batch_size,
                                    max_len=max_len,
                                    activate_lexical=False, **kwargs)

    def explain(self, q: str, p: str, topk: int = 768, visual: bool = False,
                max_words: int = 100, log_scale: bool = True,
                save_file: Optional[str] = None) -> Dict[str, float]:
        """Token-level q x p attribution (reference biencoder.py:111-123)."""
        q_dst = self.encoder_q.dst(q, topk=topk)
        p_dst = self.encoder_p.dst(p, topk=topk)
        inter = {
            key: q_dst.get(key, 0) * p_dst.get(key, 0)
            for key in set(q_dst) | set(p_dst)
            if q_dst.get(key, 0) * p_dst.get(key, 0) != 0
        }
        results = dict(sorted(inter.items(), key=lambda kv: -kv[1]))
        if visual:
            from .utils.vis import wordcloud_from_dict
            wordcloud_from_dict(results, max_words=max_words,
                                log_scale=log_scale, save_file=save_file)
        return results

    # -- persistence -------------------------------------------------------
    def save_pretrained(self, path: str):
        from flax import serialization

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, _NATIVE_CONFIG), "w") as f:
            json.dump({"class": type(self).__name__,
                       "config": self.config.to_dict()}, f, indent=2)
        # ship the tokenizer vocab so the checkpoint is self-contained.
        # Write by LINE POSITION = id, keeping id gaps as blank lines:
        # compacting would renumber every token after a gap on reload
        # (load_vocab assigns line numbers) and silently desync
        # tokenization from the saved weights
        vocab = getattr(self.encoder_q.tokenizer, "vocab", None)
        if isinstance(vocab, dict):
            by_id = {i: t for t, i in vocab.items()}
            max_id = max(by_id) if by_id else -1
            with open(os.path.join(path, "vocab.txt"), "w",
                      encoding="utf-8") as f:
                f.write("\n".join(by_id.get(i, "")
                                  for i in range(max_id + 1)) + "\n")
        # device_get the WHOLE tree in one call before serializing:
        # to_bytes pulls leaves one at a time, and on a high-latency
        # host<->device link (the dev tunnel syncs ~31ms per transfer)
        # per-leaf fetches turned a tiny-checkpoint save into ~80s
        import jax

        with open(os.path.join(path, "encoder_q.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(
                jax.device_get(self.encoder_q.variables)))
        if not self.config.shared_encoder:
            with open(os.path.join(path, "encoder_p.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(
                    jax.device_get(self.encoder_p.variables)))
        logger.info("saved bi-encoder to %s", path)

    @classmethod
    def from_pretrained(cls, path: str, tokenizer=None, **kwargs):
        """Load a native checkpoint dir; falls back to converting a
        reference-style HF torch checkpoint dir."""
        native_cfg = os.path.join(path, _NATIVE_CONFIG)
        if os.path.isfile(native_cfg):
            return cls._from_native(path, tokenizer=tokenizer, **kwargs)
        if os.path.isfile(os.path.join(path, "config.json")):
            return cls._from_torch_dir(path, tokenizer=tokenizer, **kwargs)
        raise FileNotFoundError(
            f"no native ({_NATIVE_CONFIG}) or HF (config.json) checkpoint "
            f"found under {path}")

    @staticmethod
    def _dir_tokenizer(path: str, tokenizer):
        """Prefer a checkpoint-local vocab.txt when no tokenizer given."""
        if tokenizer is None and os.path.isfile(
                os.path.join(path, "vocab.txt")):
            from .tokenization import get_tokenizer
            tokenizer = get_tokenizer(path)
        return tokenizer

    @classmethod
    def _from_native(cls, path: str, tokenizer=None, **kwargs):
        from flax import serialization

        tokenizer = cls._dir_tokenizer(path, tokenizer)
        with open(os.path.join(path, _NATIVE_CONFIG)) as f:
            config = cls.config_class.from_dict(json.load(f)["config"])
        model = cls(config, tokenizer=tokenizer, **kwargs)
        with open(os.path.join(path, "encoder_q.msgpack"), "rb") as f:
            model.encoder_q.variables = serialization.from_bytes(
                model.encoder_q.variables, f.read())
        p_file = os.path.join(path, "encoder_p.msgpack")
        if config.shared_encoder:
            model.encoder_p = model.encoder_q
        elif os.path.isfile(p_file):
            with open(p_file, "rb") as f:
                model.encoder_p.variables = serialization.from_bytes(
                    model.encoder_p.variables, f.read())
        return model

    @classmethod
    def _from_torch_dir(cls, path: str, tokenizer=None, **kwargs):
        """Convert a reference HF checkpoint dir (config.json +
        pytorch_model.bin / model.safetensors with encoder_q./encoder_p.
        prefixed keys) into a live model."""
        from .models.hf_convert import (convert_crossmodal_text_params,
                                        convert_dpr_params,
                                        convert_vdr_image_params,
                                        convert_vdr_params)

        tokenizer = cls._dir_tokenizer(path, tokenizer)
        with open(os.path.join(path, "config.json")) as f:
            hf_cfg = json.load(f)
        config = cls.config_class.from_dict(hf_cfg)
        # Reference checkpoints max-pool PAD positions (reference
        # vdr.py:74, vdr_crossmodal_text.py:53-56+66); enable the compat
        # pooling so their golden scores reproduce, unless the config
        # says otherwise explicitly.
        for enc_cfg in (config.encoder_q, config.encoder_p):
            if (enc_cfg.get("type", "vdr") in
                    ("vdr", "vdr_crossmodal_text")
                    and "compat_pad_pooling" not in enc_cfg):
                enc_cfg["compat_pad_pooling"] = True
        sd = _load_torch_state_dict(path)
        model = cls(config, tokenizer=tokenizer, **kwargs)
        for name, enc in (("encoder_q", model.encoder_q),
                          ("encoder_p", model.encoder_p)):
            prefix = f"{name}." if any(
                k.startswith(f"{name}.") for k in sd) else ""
            sub = {k[len(prefix):]: v for k, v in sd.items()
                   if k.startswith(prefix)} if prefix else sd
            etype = getattr(enc.config, "type", "vdr")
            if etype == "vdr":
                params = convert_vdr_params(sub, enc.config.bert)
            elif etype == "dpr":
                params = convert_dpr_params(sub, enc.config.bert)
            elif etype == "vdr_crossmodal_text":
                params = convert_crossmodal_text_params(
                    sub, enc.config.bert)
            elif etype == "vdr_crossmodal_image":
                params = convert_vdr_image_params(sub, enc.config)
            else:
                raise NotImplementedError(
                    f"torch conversion for encoder type {etype}")
            enc.variables = {"params": params}
            if model.config.shared_encoder:
                break
        return model


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    from .models.hf_convert import torch_state_dict_to_numpy

    st = os.path.join(path, "model.safetensors")
    if os.path.isfile(st):
        from safetensors.numpy import load_file
        return load_file(st)
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.isfile(bin_path):
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return torch_state_dict_to_numpy(sd)
    raise FileNotFoundError(f"no model weights found under {path}")
