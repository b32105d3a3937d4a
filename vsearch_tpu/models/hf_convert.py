"""HF torch checkpoint -> flax param-tree conversion.

Lets published vsearch/DPR/BERT torch checkpoints (reference loads them via
HF ``from_pretrained``, src/ir/encoder/vdr.py:54) run on our TPU-native
modules. Torch is only imported lazily and only on the host — conversion
produces plain numpy arrays that feed ``jax.device_put``.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .bert import BertConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    return t.detach().cpu().numpy()


def torch_state_dict_to_numpy(state_dict: Mapping, strip_prefix: str = ""
                              ) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if strip_prefix and k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        out[k] = _np(v)
    return out


def convert_bert_params(sd: Mapping[str, np.ndarray], config: BertConfig
                        ) -> Dict:
    """Map an HF ``BertModel`` state_dict (numpy values) onto the param tree
    of ``vsearch_tpu.models.bert.BertModel``.

    torch ``nn.Linear`` stores weight as [out, in]; flax ``Dense`` kernels
    are [in, out] — hence the transposes.
    """
    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T,
                "bias": sd[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"],
                "bias": sd[prefix + ".bias"]}

    params = {
        "embeddings": {
            "word_embeddings": {
                "embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {
                "embedding": sd["embeddings.token_type_embeddings.weight"]},
            "layer_norm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": lin(f"{p}.attention.self.query"),
                "key": lin(f"{p}.attention.self.key"),
                "value": lin(f"{p}.attention.self.value"),
                "output": lin(f"{p}.attention.output.dense"),
                "output_layer_norm": ln(f"{p}.attention.output.LayerNorm"),
            },
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "output_layer_norm": ln(f"{p}.output.LayerNorm"),
        }
    return params


def convert_vdr_params(sd: Mapping[str, np.ndarray], config: BertConfig
                       ) -> Dict:
    """Map a reference VDREncoder state_dict onto ``VDRModule``'s tree.

    The reference stores the backbone under ``bert_model.*`` plus a
    top-level ``ln.{weight,bias}`` LayerNorm (src/ir/encoder/vdr.py:53-54).
    Our module hoists the tied word embedding to the top level.
    """
    bert_sd = {k[len("bert_model."):]: v for k, v in sd.items()
               if k.startswith("bert_model.")}
    if not bert_sd:  # plain BertModel state_dict
        bert_sd = dict(sd)
    bert_params = convert_bert_params(bert_sd, config)
    word = bert_params["embeddings"].pop("word_embeddings")
    params = {
        "word_embeddings": word,
        "bert": bert_params,
    }
    if "ln.weight" in sd:
        params["ln"] = {"scale": _np(sd["ln.weight"]),
                        "bias": _np(sd["ln.bias"])}
    else:
        h = config.hidden_size
        params["ln"] = {"scale": np.ones(h, np.float32),
                        "bias": np.zeros(h, np.float32)}
    return params


def convert_crossmodal_text_params(sd: Mapping[str, np.ndarray],
                                   config: BertConfig) -> Dict:
    """Reference ``VDRTextEncoder`` (src/ir/encoder/vdr_crossmodal_text.py:
    28-57) stores exactly the VDR layout — ``bert_model.*`` + a top-level
    ``ln`` — so the mapping is shared; the valid-vocab projection is
    config-side (id selection), not a weight."""
    return convert_vdr_params(sd, config)


def convert_vdr_image_params(sd: Mapping[str, np.ndarray], config) -> Dict:
    """Map a reference ``VDRImageEncoder`` state_dict (src/ir/encoder/
    vdr_crossmodal_image.py:184-210) onto ``VDRImageModule``'s tree.

    Layout notes:
    - ``conv1.weight`` is torch NCHW [width, 3, P, P]; flax ``nn.Conv``
      wants [P, P, 3, width].
    - ``attn.in_proj_weight`` packs [q; k; v] along rows; our fused
      ``in_proj`` Dense splits the output the same way, so a plain
      transpose preserves the q/k/v order.
    """
    def lin(prefix):
        return {"kernel": _np(sd[prefix + ".weight"]).T,
                "bias": _np(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": _np(sd[prefix + ".weight"]),
                "bias": _np(sd[prefix + ".bias"])}

    params = {
        "conv1": {"kernel": _np(sd["conv1.weight"]).transpose(2, 3, 1, 0)},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_pre": ln("ln_pre"),
        "ln_post": ln("ln_post"),
        "proj": _np(sd["proj"]),
    }
    for i in range(config.layers):
        p = f"transformer.resblocks.{i}"
        params[f"block_{i}"] = {
            "ln_1": ln(f"{p}.ln_1"),
            "ln_2": ln(f"{p}.ln_2"),
            "in_proj": {"kernel": _np(sd[f"{p}.attn.in_proj_weight"]).T,
                        "bias": _np(sd[f"{p}.attn.in_proj_bias"])},
            "out_proj": lin(f"{p}.attn.out_proj"),
            "c_fc": lin(f"{p}.mlp.c_fc"),
            "c_proj": lin(f"{p}.mlp.c_proj"),
        }
    return params


def convert_dpr_params(sd: Mapping[str, np.ndarray], config: BertConfig
                       ) -> Dict:
    """Map a reference DPREncoder state_dict (``bert_model.*``) onto
    ``DPRModule``'s tree."""
    bert_sd = {k[len("bert_model."):]: v for k, v in sd.items()
               if k.startswith("bert_model.")}
    if not bert_sd:
        bert_sd = dict(sd)
    return {"bert": convert_bert_params(bert_sd, config)}


def bert_config_from_hf(hf_config) -> BertConfig:
    """Build our static config from an HF BertConfig instance/dict."""
    get = (hf_config.get if isinstance(hf_config, dict)
           else lambda k, d=None: getattr(hf_config, k, d))
    return BertConfig(
        vocab_size=get("vocab_size", 30522),
        hidden_size=get("hidden_size", 768),
        num_hidden_layers=get("num_hidden_layers", 12),
        num_attention_heads=get("num_attention_heads", 12),
        intermediate_size=get("intermediate_size", 3072),
        max_position_embeddings=get("max_position_embeddings", 512),
        type_vocab_size=get("type_vocab_size", 2),
        layer_norm_eps=get("layer_norm_eps", 1e-12),
        hidden_dropout_prob=get("hidden_dropout_prob", 0.1),
        attention_probs_dropout_prob=get(
            "attention_probs_dropout_prob", 0.1),
    )
