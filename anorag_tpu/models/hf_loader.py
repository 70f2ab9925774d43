"""Load HuggingFace XLM-R/BERT-family encoder weights into the JAX encoder.

The reference runs bge-m3 through sentence-transformers/torch
(/root/reference/vector_store/embedding_manager.py:6-8). Here the same
checkpoint powers the pjit-shardable JAX encoder: a torch state_dict
(XLMRobertaModel / BertModel layout) is converted into the encoder's param
tree with exact numerics (verified against transformers in tests):

  * q/k/v/out projections -> the packed (H, 3, heads, dh) qkv tensor;
  * token-type embedding row 0 is folded into the position table (RoBERTa
    adds it uniformly to every token);
  * RoBERTa's position offset (padding_idx + 1 = 2) is absorbed by slicing
    the position table, so our arange positions line up;
  * erf-GELU and post-LayerNorm match the HF architecture.

Everything is gated local-files-only: nothing downloads.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from anorag_tpu.models.encoder import EncoderConfig, init_params
from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.models")


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      np.float32)


def convert_state_dict(
    sd: Dict[str, Any],
    cfg: EncoderConfig,
    prefix: str = "",
    position_offset: int = 2,
) -> Dict[str, Any]:
    """torch state_dict (BertModel/XLMRobertaModel layout) -> param tree."""
    import jax.numpy as jnp

    def get(name: str) -> np.ndarray:
        return _t(sd[prefix + name])

    h, n, dh = cfg.hidden_size, cfg.num_heads, cfg.head_dim
    dtype = cfg.dtype

    word = get("embeddings.word_embeddings.weight")              # (V, H)
    pos = get("embeddings.position_embeddings.weight")           # (P, H)
    if position_offset:
        pos = pos[position_offset:]
    tt_key = prefix + "embeddings.token_type_embeddings.weight"
    if tt_key in sd:
        pos = pos + _t(sd[tt_key])[0][None, :]                   # fold type-0 row
    pos = pos[: cfg.max_position]

    params: Dict[str, Any] = {
        "tok_emb": jnp.asarray(word[: cfg.vocab_size], dtype),
        "pos_emb": jnp.asarray(pos, dtype),
        "emb_ln": {
            "scale": jnp.asarray(get("embeddings.LayerNorm.weight"), jnp.float32),
            "bias": jnp.asarray(get("embeddings.LayerNorm.bias"), jnp.float32),
        },
        "layers": [],
    }
    for l in range(cfg.num_layers):
        lp = f"encoder.layer.{l}."
        q_w = get(lp + "attention.self.query.weight")            # (H, H), y = W x
        k_w = get(lp + "attention.self.key.weight")
        v_w = get(lp + "attention.self.value.weight")
        # ours: einsum("bsh,htnd->tbsnd") => weight[h_in, t, head, dh]
        qkv = np.stack([q_w.T, k_w.T, v_w.T], axis=1)            # (H, 3, H)
        qkv = qkv.reshape(h, 3, n, dh)
        qkv_b = np.stack([
            get(lp + "attention.self.query.bias"),
            get(lp + "attention.self.key.bias"),
            get(lp + "attention.self.value.bias"),
        ]).reshape(3, n, dh)
        out_w = get(lp + "attention.output.dense.weight")        # (H, H)
        attn_out = out_w.T.reshape(n, dh, h)                     # ours: (n, dh, h)
        params["layers"].append({
            "qkv": jnp.asarray(qkv, dtype),
            "qkv_b": jnp.asarray(qkv_b, dtype),
            "attn_out": jnp.asarray(attn_out, dtype),
            "attn_out_b": jnp.asarray(get(lp + "attention.output.dense.bias"), dtype),
            "ln1": {
                "scale": jnp.asarray(get(lp + "attention.output.LayerNorm.weight"), jnp.float32),
                "bias": jnp.asarray(get(lp + "attention.output.LayerNorm.bias"), jnp.float32),
            },
            "ffn_in": jnp.asarray(get(lp + "intermediate.dense.weight").T, dtype),
            "ffn_in_b": jnp.asarray(get(lp + "intermediate.dense.bias"), dtype),
            "ffn_out": jnp.asarray(get(lp + "output.dense.weight").T, dtype),
            "ffn_out_b": jnp.asarray(get(lp + "output.dense.bias"), dtype),
            "ln2": {
                "scale": jnp.asarray(get(lp + "output.LayerNorm.weight"), jnp.float32),
                "bias": jnp.asarray(get(lp + "output.LayerNorm.bias"), jnp.float32),
            },
        })
    return params


def config_from_hf(hf_config, pooling: str = "cls",
                   dtype: str = "float32") -> EncoderConfig:
    import jax.numpy as jnp

    return EncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position=hf_config.max_position_embeddings - 2,
        pooling=pooling,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
    )


def load_hf_encoder(
    model_name_or_path: str,
    pooling: str = "cls",
    dtype: str = "bfloat16",
) -> Optional[Tuple[Dict[str, Any], EncoderConfig]]:
    """Load a locally-cached HF checkpoint into (params, EncoderConfig).

    Returns None when the checkpoint is not available locally — callers fall
    back to random init (documented behavior without downloaded assets).
    """
    try:
        import torch  # noqa: F401
        from transformers import AutoModel

        model = AutoModel.from_pretrained(model_name_or_path, local_files_only=True)
    except Exception as e:
        logger.info("HF checkpoint %s unavailable locally (%s)",
                    model_name_or_path, type(e).__name__)
        return None
    cfg = config_from_hf(model.config, pooling=pooling, dtype=dtype)
    prefix = "roberta." if any(k.startswith("roberta.") for k in model.state_dict()) else ""
    params = convert_state_dict(model.state_dict(), cfg, prefix=prefix)
    logger.info("loaded HF weights from %s (%d layers, %d hidden)",
                model_name_or_path, cfg.num_layers, cfg.hidden_size)
    return params, cfg
