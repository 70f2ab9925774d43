"""TPU transformer text encoder (bge-m3-class) with dp x tp sharding.

The reference encodes notes/queries through sentence-transformers on CUDA
(/root/reference/vector_store/embedding_manager.py:374-407). Here the
encoder is a hand-rolled JAX transformer (XLM-R-large geometry by default:
24 layers, 1024 hidden, 16 heads) whose parameters carry explicit
PartitionSpecs over a ('data', 'model') mesh:
  * attention heads and FFN intermediate dim are sharded over 'model'
    (tensor parallelism — XLA inserts the psum after the second matmul);
  * the batch is sharded over 'data';
  * embeddings are L2-normalized bf16 activations, f32 accumulation.

Also provides the contrastive (InfoNCE, in-batch negatives) training step
used to fine-tune retrieval encoders and exercised by the multi-chip
dry-run.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 250002
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position: int = 512
    pooling: str = "cls"          # cls | mean
    dtype: Any = jnp.bfloat16
    normalize: bool = True
    remat: bool = False           # checkpoint each block (training big configs)
    # master-parameter dtype. None -> dtype (bf16 weights: fine for
    # inference and for SMALL-config training). Training big configs needs
    # f32 masters: at 24L/1024h adamw updates are ~1e-3 of the weight and
    # bf16's ~3 significant digits round most of them to zero — the 24L
    # run plateaued at chance loss until masters went f32 (compute stays
    # bf16: encode() casts weight matrices to `dtype` in the forward).
    param_dtype: Any = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def small() -> "EncoderConfig":
        return EncoderConfig(vocab_size=1024, hidden_size=128, num_layers=2,
                             num_heads=4, intermediate_size=256, max_position=128)

    @staticmethod
    def from_config(cfg: Dict[str, Any]) -> "EncoderConfig":
        return EncoderConfig(
            vocab_size=cfg.get("vocab_size", 250002),
            hidden_size=cfg.get("hidden_size", 1024),
            num_layers=cfg.get("num_layers", 24),
            num_heads=cfg.get("num_heads", 16),
            intermediate_size=cfg.get("intermediate_size", 4096),
            max_position=cfg.get("max_position", 512),
            pooling=cfg.get("pooling", "cls"),
            dtype=jnp.bfloat16 if cfg.get("dtype", "bfloat16") == "bfloat16" else jnp.float32,
        )


def init_params(key: jax.Array, cfg: EncoderConfig) -> Params:
    keys = jax.random.split(key, 4 + cfg.num_layers)
    h, i_sz = cfg.hidden_size, cfg.intermediate_size
    scale = 0.02
    # residual-branch projections are down-scaled by 1/sqrt(2L) (GPT-2
    # scheme): a deep post-LN stack at uniform 0.02 init washes every
    # input apart — the 24L/1024h encoder produced near-identical pooled
    # embeddings for ALL sequences (random-init recall@10 0.28, InfoNCE
    # pinned at ln(B) with vanishing gradients). Shape-compatible with
    # XLM-R checkpoints (hf_loader overwrites values).
    res_scale = scale / max(1.0, (2.0 * cfg.num_layers) ** 0.5)
    pdtype = cfg.param_dtype or cfg.dtype

    def dense(k, shape, s=scale):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(pdtype)

    params: Params = {
        "tok_emb": dense(keys[0], (cfg.vocab_size, h)),
        "pos_emb": dense(keys[1], (cfg.max_position, h)),
        "emb_ln": {"scale": jnp.ones((h,), jnp.float32), "bias": jnp.zeros((h,), jnp.float32)},
        "layers": [],
    }
    for l in range(cfg.num_layers):
        k = jax.random.split(keys[4 + l], 8)
        params["layers"].append(
            {
                "qkv": dense(k[0], (h, 3, cfg.num_heads, cfg.head_dim)),
                "qkv_b": jnp.zeros((3, cfg.num_heads, cfg.head_dim), pdtype),
                "attn_out": dense(k[1], (cfg.num_heads, cfg.head_dim, h),
                                  res_scale),
                "attn_out_b": jnp.zeros((h,), pdtype),
                "ln1": {"scale": jnp.ones((h,), jnp.float32), "bias": jnp.zeros((h,), jnp.float32)},
                "ffn_in": dense(k[2], (h, i_sz)),
                "ffn_in_b": jnp.zeros((i_sz,), pdtype),
                "ffn_out": dense(k[3], (i_sz, h), res_scale),
                "ffn_out_b": jnp.zeros((h,), pdtype),
                "ln2": {"scale": jnp.ones((h,), jnp.float32), "bias": jnp.zeros((h,), jnp.float32)},
            }
        )
    return params


def param_pspecs(cfg: EncoderConfig, model_axis: str = "model") -> Params:
    """PartitionSpec tree: heads/intermediate sharded over the model axis."""
    m = model_axis
    layer = {
        "qkv": P(None, None, m, None),
        "qkv_b": P(None, m, None),
        "attn_out": P(m, None, None),
        "attn_out_b": P(),
        "ln1": {"scale": P(), "bias": P()},
        "ffn_in": P(None, m),
        "ffn_in_b": P(m),
        "ffn_out": P(m, None),
        "ffn_out_b": P(),
        "ln2": {"scale": P(), "bias": P()},
    }
    return {
        "tok_emb": P(m, None),   # vocab-sharded embedding table
        "pos_emb": P(),
        "emb_ln": {"scale": P(), "bias": P()},
        "layers": [layer for _ in range(cfg.num_layers)],
    }


def _layer_norm(x: jnp.ndarray, ln: Dict[str, jnp.ndarray], eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * ln["scale"] + ln["bias"]).astype(x.dtype)


def _attention(x: jnp.ndarray, mask: jnp.ndarray, lp: Params, cfg: EncoderConfig) -> jnp.ndarray:
    b, s, h = x.shape
    qkv = jnp.einsum("bsh,htnd->tbsnd", x, lp["qkv"]) + lp["qkv_b"][:, None, None]
    q, k, v = qkv[0], qkv[1], qkv[2]                      # (B, S, N, Dh)
    logits = jnp.einsum("bsnd,btnd->bnst", q, k).astype(jnp.float32)
    logits = logits / np.sqrt(cfg.head_dim)
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(mask[:, None, None, :] > 0, logits, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bnst,btnd->bsnd", probs, v)
    return jnp.einsum("bsnd,ndh->bsh", ctx, lp["attn_out"]) + lp["attn_out_b"]


def _block(x: jnp.ndarray, mask: jnp.ndarray, lp: Params, cfg: EncoderConfig) -> jnp.ndarray:
    x = _layer_norm(x + _attention(x, mask, lp, cfg), lp["ln1"])
    ff = jnp.dot(x, lp["ffn_in"]) + lp["ffn_in_b"]
    ff = jax.nn.gelu(ff, approximate=False)  # erf gelu: matches HF BERT/XLM-R
    ff = jnp.dot(ff, lp["ffn_out"]) + lp["ffn_out_b"]
    return _layer_norm(x + ff, lp["ln2"])


def encode(params: Params, token_ids: jnp.ndarray, mask: jnp.ndarray,
           cfg: EncoderConfig) -> jnp.ndarray:
    """(B, L) ids + mask -> (B, H) f32 (L2-normalized) embeddings."""
    pdtype = cfg.param_dtype or cfg.dtype
    if pdtype != cfg.dtype:
        # f32 masters, bf16 compute: cast weights once at entry (XLA fuses
        # the casts into the consuming matmuls; layernorm re-upcasts to
        # f32 internally as before)
        params = jax.tree.map(lambda a: a.astype(cfg.dtype), params)
    b, s = token_ids.shape
    x = params["tok_emb"][token_ids] + params["pos_emb"][:s][None, :, :]
    x = _layer_norm(x.astype(cfg.dtype), params["emb_ln"])
    # remat: save only block inputs, recompute activations in backward —
    # a 24L/1024h train step would otherwise hold ~26GB of activations
    # (attn probs + ffn intermediates x 24 layers x 2 encode passes) vs
    # ~1.6GB with per-layer checkpointing; v5e HBM is 16GB.
    blk = (jax.checkpoint(lambda h, m, lp: _block(h, m, lp, cfg))
           if cfg.remat else (lambda h, m, lp: _block(h, m, lp, cfg)))
    for lp in params["layers"]:
        x = blk(x, mask, lp)
    if cfg.pooling == "mean":
        m = mask[:, :, None].astype(jnp.float32)
        pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    else:
        pooled = x[:, 0, :].astype(jnp.float32)
    if cfg.normalize:
        pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)
    return pooled


# ------------------------------------------------------------- training
def info_nce_loss(params: Params, batch: Dict[str, jnp.ndarray], cfg: EncoderConfig,
                  temperature: float = 0.05) -> jnp.ndarray:
    """Contrastive loss: query i matches positive i, in-batch negatives."""
    q = encode(params, batch["q_ids"], batch["q_mask"], cfg)
    p = encode(params, batch["p_ids"], batch["p_mask"], cfg)
    logits = jnp.dot(q, p.T) / temperature                 # (B, B)
    labels = jnp.arange(q.shape[0])
    return jnp.mean(
        -jax.nn.log_softmax(logits, axis=-1)[labels, labels]
        - jax.nn.log_softmax(logits, axis=0)[labels, labels]
    ) * 0.5


def make_train_step(cfg: EncoderConfig, optimizer):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, loss)."""

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(lambda p: info_nce_loss(p, batch, cfg))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda a, b: (a + b).astype(a.dtype), params, updates
        )
        return params, opt_state, loss

    return train_step
