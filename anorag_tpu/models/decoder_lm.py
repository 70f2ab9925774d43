"""TPU causal decoder LM: the in-framework generative model.

The reference generates atomic notes and final answers through EXTERNAL
LLM servers (/root/reference/llm/local_llm.py:22-501 dispatching to
ollama/lmstudio HTTP endpoints). This module is the TPU-native
counterpart: a first-party byte-level decoder transformer whose
generation loop is a single compiled program (prefill + `lax.scan`
KV-cache decode — no per-token host round trips, which matters through
a tunneled device), trainable in-image so the LLM pipeline (prompt ->
JSON notes -> parse -> retry) can be exercised against a real
autoregressive model with zero downloaded assets.

Design notes:
  * Byte-level vocab (259 used ids padded to 384 for lane alignment):
    invertible with no learned tokenizer artifact; any prompt/output
    text round-trips exactly.
  * Pre-LN blocks + RoPE. RoPE attention depends only on relative
    offsets, so generation LEFT-pads prompts: every row's last prompt
    byte lands at the same column and decode appends at uniform
    positions with no per-row cache bookkeeping.
  * Prefill computes the whole prompt in one (B, P) forward and writes
    the KV cache; decode is `lax.scan` over single-token steps against
    the cache. Stop bookkeeping (EOS freeze) is carried as a mask —
    static shapes, one compile per (P-bucket, max_new) pair.
  * Weights are tied (lm_head = tok_emb.T); params carry PartitionSpecs
    (heads/FFN over 'model', batch over 'data') like models/encoder.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

Params = Dict[str, Any]

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
_BYTE0 = 3                       # byte b encodes as _BYTE0 + b
N_USED = _BYTE0 + 256            # 259


class ByteTokenizer:
    """Invertible byte-level tokenizer (ids 3..258 = bytes 0..255)."""

    vocab_size = N_USED

    def encode(self, text: str, add_bos: bool = False,
               add_eos: bool = False) -> List[int]:
        ids = [_BYTE0 + b for b in text.encode("utf-8")]
        if add_bos:
            ids = [BOS_ID] + ids
        if add_eos:
            ids = ids + [EOS_ID]
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        bs = bytes(i - _BYTE0 for i in ids if _BYTE0 <= i < N_USED)
        return bs.decode("utf-8", errors="replace")


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 384        # >= N_USED, lane-aligned
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 8
    intermediate_size: int = 1024
    max_len: int = 2048          # cache capacity (prompt + generated)
    dtype: Any = jnp.float32     # f32 default: CPU training exactness

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny() -> "DecoderConfig":
        return DecoderConfig(hidden_size=64, num_layers=2, num_heads=2,
                             intermediate_size=128, max_len=256)

    @staticmethod
    def from_config(cfg: Dict[str, Any]) -> "DecoderConfig":
        return DecoderConfig(
            vocab_size=int(cfg.get("vocab_size", 384)),
            hidden_size=int(cfg.get("hidden_size", 256)),
            num_layers=int(cfg.get("num_layers", 4)),
            num_heads=int(cfg.get("num_heads", 8)),
            intermediate_size=int(cfg.get("intermediate_size", 1024)),
            max_len=int(cfg.get("max_len", 2048)),
            dtype=jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32,
        )

    def as_dict(self) -> Dict[str, Any]:
        return {
            "vocab_size": self.vocab_size, "hidden_size": self.hidden_size,
            "num_layers": self.num_layers, "num_heads": self.num_heads,
            "intermediate_size": self.intermediate_size, "max_len": self.max_len,
            "dtype": "bfloat16" if self.dtype == jnp.bfloat16 else "float32",
        }


def init_params(key: jax.Array, cfg: DecoderConfig) -> Params:
    keys = jax.random.split(key, 2 + cfg.num_layers)
    h, i_sz = cfg.hidden_size, cfg.intermediate_size
    scale = 0.02

    def dense(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    params: Params = {
        "tok_emb": dense(keys[0], (cfg.vocab_size, h)),
        "final_ln": {"scale": jnp.ones((h,), jnp.float32),
                     "bias": jnp.zeros((h,), jnp.float32)},
        "layers": [],
    }
    for l in range(cfg.num_layers):
        k = jax.random.split(keys[2 + l], 4)
        # residual-path outputs scaled down by depth (GPT-2 style)
        out_scale = scale / np.sqrt(2.0 * cfg.num_layers)
        params["layers"].append({
            "ln1": {"scale": jnp.ones((h,), jnp.float32),
                    "bias": jnp.zeros((h,), jnp.float32)},
            "qkv": dense(k[0], (h, 3, cfg.num_heads, cfg.head_dim)),
            "attn_out": (jax.random.normal(k[1], (cfg.num_heads, cfg.head_dim, h),
                                           jnp.float32) * out_scale).astype(cfg.dtype),
            "ln2": {"scale": jnp.ones((h,), jnp.float32),
                    "bias": jnp.zeros((h,), jnp.float32)},
            "ffn_in": dense(k[2], (h, i_sz)),
            "ffn_out": (jax.random.normal(k[3], (i_sz, h),
                                          jnp.float32) * out_scale).astype(cfg.dtype),
        })
    return params


def param_pspecs(cfg: DecoderConfig, model_axis: str = "model") -> Params:
    m = model_axis
    layer = {
        "ln1": {"scale": P(), "bias": P()},
        "qkv": P(None, None, m, None),
        "attn_out": P(m, None, None),
        "ln2": {"scale": P(), "bias": P()},
        "ffn_in": P(None, m),
        "ffn_out": P(m, None),
    }
    return {
        "tok_emb": P(m, None),
        "final_ln": {"scale": P(), "bias": P()},
        "layers": [layer for _ in range(cfg.num_layers)],
    }


def _layer_norm(x: jnp.ndarray, ln: Dict[str, jnp.ndarray],
                eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * ln["scale"]
            + ln["bias"]).astype(x.dtype)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, head_dim: int,
          base: float = 10000.0) -> jnp.ndarray:
    """Rotary embedding over the last dim. x: (B, S, N, Dh), positions (S,)."""
    half = head_dim // 2
    freqs = 1.0 / (base ** (np.arange(half, dtype=np.float32) / half))
    ang = positions.astype(jnp.float32)[:, None] * freqs[None, :]   # (S, half)
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    ).astype(x.dtype)


def _qkv(x: jnp.ndarray, lp: Params) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    qkv = jnp.einsum("bsh,htnd->tbsnd", x, lp["qkv"])
    return qkv[0], qkv[1], qkv[2]                         # each (B, S, N, Dh)


def _attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
            allowed: jnp.ndarray, lp: Params, cfg: DecoderConfig) -> jnp.ndarray:
    """q (B,S,N,Dh) vs keys (B,T,N,Dh); allowed (B,S,T) bool."""
    logits = jnp.einsum("bsnd,btnd->bnst", q, k).astype(jnp.float32)
    logits = logits / np.sqrt(cfg.head_dim)
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(allowed[:, None, :, :], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bnst,btnd->bsnd", probs, v)
    return jnp.einsum("bsnd,ndh->bsh", ctx, lp["attn_out"])


def _ffn(x: jnp.ndarray, lp: Params) -> jnp.ndarray:
    ff = jax.nn.gelu(jnp.dot(x, lp["ffn_in"]), approximate=True)
    return jnp.dot(ff, lp["ffn_out"])


def forward(params: Params, token_ids: jnp.ndarray, cfg: DecoderConfig,
            attn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full-sequence causal forward: (B, S) ids -> (B, S, V) f32 logits.

    attn_mask (B, S) marks valid tokens (left- OR right-padding excluded
    from keys); causality is applied on top.
    """
    b, s = token_ids.shape
    x = params["tok_emb"][token_ids].astype(cfg.dtype)
    pos = jnp.arange(s)
    causal = pos[None, :, None] >= pos[None, None, :]     # (1, S, T)
    if attn_mask is None:
        allowed = jnp.broadcast_to(causal, (b, s, s))
    else:
        allowed = causal & (attn_mask[:, None, :] > 0)
    for lp in params["layers"]:
        h = _layer_norm(x, lp["ln1"])
        q, k, v = _qkv(h, lp)
        q, k = _rope(q, pos, cfg.head_dim), _rope(k, pos, cfg.head_dim)
        x = x + _attend(q, k, v, allowed, lp, cfg)
        x = x + _ffn(_layer_norm(x, lp["ln2"]), lp)
    x = _layer_norm(x, params["final_ln"])
    return jnp.dot(x.astype(jnp.float32),
                   params["tok_emb"].astype(jnp.float32).T)


# ----------------------------------------------------------------- loss
def lm_loss(params: Params, batch: Dict[str, jnp.ndarray],
            cfg: DecoderConfig) -> jnp.ndarray:
    """Next-token CE masked to completion tokens.

    batch: ids (B, S) i32, loss_mask (B, S) f32 — mask[i, t] weights the
    prediction OF token t (from position t-1).
    """
    ids, mask = batch["ids"], batch["loss_mask"]
    logits = forward(params, ids[:, :-1], cfg,
                     attn_mask=(ids[:, :-1] != PAD_ID).astype(jnp.int32))
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[:, :, None], axis=-1)[:, :, 0]
    w = mask[:, 1:]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_train_step(cfg: DecoderConfig, optimizer):
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(lambda p: lm_loss(p, batch, cfg))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: (a + u).astype(a.dtype),
                              params, updates)
        return params, opt_state, loss
    return train_step


# ------------------------------------------------------------ generation
def _prefill(params: Params, ids: jnp.ndarray, pad_lens: jnp.ndarray,
             cfg: DecoderConfig) -> Tuple[jnp.ndarray, List[Dict[str, jnp.ndarray]]]:
    """LEFT-padded prompt (B, Pb) -> (last-position logits, KV cache).

    Cache buffers are (B, max_len, N, Dh) with prompt K/V in columns
    [0, Pb); decode appends at Pb, Pb+1, ...
    """
    b, pb = ids.shape
    pos = jnp.arange(pb)
    valid = pos[None, :] >= pad_lens[:, None]             # (B, Pb)
    causal = pos[None, :, None] >= pos[None, None, :]
    allowed = causal & valid[:, None, :]
    x = params["tok_emb"][ids].astype(cfg.dtype)
    cache: List[Dict[str, jnp.ndarray]] = []
    for lp in params["layers"]:
        h = _layer_norm(x, lp["ln1"])
        q, k, v = _qkv(h, lp)
        q, k = _rope(q, pos, cfg.head_dim), _rope(k, pos, cfg.head_dim)
        ck = jnp.zeros((b, cfg.max_len, cfg.num_heads, cfg.head_dim), cfg.dtype)
        cv = jnp.zeros_like(ck)
        cache.append({"k": jax.lax.dynamic_update_slice(ck, k, (0, 0, 0, 0)),
                      "v": jax.lax.dynamic_update_slice(cv, v, (0, 0, 0, 0))})
        x = x + _attend(q, k, v, allowed, lp, cfg)
        x = x + _ffn(_layer_norm(x, lp["ln2"]), lp)
    x = _layer_norm(x, params["final_ln"])
    logits = jnp.dot(x[:, -1, :].astype(jnp.float32),
                     params["tok_emb"].astype(jnp.float32).T)
    return logits, cache


def _decode_step(params: Params, tok: jnp.ndarray, step_pos: jnp.ndarray,
                 pad_lens: jnp.ndarray, cache, cfg: DecoderConfig):
    """One token (B,) at absolute position step_pos -> (logits, cache)."""
    b = tok.shape[0]
    x = params["tok_emb"][tok][:, None, :].astype(cfg.dtype)   # (B, 1, H)
    tpos = jnp.arange(cfg.max_len)
    key_ok = (tpos[None, :] >= pad_lens[:, None]) & (tpos[None, :] <= step_pos)
    allowed = key_ok[:, None, :]                               # (B, 1, T)
    pos1 = step_pos[None]
    new_cache = []
    for lp, c in zip(params["layers"], cache):
        h = _layer_norm(x, lp["ln1"])
        q, k, v = _qkv(h, lp)
        q, k = _rope(q, pos1, cfg.head_dim), _rope(k, pos1, cfg.head_dim)
        ck = jax.lax.dynamic_update_slice(c["k"], k, (0, step_pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(c["v"], v, (0, step_pos, 0, 0))
        new_cache.append({"k": ck, "v": cv})
        x = x + _attend(q, ck, cv, allowed, lp, cfg)
        x = x + _ffn(_layer_norm(x, lp["ln2"]), lp)
    x = _layer_norm(x, params["final_ln"])
    logits = jnp.dot(x[:, 0, :].astype(jnp.float32),
                     params["tok_emb"].astype(jnp.float32).T)
    return logits, new_cache


def _mask_unused(logits: jnp.ndarray) -> jnp.ndarray:
    """Padding vocab rows (>= N_USED) and PAD/BOS can never be sampled."""
    neg = jnp.finfo(jnp.float32).min
    v = logits.shape[-1]
    bad = (jnp.arange(v) >= N_USED) | (jnp.arange(v) == PAD_ID) \
        | (jnp.arange(v) == BOS_ID)
    return jnp.where(bad[None, :], neg, logits)


def _pick(logits: jnp.ndarray, key: jax.Array, temperature: float) -> jnp.ndarray:
    logits = _mask_unused(logits)
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)


def generate_fn(cfg: DecoderConfig, max_new: int, temperature: float = 0.0):
    """Compiled generator: (params, ids (B,Pb), pad_lens (B,), key) ->
    (B, max_new) i32 tokens (PAD after EOS). One compile per (Pb, max_new)."""

    def gen(params, ids, pad_lens, key):
        logits, cache = _prefill(params, ids, pad_lens, cfg)
        pb = ids.shape[1]
        key, sub = jax.random.split(key)
        tok = _pick(logits, sub, temperature)
        done = tok == EOS_ID

        def step(carry, i):
            tok, done, cache, key = carry
            key, sub = jax.random.split(key)
            emit = jnp.where(done, PAD_ID, tok)
            logits, cache = _decode_step(params, emit, pb + i, pad_lens,
                                         cache, cfg)
            nxt = _pick(logits, sub, temperature)
            nxt_done = done | (nxt == EOS_ID)
            return (nxt, nxt_done, cache, key), emit

        (_, _, _, _), toks = jax.lax.scan(
            step, (tok, done, cache, key), jnp.arange(max_new))
        return toks.T                                       # (B, max_new)

    return jax.jit(gen)


class DecoderLM:
    """Host-side wrapper: tokenize, bucket, run the compiled generator."""

    def __init__(self, params: Params, cfg: DecoderConfig,
                 prompt_bucket: int = 128, max_prompt: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.tok = ByteTokenizer()
        self.prompt_bucket = prompt_bucket
        self.max_prompt = max_prompt or (cfg.max_len // 2)
        self._gen_cache: Dict[Tuple[int, int, float], Any] = {}

    def _bucket(self, n: int) -> int:
        b = self.prompt_bucket
        return min(self.max_prompt, max(b, ((n + b - 1) // b) * b))

    def generate(self, prompts: Sequence[str], max_new: int = 512,
                 temperature: float = 0.0, seed: int = 0) -> List[str]:
        if not prompts:
            return []
        n_real = len(prompts)
        enc = [self.tok.encode(p, add_bos=True)[-self.max_prompt:]
               for p in prompts]
        # batch bucketed to powers of two: every (batch, P-bucket, max_new)
        # triple is one compile, and shape churn exhausts this rig's
        # address space (vm.max_map_count) when per-item shapes leak
        nb = 1
        while nb < n_real:
            nb *= 2
        enc = enc + [enc[0]] * (nb - n_real)
        pb = self._bucket(max(len(e) for e in enc))
        max_new = min(max_new, self.cfg.max_len - pb)
        ids = np.full((len(enc), pb), PAD_ID, np.int32)
        pad_lens = np.zeros((len(enc),), np.int32)
        for i, e in enumerate(enc):
            e = e[-pb:]
            ids[i, pb - len(e):] = e                       # LEFT pad
            pad_lens[i] = pb - len(e)
        sig = (pb, max_new, float(temperature))
        fn = self._gen_cache.get(sig)
        if fn is None:
            fn = generate_fn(self.cfg, max_new, temperature)
            self._gen_cache[sig] = fn
        toks = np.asarray(fn(self.params, jnp.asarray(ids),
                             jnp.asarray(pad_lens),
                             jax.random.PRNGKey(seed)))
        out = []
        for row in toks[:n_real]:
            stop = np.nonzero(row == PAD_ID)[0]
            end = int(stop[0]) if stop.size else len(row)
            out.append(self.tok.decode(row[:end].tolist()))
        return out


# -------------------------------------------------------- checkpoint io
def save_lm(path, params: Params, cfg: DecoderConfig) -> None:
    import json
    from pathlib import Path
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    flat = {}
    flat["tok_emb"] = np.asarray(params["tok_emb"], np.float32)
    flat["final_ln.scale"] = np.asarray(params["final_ln"]["scale"], np.float32)
    flat["final_ln.bias"] = np.asarray(params["final_ln"]["bias"], np.float32)
    for i, lp in enumerate(params["layers"]):
        for k in ("qkv", "attn_out", "ffn_in", "ffn_out"):
            flat[f"l{i}.{k}"] = np.asarray(lp[k], np.float32)
        for ln in ("ln1", "ln2"):
            flat[f"l{i}.{ln}.scale"] = np.asarray(lp[ln]["scale"], np.float32)
            flat[f"l{i}.{ln}.bias"] = np.asarray(lp[ln]["bias"], np.float32)
    np.savez_compressed(p / "params.npz", **flat)
    (p / "config.json").write_text(json.dumps(cfg.as_dict()))


def load_lm(path) -> Tuple[Params, DecoderConfig]:
    import json
    from pathlib import Path
    p = Path(path)
    cfg = DecoderConfig.from_config(json.loads((p / "config.json").read_text()))
    z = np.load(p / "params.npz")
    dt = cfg.dtype

    def a(name, keep_f32=False):
        arr = jnp.asarray(z[name])
        return arr if keep_f32 else arr.astype(dt)

    params: Params = {
        "tok_emb": a("tok_emb"),
        "final_ln": {"scale": a("final_ln.scale", True),
                     "bias": a("final_ln.bias", True)},
        "layers": [],
    }
    for i in range(cfg.num_layers):
        params["layers"].append({
            "qkv": a(f"l{i}.qkv"),
            "attn_out": a(f"l{i}.attn_out"),
            "ffn_in": a(f"l{i}.ffn_in"),
            "ffn_out": a(f"l{i}.ffn_out"),
            "ln1": {"scale": a(f"l{i}.ln1.scale", True),
                    "bias": a(f"l{i}.ln1.bias", True)},
            "ln2": {"scale": a(f"l{i}.ln2.scale", True),
                    "bias": a(f"l{i}.ln2.bias", True)},
        })
    return params, cfg
