"""Listwise cross-encoder reranker model.

Parity target: /root/reference/retrieval/listt5_reranker.py:29-230 — the
reference scores candidate lists with a trained T5 listwise model and fuses
at `calibration.listt5_weight`. The TPU-native replacement is a single-
stream bidirectional transformer over `[CLS] query [SEP] candidate [SEP]`
(segment embeddings distinguish the two spans); the CLS state feeds a
scalar relevance head. Training is listwise softmax cross-entropy over
slates of one positive + m in-domain negatives — the same from-scratch
synthetic recipe that trains the retrieval encoder (models/train.py), so
the model is trainable fully in-image with zero downloaded weights.

All shapes are static/bucketed (pad to 128-multiples) so the scorer jits
once per bucket; batches of (query, candidate) pairs run as one MXU matmul
stack, never a Python loop over candidates.
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anorag_tpu.models import encoder as enc
from anorag_tpu.models.tokenizer import CLS_ID, PAD_ID, SEP_ID, HashTokenizer
from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.xenc")

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CrossEncoderConfig:
    vocab_size: int = 8192
    hidden_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    intermediate_size: int = 256
    max_position: int = 256
    # f32 params: at this scale bf16 weight rounding stalls from-scratch
    # training (measured: heldout MRR 0.63 bf16 vs 0.94 f32 on the slate
    # regression task); TPU matmuls still run bf16 passes under XLA.
    dtype: Any = jnp.float32

    def encoder_cfg(self) -> enc.EncoderConfig:
        return enc.EncoderConfig(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            max_position=self.max_position, pooling="cls",
            dtype=self.dtype, normalize=False,
        )

    @staticmethod
    def from_config(cfg: Dict[str, Any]) -> "CrossEncoderConfig":
        return CrossEncoderConfig(
            vocab_size=cfg.get("vocab_size", 8192),
            hidden_size=cfg.get("hidden_size", 128),
            num_layers=cfg.get("num_layers", 2),
            num_heads=cfg.get("num_heads", 4),
            intermediate_size=cfg.get("intermediate_size", 256),
            max_position=cfg.get("max_position", 256),
        )


def init_params(key: jax.Array, cfg: CrossEncoderConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params = enc.init_params(k1, cfg.encoder_cfg())
    params["seg_emb"] = (
        jax.random.normal(k2, (2, cfg.hidden_size), jnp.float32) * 0.02
    ).astype(cfg.dtype)
    params["head_w"] = (
        jax.random.normal(k3, (cfg.hidden_size,), jnp.float32) * 0.02
    )
    params["head_b"] = jnp.zeros((), jnp.float32)
    return params


def score(params: Params, ids: jnp.ndarray, mask: jnp.ndarray,
          seg: jnp.ndarray, cfg: CrossEncoderConfig) -> jnp.ndarray:
    """(B, L) packed pair tokens -> (B,) f32 relevance logits."""
    ecfg = cfg.encoder_cfg()
    s = ids.shape[1]
    x = (params["tok_emb"][ids]
         + params["pos_emb"][:s][None, :, :]
         + params["seg_emb"][seg])
    x = enc._layer_norm(x.astype(ecfg.dtype), params["emb_ln"])
    for lp in params["layers"]:
        x = enc._block(x, mask, lp, ecfg)
    cls = x[:, 0, :].astype(jnp.float32)
    return cls @ params["head_w"] + params["head_b"]


def listwise_loss(params: Params, batch: Dict[str, jnp.ndarray],
                  cfg: CrossEncoderConfig) -> jnp.ndarray:
    """Slates (B, S, L): position 0 is the positive; softmax CE over the
    slate — the listwise objective (ref ListT5 'fusion-in-decoder' ranking
    reduces to the same list-softmax supervision)."""
    b, s, l = batch["ids"].shape
    flat = lambda a: a.reshape(b * s, l)
    logits = score(params, flat(batch["ids"]), flat(batch["mask"]),
                   flat(batch["seg"]), cfg).reshape(b, s)
    return jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[:, 0])


def make_train_step(cfg: CrossEncoderConfig, optimizer):
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: listwise_loss(p, batch, cfg))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: (a + u).astype(a.dtype),
                              params, updates)
        return params, opt_state, loss

    return train_step


def pack_pair(tokenizer, query_ids: List[int], text: str,
              max_length: int) -> Tuple[List[int], List[int]]:
    """[CLS] q [SEP] t [SEP] token ids + segment ids (0=query, 1=candidate)."""
    t_ids = tokenizer.token_ids(text)
    budget = max_length - 3 - len(query_ids)
    t_ids = t_ids[: max(budget, 8)]
    ids = [CLS_ID] + query_ids + [SEP_ID] + t_ids + [SEP_ID]
    ids = ids[:max_length]
    seg = [0] * min(len(query_ids) + 2, len(ids))
    seg += [1] * (len(ids) - len(seg))
    return ids, seg


def _bucket_width(n: int, max_length: int) -> int:
    return min(max_length, ((n + 127) // 128) * 128)


def pack_batch(tokenizer, query: str, texts: Sequence[str],
               max_length: int) -> Dict[str, np.ndarray]:
    q_ids = tokenizer.token_ids(query)[: max_length // 2]
    rows = [pack_pair(tokenizer, q_ids, t, max_length) for t in texts]
    width = _bucket_width(max(len(r[0]) for r in rows), max_length)
    ids = np.full((len(rows), width), PAD_ID, np.int32)
    mask = np.zeros((len(rows), width), np.int32)
    seg = np.zeros((len(rows), width), np.int32)
    for i, (r_ids, r_seg) in enumerate(rows):
        r_ids, r_seg = r_ids[:width], r_seg[:width]
        ids[i, : len(r_ids)] = r_ids
        mask[i, : len(r_ids)] = 1
        seg[i, : len(r_seg)] = r_seg
    return {"ids": ids, "mask": mask, "seg": seg}


class CrossEncoderReranker:
    """Inference + training wrapper with static-shape jit caching."""

    def __init__(self, cfg: Optional[CrossEncoderConfig] = None,
                 params: Optional[Params] = None, seed: int = 0,
                 max_length: int = 256, tokenizer=None):
        self.cfg = cfg or CrossEncoderConfig()
        self.max_length = min(max_length, self.cfg.max_position)
        self.tokenizer = tokenizer or HashTokenizer(
            self.cfg.vocab_size, self.max_length)
        self.params = params if params is not None else init_params(
            jax.random.PRNGKey(seed), self.cfg)
        self._score = jax.jit(
            lambda p, ids, mask, seg: score(p, ids, mask, seg, self.cfg))
        self.trained = params is not None

    # ----------------------------------------------------------- scoring
    def score_pairs(self, query: str, texts: Sequence[str]) -> np.ndarray:
        """(len(texts),) f32 relevance logits, one jitted batch per bucket."""
        if not texts:
            return np.zeros((0,), np.float32)
        batch = pack_batch(self.tokenizer, query, texts, self.max_length)
        # pad batch rows to a multiple of 8 (one compile per (rows, width))
        n = len(texts)
        n_pad = ((n + 7) // 8) * 8
        if n_pad != n:
            batch = {k: np.pad(v, ((0, n_pad - n), (0, 0)),
                               constant_values=PAD_ID if k == "ids" else 0)
                     for k, v in batch.items()}
        out = self._score(self.params, jnp.asarray(batch["ids"]),
                          jnp.asarray(batch["mask"]), jnp.asarray(batch["seg"]))
        return np.asarray(out)[:n]

    # ---------------------------------------------------------- training
    def train(self, slates: Sequence[Tuple[str, str, Sequence[str]]],
              epochs: int = 3, batch_size: int = 8, slate_size: int = 4,
              learning_rate: float = 3e-4, max_length: int = 128,
              seed: int = 0, log_every: int = 20) -> List[float]:
        """slates: (query, positive_text, negative_texts). Listwise CE."""
        import optax

        optimizer = optax.adamw(learning_rate, weight_decay=0.01)
        opt_state = optimizer.init(self.params)
        step_fn = jax.jit(make_train_step(self.cfg, optimizer))
        rng = np.random.default_rng(seed)
        history: List[float] = []
        t0 = time.perf_counter()
        max_length = min(max_length, self.max_length)
        batch_size = max(1, min(batch_size, len(slates)))
        for epoch in range(epochs):
            order = rng.permutation(len(slates))
            for i in range(0, len(order) - batch_size + 1, batch_size):
                rows = []
                for j in order[i : i + batch_size]:
                    q, pos, negs = slates[j]
                    negs = list(negs)
                    if len(negs) >= slate_size - 1:
                        pick = rng.choice(len(negs), slate_size - 1, replace=False)
                    else:
                        pick = rng.choice(max(len(negs), 1), slate_size - 1,
                                          replace=True) if negs else []
                    texts = [pos] + [negs[p] for p in pick]
                    rows.append(pack_batch(self.tokenizer, q, texts, max_length))
                width = max(r["ids"].shape[1] for r in rows)

                def pad(a, fill):
                    return np.pad(a, ((0, 0), (0, width - a.shape[1])),
                                  constant_values=fill)

                batch = {
                    k: jnp.asarray(np.stack([
                        pad(r[k], PAD_ID if k == "ids" else 0) for r in rows]))
                    for k in ("ids", "mask", "seg")
                }
                self.params, opt_state, loss = step_fn(
                    self.params, opt_state, batch)
                history.append(float(loss))
                if len(history) % log_every == 0:
                    logger.info("xenc step %d loss %.4f (%.1f steps/s)",
                                len(history), history[-1],
                                len(history) / (time.perf_counter() - t0))
        self.trained = True
        return history

    # -------------------------------------------------------- checkpoints
    def save_checkpoint(self, path: str | Path) -> bool:
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(Path(path).resolve(), jax.device_get(self.params),
                       force=True)
            ckptr.wait_until_finished()
            return True
        except Exception as e:
            logger.warning("cross-encoder checkpoint save failed: %s", e)
            return False

    def restore_checkpoint(self, path: str | Path) -> bool:
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            self.params = ckptr.restore(Path(path).resolve(),
                                        jax.device_get(self.params))
            self.trained = True
            return True
        except Exception as e:
            logger.warning("cross-encoder checkpoint restore failed: %s", e)
            return False


def slates_from_notes(notes: Sequence[Dict[str, Any]], n_negatives: int = 6,
                      seed: int = 0) -> List[Tuple[str, str, List[str]]]:
    """In-domain listwise training data from atomic notes: the title +
    entities form a pseudo-query; its own content is the positive; other
    notes' contents are the negatives (same recipe as
    models/train.py::pairs_from_notes, extended with negatives)."""
    rng = np.random.default_rng(seed)
    texts = [str(n.get("content") or n.get("text") or "") for n in notes]
    out: List[Tuple[str, str, List[str]]] = []
    for i, n in enumerate(notes):
        ents = " ".join(str(e) for e in (n.get("entities") or [])[:3])
        q = f"{n.get('title', '')} {ents}".strip()
        if not q or not texts[i]:
            continue
        others = [j for j in range(len(notes)) if j != i and texts[j]]
        if not others:
            continue
        pick = rng.choice(others, min(n_negatives, len(others)), replace=False)
        out.append((q, texts[i], [texts[j] for j in pick]))
    return out
