"""Encoder training loop: contrastive fine-tuning on the device mesh.

The reference is inference-only (SURVEY.md §5.4); this is the TPU-native
extension that makes retrieval encoders trainable in-framework: InfoNCE over
(query, positive-note) pairs with in-batch negatives, dp x tp sharding via
the mesh, orbax checkpointing, and deterministic data iteration.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from anorag_tpu.models import encoder as enc
from anorag_tpu.models.tokenizer import HashTokenizer
from anorag_tpu.parallel.mesh import DATA_AXIS, make_mesh
from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.train")


def make_pair_batches(
    pairs: Sequence[Tuple[str, str]],
    tokenizer,
    batch_size: int,
    max_length: int = 64,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffled epochs of (query, positive) token batches, static shapes."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(pairs))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        idx = order[i : i + batch_size]
        qs = [pairs[j][0] for j in idx]
        ps = [pairs[j][1] for j in idx]
        q_ids, q_mask = tokenizer.encode_batch(qs, max_length)
        p_ids, p_mask = tokenizer.encode_batch(ps, max_length)
        width = max(q_ids.shape[1], p_ids.shape[1])

        def pad(a, fill):
            return np.pad(a, ((0, 0), (0, width - a.shape[1])), constant_values=fill)

        yield {
            "q_ids": pad(q_ids, 2), "q_mask": pad(q_mask, 0),
            "p_ids": pad(p_ids, 2), "p_mask": pad(p_mask, 0),
        }


class EncoderTrainer:
    def __init__(
        self,
        cfg: Optional[enc.EncoderConfig] = None,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.01,
        model_parallel: int = 1,
        seed: int = 0,
    ):
        self.cfg = cfg or enc.EncoderConfig.small()
        self.mesh = make_mesh(model_parallel=model_parallel)
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
        params = enc.init_params(jax.random.PRNGKey(seed), self.cfg)
        pspecs = enc.param_pspecs(self.cfg)
        self.params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            params, pspecs, is_leaf=lambda x: isinstance(x, P),
        )
        self.opt_state = self.optimizer.init(self.params)
        self._step = jax.jit(enc.make_train_step(self.cfg, self.optimizer))
        self._batch_sharding = NamedSharding(self.mesh, P(DATA_AXIS, None))
        self.history: List[float] = []

    def _shard_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        return {k: jax.device_put(jnp.asarray(v), self._batch_sharding)
                for k, v in batch.items()}

    def train(
        self,
        pairs: Sequence[Tuple[str, str]],
        tokenizer=None,
        epochs: int = 1,
        batch_size: int = 32,
        max_length: int = 64,
        log_every: int = 20,
    ) -> List[float]:
        tokenizer = tokenizer or HashTokenizer(self.cfg.vocab_size, self.cfg.max_position)
        step = 0
        t0 = time.perf_counter()
        for epoch in range(epochs):
            for batch in make_pair_batches(pairs, tokenizer, batch_size,
                                           max_length, seed=epoch):
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, self._shard_batch(batch))
                step += 1
                self.history.append(float(loss))
                if step % log_every == 0:
                    logger.info("step %d loss %.4f (%.1f steps/s)", step,
                                float(loss), step / (time.perf_counter() - t0))
        return self.history

    # --------------------------------------------------------- checkpoints
    def save_checkpoint(self, path: str | Path) -> bool:
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(Path(path).resolve(), jax.device_get(self.params))
            ckptr.wait_until_finished()
            return True
        except Exception as e:
            logger.warning("checkpoint save failed: %s", e)
            return False

    def restore_checkpoint(self, path: str | Path) -> bool:
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            restored = ckptr.restore(Path(path).resolve(), jax.device_get(self.params))
            pspecs = enc.param_pspecs(self.cfg)
            self.params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                restored, pspecs, is_leaf=lambda x: isinstance(x, P),
            )
            return True
        except Exception as e:
            logger.warning("checkpoint restore failed: %s", e)
            return False


def pairs_from_notes(notes: Sequence[Dict[str, Any]]) -> List[Tuple[str, str]]:
    """(pseudo-query, note text) training pairs from atomic notes: the title
    + entities form the query side (a cheap in-domain objective)."""
    out = []
    for n in notes:
        ents = " ".join(str(e) for e in (n.get("entities") or [])[:3])
        q = f"{n.get('title', '')} {ents}".strip()
        p = str(n.get("content") or n.get("text") or "")
        if q and p:
            out.append((q, p))
    return out
