"""LearnedFusion: a tiny logistic ranker over handcrafted features.

Parity target: /root/reference/retrieval/learned_fusion.py — 7 features per
(query, paragraph): bm25, dense, title similarity, max sentence similarity,
packed position, log length, graph score (:41-93); logistic/linear model
with train/save/load and calibration.json ingestion (:148-357). Training is
batched gradient descent in JAX (no sklearn dependency on the hot path).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from anorag_tpu.utils.text import split_sentences, tokenize_no_stop

FEATURES = [
    "bm25_score", "dense_score", "title_sim", "max_sent_sim",
    "packed_pos", "log_len", "graph_score",
]


def extract_features(query: str, cand: Dict[str, Any], position: int = 0) -> np.ndarray:
    q = set(tokenize_no_stop(query))

    def overlap(text: str) -> float:
        t = set(tokenize_no_stop(text or ""))
        return len(q & t) / max(len(q), 1)

    content = cand.get("content") or ""
    sents = split_sentences(content)
    return np.array(
        [
            float(cand.get("sparse_score", cand.get("bm25_score", 0.0))),
            float(cand.get("dense_score", cand.get("similarity", 0.0))),
            overlap(cand.get("title") or ""),
            max((overlap(s) for s in sents), default=0.0),
            1.0 / (1.0 + position),
            float(np.log1p(len(content))),
            float(cand.get("graph_score", 0.0)),
        ],
        np.float32,
    )


class LearnedFusion:
    def __init__(self, model_type: str = "logistic"):
        self.model_type = model_type
        self.w = np.zeros(len(FEATURES), np.float32)
        self.b = 0.0
        self.trained = False

    # ------------------------------------------------------------ scoring
    def score(self, feats: np.ndarray) -> np.ndarray:
        z = feats @ self.w + self.b
        if self.model_type == "logistic":
            return 1.0 / (1.0 + np.exp(-z))
        return z

    def rank_paragraphs(self, query: str, candidates: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        if not candidates:
            return []
        feats = np.stack([extract_features(query, c, i) for i, c in enumerate(candidates)])
        if self.trained:
            scores = self.score(feats)
        else:
            # untrained fallback: dense + bm25 average
            scores = feats[:, 0] * 0.5 + feats[:, 1]
        order = np.argsort(-scores, kind="stable")
        out = []
        for i in order:
            c = dict(candidates[int(i)])
            c["learned_score"] = float(scores[i])
            out.append(c)
        return out

    # ----------------------------------------------------------- training
    def train(self, feats: np.ndarray, labels: np.ndarray, epochs: int = 200,
              lr: float = 0.1, l2: float = 1e-4) -> float:
        x = jnp.asarray(feats, jnp.float32)
        y = jnp.asarray(labels, jnp.float32)
        params = (jnp.zeros(x.shape[1]), jnp.asarray(0.0))

        def loss_fn(p):
            w, b = p
            z = x @ w + b
            if self.model_type == "logistic":
                nll = jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))
            else:
                nll = jnp.mean((z - y) ** 2)
            return nll + l2 * jnp.sum(w * w)

        @jax.jit
        def step(p):
            l, g = jax.value_and_grad(loss_fn)(p)
            return tuple(pi - lr * gi for pi, gi in zip(p, g)), l

        loss = None
        for _ in range(epochs):
            params, loss = step(params)
        self.w = np.asarray(params[0])
        self.b = float(params[1])
        self.trained = True
        return float(loss)

    # -------------------------------------------------------- persistence
    def save(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as fh:
            json.dump({"model_type": self.model_type, "w": self.w.tolist(),
                       "b": self.b, "features": FEATURES}, fh)

    @classmethod
    def load(cls, path: str | Path) -> "LearnedFusion":
        with open(path) as fh:
            d = json.load(fh)
        inst = cls(model_type=d.get("model_type", "logistic"))
        inst.w = np.asarray(d["w"], np.float32)
        inst.b = float(d["b"])
        inst.trained = True
        return inst

    def load_calibration(self, calibration: Dict[str, Any]) -> None:
        """Ingest calibration.json weights (training/calibrate.py output)."""
        lf = calibration.get("learned_fusion") or {}
        if "w" in lf:
            self.w = np.asarray(lf["w"], np.float32)
            self.b = float(lf.get("b", 0.0))
            self.trained = True
