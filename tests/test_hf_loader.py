"""Numerical parity: JAX encoder with converted HF weights vs transformers.

Builds a tiny randomly-initialized XLMRobertaModel locally (no download),
converts its state_dict, and checks hidden states + CLS embedding match.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from anorag_tpu.models.encoder import encode
from anorag_tpu.models.hf_loader import config_from_hf, convert_state_dict


def _tiny_hf_model(seed=0):
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(seed)
    cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1,
        hidden_act="gelu", layer_norm_eps=1e-5,
    )
    return XLMRobertaModel(cfg).eval()


@pytest.fixture(scope="module")
def converted():
    model = _tiny_hf_model()
    cfg = config_from_hf(model.config, dtype="float32")
    params = convert_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_hidden_state_parity(converted):
    model, cfg, params = converted
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 120, (2, 9)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        hf_out = model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    # our encoder pools; compare through CLS pooling without normalization
    import dataclasses

    cfg_nonorm = dataclasses.replace(cfg, normalize=False, pooling="cls")
    ours = np.asarray(encode(params, jnp.asarray(ids, jnp.int32),
                             jnp.asarray(mask, jnp.int32), cfg_nonorm))
    np.testing.assert_allclose(ours, hf_out[:, 0, :], rtol=2e-4, atol=2e-4)


def test_cls_embedding_parity_with_padding(converted):
    model, cfg, params = converted
    rng = np.random.default_rng(1)
    ids = np.full((2, 12), 1, np.int64)   # pad id 1
    mask = np.zeros((2, 12), np.int64)
    for b, l in enumerate((6, 10)):
        ids[b, :l] = rng.integers(3, 120, l)
        mask[b, :l] = 1
    with torch.no_grad():
        hf_cls = model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask)).last_hidden_state[:, 0, :].numpy()
    import dataclasses

    cfg_nonorm = dataclasses.replace(cfg, normalize=False)
    ours = np.asarray(encode(params, jnp.asarray(ids, jnp.int32),
                             jnp.asarray(mask, jnp.int32), cfg_nonorm))
    np.testing.assert_allclose(ours, hf_cls, rtol=2e-4, atol=2e-4)


def test_mean_pooling_parity(converted):
    model, cfg, params = converted
    rng = np.random.default_rng(2)
    ids = rng.integers(3, 120, (1, 7)).astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        hs = model(input_ids=torch.tensor(ids),
                   attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    want = hs.mean(axis=1)
    import dataclasses

    cfg_mean = dataclasses.replace(cfg, normalize=False, pooling="mean")
    ours = np.asarray(encode(params, jnp.asarray(ids, jnp.int32),
                             jnp.asarray(mask, jnp.int32), cfg_mean))
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)


def test_shipped_synth_checkpoint_loads_and_discriminates():
    """The in-image trained checkpoint (scripts/train_retrieval_encoder.py)
    loads through the production config path (embedding.checkpoint_path)
    and separates related from unrelated text — random-init does not.
    This is the same ingestion path a converted bge-m3 checkpoint takes."""
    from pathlib import Path

    import numpy as np

    from anorag_tpu.config import ConfigLoader
    from anorag_tpu.models.embedding_manager import EmbeddingManager

    ckpt = Path(__file__).resolve().parents[1] / "checkpoints" / "encoder_synth_small"
    if not ckpt.exists():
        import pytest
        pytest.skip("shipped checkpoint not present")
    cfg = ConfigLoader(auto_load=False)
    for k, v in {"embedding.backend": "jax", "embedding.dim": 256,
                 "embedding.model_name": "", "encoder.vocab_size": 8192,
                 "encoder.hidden_size": 256, "encoder.num_layers": 4,
                 "encoder.num_heads": 8, "encoder.intermediate_size": 1024,
                 "encoder.max_position": 128, "encoder.pooling": "mean",
                 "embedding.checkpoint_path": str(ckpt)}.items():
        cfg.set(k, v)
    em = EmbeddingManager(cfg=cfg, singleton=False)
    e = em.encode_texts([
        "Who performed Bami Summit?",
        "Bami Summit is an album performed by Holnelu Keslune.",
        "The weather report mentioned light rain over the harbor.",
    ])
    rel = float(e[0] @ e[1])
    unrel = float(e[0] @ e[2])
    assert rel > unrel + 0.2, (rel, unrel)
