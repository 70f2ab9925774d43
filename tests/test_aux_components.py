"""Auxiliary components: NER, progress, batch processor, embedding strategy,
trainer, enhanced note generator."""
import json

import numpy as np
import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.index.embedding_strategy import (
    EmbeddingConfig, IndexVersionRegistry, create_embedding_model,
)
from anorag_tpu.models.train import EncoderTrainer, pairs_from_notes
from anorag_tpu.models.encoder import EncoderConfig
from anorag_tpu.utils.batch_processor import BatchProcessor, device_memory_stats
from anorag_tpu.utils.ner import EnhancedNER
from anorag_tpu.utils.progress import JSONLProgressTracker

from conftest import make_notes


def test_ner_typed_extraction():
    ner = EnhancedNER(use_spacy=False)
    typed = ner.extract_typed(
        'Dr. Elena Cortez joined Nexus Labs in Boston in March 5, 1999 '
        'after the Harvest Festival. Her song "Blue Horizon" was a hit.'
    )
    assert any("Elena Cortez" in e for e in typed.get("PERSON", []))
    assert any("Nexus Labs" in e for e in typed.get("ORG", []))
    assert "Blue Horizon" in typed.get("WORK_OF_ART", [])
    assert typed.get("DATE")


def test_ner_entity_diff():
    ner = EnhancedNER(use_spacy=False)
    missing = ner.entity_diff("Aurora Lane sang in Boston at Nexus Labs.",
                              "Aurora Lane sang.")
    assert any("nexus labs" == m for m in missing)


def test_progress_tracker(tmp_path):
    t = JSONLProgressTracker(tmp_path / "progress.jsonl", task="build")
    t.log_step("chunk", n=5)
    t.log_step("embed", n=5)
    assert t.is_done("chunk") and not t.is_done("graph")


def test_batch_processor_shrinks_on_failure():
    calls = []

    def fn(batch):
        calls.append(len(batch))
        if len(batch) > 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return [x * 2 for x in batch]

    bp = BatchProcessor(batch_size=8, min_batch_size=1)
    out = bp.process(list(range(8)), fn)
    assert out == [x * 2 for x in range(8)]
    assert bp.batch_size <= 4
    assert isinstance(device_memory_stats(), dict)


def test_embedding_strategy_registry(tmp_path):
    cfg = EmbeddingConfig(backend="hash", dim=64)
    model = create_embedding_model(cfg)
    emb = model.encode(["hello world"])
    assert emb.shape == (1, 64)
    reg = IndexVersionRegistry(tmp_path / "versions.json")
    assert not reg.is_compatible(cfg)
    reg.register(cfg, "/tmp/idx", 100)
    assert reg.is_compatible(cfg)
    other = EmbeddingConfig(backend="hash", dim=128)
    assert not reg.is_compatible(other)
    assert reg.find(cfg)["n_vectors"] == 100


def test_encoder_trainer_loss_decreases(tmp_path):
    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128, max_position=64)
    trainer = EncoderTrainer(cfg=cfg, learning_rate=1e-3, model_parallel=2)
    notes = make_notes(32)
    pairs = pairs_from_notes(notes)
    assert len(pairs) == 32
    hist = trainer.train(pairs, epochs=3, batch_size=8, max_length=32)
    assert hist[-1] < hist[0]


def test_encoder_trainer_checkpoint_roundtrip(tmp_path):
    cfg = EncoderConfig(vocab_size=256, hidden_size=32, num_layers=1,
                        num_heads=2, intermediate_size=64, max_position=32)
    trainer = EncoderTrainer(cfg=cfg)
    if not trainer.save_checkpoint(tmp_path / "ckpt"):
        pytest.skip("orbax unavailable")
    before = np.asarray(trainer.params["tok_emb"]).copy()
    trainer2 = EncoderTrainer(cfg=cfg, seed=99)
    assert trainer2.restore_checkpoint(tmp_path / "ckpt")
    np.testing.assert_allclose(np.asarray(trainer2.params["tok_emb"]).astype(np.float32),
                               before.astype(np.float32))


def test_enhanced_note_generator_typed_slots():
    from anorag_tpu.llm.enhanced_note_generator import EnhancedAtomicNoteGenerator
    from anorag_tpu.llm.local_llm import LocalLLM

    reply = json.dumps([{
        "text": "Blue Horizon is performed by Aurora Lane.",
        "entities": ["Blue Horizon", "Aurora Lane"],
        "head_key": "Blue Horizon", "rel": "performed_by", "tail_key": "Aurora Lane",
        "source_sent_ids": [0], "salience": 0.9,
    }])
    loader = ConfigLoader(auto_load=False)
    loader.set("llm.provider", "ollama")

    def transport(url, payload, timeout):
        return {"response": reply}

    llm = LocalLLM(cfg=loader, transport=transport)
    gen = EnhancedAtomicNoteGenerator(llm, loader, audit=False)
    chunk = {"doc_id": "d", "chunk_index": 0, "title": "Blue Horizon (album)",
             "paragraph_idx": 0,
             "text": "Blue Horizon is performed by Aurora Lane.",
             "sentences": ["Blue Horizon is performed by Aurora Lane."]}
    notes = gen.generate_for_chunk(chunk)
    assert notes
    n = notes[0]
    assert n["type_head"] == "song" and n["type_tail"] == "person"
    assert n.get("title_type") == "album"
    assert "Aurora Lane" in n["entity_types"]
