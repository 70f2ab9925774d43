"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
XLA's host-platform device-count override (SURVEY.md §4).

Opt-in real-chip job: `ANORAG_TPU_TESTS=1 python -m pytest tests/ -m tpu`
skips the CPU force and runs the @pytest.mark.tpu suite (compiled Mosaic
kernel parity) on the attached TPU; those tests self-skip off-TPU.
"""
import os

_ON_TPU_JOB = os.environ.get("ANORAG_TPU_TESTS") == "1"

if not _ON_TPU_JOB:
    # Force CPU: the ambient environment may point JAX at a tunneled TPU
    # (JAX_PLATFORMS=axon), which is slow and bf16-precision for unit tests.
    # The env var alone is overridden by the site plugin, so use jax.config.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not _ON_TPU_JOB:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def fresh_config(tmp_path):
    """An isolated ConfigLoader instance (never the singleton)."""
    from anorag_tpu.config import ConfigLoader

    return ConfigLoader(config_path=str(tmp_path / "config.yaml"), auto_load=False)


def make_notes(n=24, seed=0):
    """Synthetic atomic notes with the full schema contract."""
    rng = np.random.default_rng(seed)
    topics = [
        ("Aurora Lane", "singer", "Blue Horizon"),
        ("Marcus Webb", "director", "Silent River"),
        ("Elena Cortez", "scientist", "Quantum Leap Institute"),
        ("David Kim", "founder", "Nexus Labs"),
    ]
    notes = []
    for i in range(n):
        person, role, work = topics[i % len(topics)]
        notes.append(
            {
                "note_id": f"note_{i}",
                "doc_id": f"doc_{i % 6}",
                "title": f"{work} ({'album' if i % 2 else 'film'})",
                "content": f"{person} is the {role} of {work}. Fact number {i}.",
                "raw_span": f"{person} is the {role} of {work}.",
                "entities": [person, work],
                "paragraph_idxs": [i % 6],
                "final_score": float(rng.uniform(0.1, 1.0)),
                "hop_no": 1,
                "retrieval_method": "hybrid",
                "bridge_entity": None,
                "bridge_path": [],
            }
        )
    return notes


@pytest.fixture
def notes():
    return make_notes()
