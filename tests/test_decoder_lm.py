"""Decoder LM invariants: tokenizer, causality, KV-cache exactness,
training, checkpoint round-trip, and the jax LLM provider.

The generation path must be EXACT against the naive full-forward rollout
(same argmax at every step) — the KV cache and left-padding are pure
reformulations, not approximations.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from anorag_tpu.models import decoder_lm as dlm


@pytest.fixture(scope="module")
def tiny():
    cfg = dlm.DecoderConfig.tiny()
    params = dlm.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_byte_tokenizer_roundtrip():
    tok = dlm.ByteTokenizer()
    for s in ["hello", 'j1 {"a": [1, 2]} ~', "héllo wörld", "日本語", ""]:
        assert tok.decode(tok.encode(s)) == s
    ids = tok.encode("x", add_bos=True, add_eos=True)
    assert ids[0] == dlm.BOS_ID and ids[-1] == dlm.EOS_ID
    assert tok.decode(ids) == "x"


def test_forward_causal(tiny):
    """Changing a future token must not change past logits."""
    params, cfg = tiny
    ids = np.array([[1, 10, 20, 30, 40, 50]], np.int32)
    base = dlm.forward(params, jnp.asarray(ids), cfg)
    ids2 = ids.copy()
    ids2[0, 4] = 200
    pert = dlm.forward(params, jnp.asarray(ids2), cfg)
    np.testing.assert_allclose(base[0, :4], pert[0, :4], rtol=1e-5, atol=1e-5)
    assert not np.allclose(base[0, 4:], pert[0, 4:])


def _naive_greedy(params, cfg, prompt, max_new):
    tok = dlm.ByteTokenizer()
    ids = tok.encode(prompt, add_bos=True)
    out = []
    for _ in range(max_new):
        logits = dlm.forward(params, jnp.asarray([ids]), cfg)[0, -1]
        nxt = int(jnp.argmax(dlm._mask_unused(logits[None])[0]))
        if nxt == dlm.EOS_ID:
            break
        out.append(nxt)
        ids = ids + [nxt]
    return tok.decode(out)


def test_kv_cache_matches_naive_rollout(tiny):
    params, cfg = tiny
    lm = dlm.DecoderLM(params, cfg, prompt_bucket=32)
    prompts = ["abc", "the quick brown fox", "z"]
    got = lm.generate(prompts, max_new=10)
    for p, g in zip(prompts, got):
        assert g == _naive_greedy(params, cfg, p, 10)


def test_batch_rows_independent(tiny):
    """A row's output must not depend on its batch neighbors (left-pad +
    RoPE relative positions)."""
    params, cfg = tiny
    lm = dlm.DecoderLM(params, cfg, prompt_bucket=32)
    solo = lm.generate(["hello"], max_new=8)[0]
    batched = lm.generate(["hello", "a much longer other prompt xx"],
                          max_new=8)[0]
    assert solo == batched


def test_generate_empty_and_bucketing(tiny):
    params, cfg = tiny
    lm = dlm.DecoderLM(params, cfg, prompt_bucket=32)
    assert lm.generate([]) == []
    out = lm.generate(["a", "b", "c"], max_new=4)   # pads batch 3 -> 4
    assert len(out) == 3


def test_training_memorizes_and_roundtrips(tmp_path):
    cfg = dlm.DecoderConfig(hidden_size=96, num_layers=2, num_heads=4,
                            intermediate_size=192, max_len=128)
    params = dlm.init_params(jax.random.PRNGKey(1), cfg)
    tok = dlm.ByteTokenizer()
    pairs = [("note: A born 1970", '[{"text":"A was born in 1970."}]'),
             ("note: B founded C", '[{"text":"B founded C."}]')]
    S = 80
    ids = np.full((2, S), dlm.PAD_ID, np.int32)
    w = np.zeros((2, S), np.float32)
    for i, (p, c) in enumerate(pairs):
        pi = tok.encode(p, add_bos=True)
        ci = tok.encode(c, add_eos=True)
        seq = pi + ci
        ids[i, :len(seq)] = seq
        w[i, len(pi):len(seq)] = 1.0
    batch = {"ids": jnp.asarray(ids), "loss_mask": jnp.asarray(w)}
    opt = optax.adamw(4e-3)
    st = opt.init(params)
    step = jax.jit(dlm.make_train_step(cfg, opt))
    first = None
    for i in range(250):
        params, st, loss = step(params, st, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.05 < first

    lm = dlm.DecoderLM(params, cfg, prompt_bucket=32)
    for p, c in pairs:
        assert lm.generate([p], max_new=60)[0] == c

    # checkpoint round-trip preserves generations exactly
    dlm.save_lm(tmp_path / "ck", params, cfg)
    params2, cfg2 = dlm.load_lm(tmp_path / "ck")
    lm2 = dlm.DecoderLM(params2, cfg2, prompt_bucket=32)
    for p, c in pairs:
        assert lm2.generate([p], max_new=60)[0] == c

    # the jax LLM provider serves the checkpoint through the client API
    from anorag_tpu.llm.factory import LLMFactory
    client = LLMFactory.create_provider("jax", {"model": str(tmp_path / "ck")})
    assert client.is_available()
    got = client.generate(pairs[0][0].split(": ", 1)[1], system_prompt=None)
    assert isinstance(got, str)
    outs = client.batch_generate(["x", "y", "z"])
    assert len(outs) == 3


def test_jax_client_unavailable_without_checkpoint(tmp_path):
    from anorag_tpu.llm.jax_client import JaxLLMClient
    c = JaxLLMClient(model=str(tmp_path / "missing"))
    assert not c.is_available()


def test_render_prompt_stable():
    from anorag_tpu.llm.jax_client import render_prompt
    r = render_prompt("body", "SYSTEM LINE\nrest is dropped")
    assert "SYSTEM LINE" in r and "rest is dropped" not in r
    assert r.endswith("### reply:\n")


def test_lm_loss_masking(tiny):
    """Loss only counts masked positions: zero mask => zero-ish loss path."""
    params, cfg = tiny
    ids = jnp.asarray(np.array([[1, 5, 6, 7, 8, 2]], np.int32))
    full = dlm.lm_loss(params, {"ids": ids,
                                "loss_mask": jnp.ones((1, 6), jnp.float32)}, cfg)
    none = dlm.lm_loss(params, {"ids": ids,
                                "loss_mask": jnp.zeros((1, 6), jnp.float32)}, cfg)
    assert float(full) > 0.0
    assert float(none) == 0.0


def test_param_pspecs_tree_matches(tiny):
    params, cfg = tiny
    specs = dlm.param_pspecs(cfg)
    # same tree structure => shardable with jax.device_put/pjit
    jax.tree.map(lambda a, b: None, params, specs,
                 is_leaf=lambda x: isinstance(x, type(specs["tok_emb"])))
