"""Continuous-batching serving engine (serving/engine.py): slot admission,
per-row offsets, greedy parity with isolated generation, slot reuse, eos
stopping, and quantized-serving configurations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
from dmx_compressor_tpu.serving import ContinuousBatchingEngine

CFG = OPTConfig(
    vocab_size=97,
    hidden_size=64,
    ffn_dim=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=64,
)

RNG = np.random.default_rng(0)


def make_model():
    return OPTForCausalLM(CFG, rngs=nnx.Rngs(0))


def ref_generate(model, prompt: np.ndarray, n_new: int, max_len: int = 48):
    """Isolated greedy generation with a plain scalar-offset cache — the
    correctness oracle the engine must reproduce per request."""
    caches = model.init_cache(1, max_len)
    logits = model(jnp.asarray(prompt[None], jnp.int32), caches=caches,
                   position_offset=0)
    tok = int(jnp.argmax(logits[0, -1]))
    out = [tok]
    for i in range(n_new - 1):
        logits = model(jnp.asarray([[tok]], jnp.int32), caches=caches,
                       position_offset=int(prompt.size) + i)
        tok = int(jnp.argmax(logits[0, -1]))
        out.append(tok)
    return out


def prompts(*lens):
    return [RNG.integers(1, CFG.vocab_size, (n,)).astype(np.int32) for n in lens]


def test_single_request_matches_isolated_generation():
    model = make_model()
    (p,) = prompts(7)
    eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                   prompt_buckets=(8, 16))
    rid = eng.submit(p, max_new_tokens=6)
    results = eng.run()
    assert len(results) == 1 and results[0].request_id == rid
    assert results[0].finish_reason == "length"
    assert results[0].tokens == ref_generate(model, p, 6)


def test_mixed_lengths_and_slot_reuse():
    """Four requests with different prompt lengths through two slots:
    queueing, concurrent decode at different offsets, and slot reuse all
    must leave per-request outputs equal to isolated generation."""
    model = make_model()
    ps = prompts(3, 11, 8, 5)
    eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                   prompt_buckets=(4, 8, 16))
    rids = [eng.submit(p, max_new_tokens=5 + i) for i, p in enumerate(ps)]
    results = {r.request_id: r for r in eng.run()}
    assert set(results) == set(rids)
    for i, (rid, p) in enumerate(zip(rids, ps)):
        expect = ref_generate(model, p, 5 + i)
        assert results[rid].tokens == expect, f"request {i}"


def test_eos_stops_early_and_frees_slot():
    model = make_model()
    (p, q) = prompts(6, 6)
    ref = ref_generate(model, p, 12)
    eos = ref[2]  # a token greedy decode certainly emits
    stop = ref.index(eos) + 1  # engine stops at the FIRST occurrence
    eng = ContinuousBatchingEngine(model, max_slots=1, max_len=48,
                                   prompt_buckets=(8,))
    r1 = eng.submit(p, max_new_tokens=12, eos_token_id=eos)
    r2 = eng.submit(q, max_new_tokens=3)
    results = {r.request_id: r for r in eng.run()}
    assert results[r1].finish_reason == "eos"
    assert results[r1].tokens == ref[:stop]
    # the freed slot served the queued request
    assert results[r2].tokens == ref_generate(model, q, 3)


def test_engine_under_quantized_serving_config():
    """The engine drives the live Dmx modules: BASIC weights-only serving
    (packed BFP + fused kernels) produces the same tokens as isolated
    generation under the identical configuration."""
    from dmx_compressor_tpu.functional.approximate import NoApproximation
    from dmx_compressor_tpu.modeling.model import DmxModel
    from dmx_compressor_tpu.ops.compress import (
        compress_for_inference,
        set_inference_mode,
    )

    model = make_model()
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    for _, m in dm.named_dmx_modules():
        m.input_casts.set_format(["SAME"] * len(m.input_casts))
        m.output_casts.set_format(["SAME"] * len(m.output_casts))
        m.approximator.function = NoApproximation()
    compress_for_inference(dm)
    set_inference_mode(True)
    try:
        ps = prompts(5, 9)
        refs = [ref_generate(model, p, 4) for p in ps]
        eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                       prompt_buckets=(8, 16))
        rids = [eng.submit(p, max_new_tokens=4) for p in ps]
        results = {r.request_id: r for r in eng.run()}
        for rid, expect in zip(rids, refs):
            assert results[rid].tokens == expect
    finally:
        set_inference_mode(False)


def test_engine_under_full_basic_fake_quant():
    """Full BASIC mode (BFP activation casts + surrogates) through the
    engine — exercises the per-row mask handling of the fused decode
    attention (ops/basic_attention.py)."""
    from dmx_compressor_tpu.modeling.model import DmxModel
    from dmx_compressor_tpu.ops.compress import (
        compress_for_inference,
        set_inference_mode,
    )

    model = make_model()
    dm = DmxModel.from_raw(model)
    dm.to_basic_mode()
    compress_for_inference(dm)
    set_inference_mode(True)
    try:
        ps = prompts(5, 9)
        refs = [ref_generate(model, p, 4) for p in ps]
        eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                       prompt_buckets=(8, 16))
        rids = [eng.submit(p, max_new_tokens=4) for p in ps]
        results = {r.request_id: r for r in eng.run()}
        for rid, expect in zip(rids, refs):
            assert results[rid].tokens == expect
    finally:
        set_inference_mode(False)


def test_row_cache_update_per_row_offsets():
    from dmx_compressor_tpu.ops.kv_cache import RowKVCache

    c = RowKVCache(2, 1, 8, 4)
    c.lengths.value = jnp.asarray([0, 3], jnp.int32)
    k = jnp.ones((2, 1, 1, 4))
    kf, vf, lens = c.update(k, 2 * k)
    assert list(np.asarray(lens)) == [1, 4]
    assert float(kf[0, 0, 0, 0]) == 1.0 and float(kf[0, 0, 3, 0]) == 0.0
    assert float(kf[1, 0, 3, 0]) == 1.0 and float(kf[1, 0, 0, 0]) == 0.0


def test_submit_validations():
    model = make_model()
    eng = ContinuousBatchingEngine(model, max_slots=1, max_len=32,
                                   prompt_buckets=(8,))
    with pytest.raises(AssertionError):
        eng.submit(np.arange(9), max_new_tokens=2)  # exceeds largest bucket
    with pytest.raises(AssertionError):
        eng.submit(np.arange(4), max_new_tokens=40)  # exceeds max_len


# ----------------------------------------------------------- RoPE families


def _family_engine_check(model, n_new=4):
    ps = prompts(5, 9, 3)
    refs = [ref_generate(model, p, n_new) for p in ps]
    eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                   prompt_buckets=(4, 8, 16))
    rids = [eng.submit(p, max_new_tokens=n_new) for p in ps]
    results = {r.request_id: r for r in eng.run()}
    for i, (rid, expect) in enumerate(zip(rids, refs)):
        assert results[rid].tokens == expect, f"request {i}"


def test_engine_llama_gqa():
    """Per-row RoPE offsets: Llama with grouped-query attention."""
    from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    _family_engine_check(LlamaForCausalLM(cfg, rngs=nnx.Rngs(0)))


def test_engine_mistral_sliding_window():
    """Per-row banded masks: Mistral with a sliding window shorter than the
    cache, so slots at different offsets see different windows."""
    from dmx_compressor_tpu.models.mistral import (
        MistralConfig,
        MistralForCausalLM,
    )

    cfg = MistralConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=6,
    )
    _family_engine_check(MistralForCausalLM(cfg, rngs=nnx.Rngs(0)))


def test_engine_gpt2():
    """Per-row learned positions: GPT-2."""
    from dmx_compressor_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(vocab_size=97, n_embd=64, n_layer=2, n_head=4,
                     n_positions=64)
    _family_engine_check(GPT2LMHeadModel(cfg, rngs=nnx.Rngs(0)))


def test_engine_int8_kv_cache():
    """Quantized row cache: engine with int8 KV payloads matches isolated
    generation over an int8 QuantizedKVCache (the headline serving
    configuration's cache) for OPT and Llama-GQA."""
    from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    def ref_generate_q(model, prompt, n_new, max_len=48):
        caches = model.init_cache(1, max_len, quantized=True)
        logits = model(jnp.asarray(prompt[None], jnp.int32), caches=caches,
                       position_offset=0)
        tok = int(jnp.argmax(logits[0, -1]))
        out = [tok]
        for i in range(n_new - 1):
            logits = model(jnp.asarray([[tok]], jnp.int32), caches=caches,
                           position_offset=int(prompt.size) + i)
            tok = int(jnp.argmax(logits[0, -1]))
            out.append(tok)
        return out

    lcfg = LlamaConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    for model in (make_model(), LlamaForCausalLM(lcfg, rngs=nnx.Rngs(0))):
        ps = prompts(5, 9)
        refs = [ref_generate_q(model, p, 4) for p in ps]
        eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                       prompt_buckets=(8, 16),
                                       quantized_kv=True)
        rids = [eng.submit(p, max_new_tokens=4) for p in ps]
        results = {r.request_id: r for r in eng.run()}
        for rid, expect in zip(rids, refs):
            assert results[rid].tokens == expect


def test_burst_decode_equals_single_step():
    """Burst decoding (N tokens per dispatch via lax.scan, donated
    device-side state) must be trajectory-identical to stepwise decode,
    including mid-burst eos truncation and mid-run admission."""
    model = make_model()
    ps = prompts(5, 9, 4)
    ref_eos = ref_generate(model, ps[0], 9)[1]

    def run(burst):
        eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                       prompt_buckets=(8, 16))
        rids = [
            eng.submit(ps[0], max_new_tokens=9, eos_token_id=ref_eos),
            eng.submit(ps[1], max_new_tokens=7),
            eng.submit(ps[2], max_new_tokens=5),
        ]
        results = {r.request_id: r for r in eng.run(burst)}
        return [
            (results[r].tokens, results[r].finish_reason) for r in rids
        ]

    assert run(3) == run(1)


def test_engine_with_tp_sharded_params():
    """Host-sharded continuous batching (SURVEY §5): engine decode over
    TP-sharded parameters on the 8-device mesh reproduces the unsharded
    token trajectories — XLA GSPMD propagates the shardings through the
    jitted burst decode."""
    from dmx_compressor_tpu.parallel.mesh import (
        make_mesh,
        rules_for_model,
        shard_state,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    model = make_model()
    ps = prompts(5, 9, 3)
    refs = [ref_generate(model, p, 4) for p in ps]

    mesh = make_mesh((1, 4), ("dp", "tp"))
    graphdef, state = nnx.split(model)
    state = shard_state(state, mesh, rules_for_model(model))
    nnx.update(model, state)

    eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                   prompt_buckets=(8, 16))
    rids = [eng.submit(p, max_new_tokens=4) for p in ps]
    results = {r.request_id: r for r in eng.run(burst=2)}
    for i, (rid, expect) in enumerate(zip(rids, refs)):
        assert results[rid].tokens == expect, f"request {i}"


def test_per_request_sampling():
    """Mixed greedy + sampled slots in one batch: the greedy request's
    trajectory is unaffected by a sampled neighbor, sampled tokens are
    valid, and sampling is deterministic per engine seed."""
    model = make_model()
    (pg, ps_) = prompts(6, 8)
    ref = ref_generate(model, pg, 5)

    def run(seed):
        eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                       prompt_buckets=(8,), top_k=5,
                                       seed=seed)
        rg = eng.submit(pg, max_new_tokens=5)  # greedy
        rs = eng.submit(ps_, max_new_tokens=5, temperature=1.0)
        results = {r.request_id: r for r in eng.run()}
        return results[rg].tokens, results[rs].tokens

    g1, s1 = run(0)
    g2, s2 = run(0)
    seeded = [run(seed)[1] for seed in (3, 5, 7, 11)]
    assert g1 == ref  # greedy row independent of sampling
    assert (s1, g1) == (s2, g2)  # deterministic per seed
    assert all(0 <= t < CFG.vocab_size for t in s1)
    # the seed must actually steer sampling: across several seeds at
    # temperature 1.0, at least one trajectory differs
    assert any(s != s1 for s in seeded)


def test_engine_gemma():
    """Per-row offsets with Gemma's sqrt-hidden embed scaling."""
    from dmx_compressor_tpu.models.gemma import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, head_dim=16,
    )
    _family_engine_check(GemmaForCausalLM(cfg, rngs=nnx.Rngs(0)))


def test_engine_qwen3():
    """Per-row offsets with Qwen3's q/k norms."""
    from dmx_compressor_tpu.models.qwen3 import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=97, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, head_dim=16,
    )
    _family_engine_check(Qwen3ForCausalLM(cfg, rngs=nnx.Rngs(0)))


# ------------------------------------------------------------ seq2seq


def test_seq2seq_engine_whisper():
    """Encoder-decoder continuous batching: per-slot encoder rows +
    per-row decoder caches reproduce isolated greedy transcription."""
    from dmx_compressor_tpu.models.whisper import (
        WhisperConfig,
        WhisperForConditionalGeneration,
    )
    from dmx_compressor_tpu.serving import Seq2SeqBatchingEngine

    cfg = WhisperConfig.tiny()
    model = WhisperForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(1)
    feats = [
        rng.standard_normal(
            (cfg.num_mel_bins, cfg.max_source_positions * 2)
        ).astype(np.float32)
        for _ in range(3)
    ]

    def ref(f, n_new):
        out = model.generate(
            jnp.asarray(f[None]), np.zeros((1, 1), np.int32),
            max_new_tokens=n_new,
        )
        return [int(t) for t in np.asarray(out)[0, 1:]]

    refs = [ref(f, 5) for f in feats]
    eng = Seq2SeqBatchingEngine(model, max_slots=2, max_len=24,
                                prompt_buckets=(2, 4))
    rids = [eng.submit(f, max_new_tokens=5) for f in feats]
    results = {r.request_id: r for r in eng.run(burst=2)}
    for i, (rid, expect) in enumerate(zip(rids, refs)):
        assert results[rid].tokens == expect, f"request {i}"


def test_seq2seq_engine_t5():
    """T5 through the seq2seq engine: per-row relative-position bias
    (compute_bias with an offset array) matches isolated generation."""
    from dmx_compressor_tpu.models.t5 import T5Config, T5ForConditionalGeneration
    from dmx_compressor_tpu.serving import Seq2SeqBatchingEngine

    cfg = T5Config(
        vocab_size=97, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_decoder_layers=2, num_heads=4,
    )
    model = T5ForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(1)
    inputs = [rng.integers(1, 97, (n,)).astype(np.int32) for n in (6, 9, 4)]

    def ref(ids, n_new):
        out = model.generate(
            jnp.asarray(ids[None]), np.zeros((1, 1), np.int32),
            max_new_tokens=n_new,
        )
        return [int(t) for t in np.asarray(out)[0, 1:]]

    refs = [ref(x, 5) for x in inputs]
    eng = Seq2SeqBatchingEngine(model, max_slots=2, max_len=24,
                                prompt_buckets=(2, 4), enc_capacity=12)
    rids = [eng.submit(x, max_new_tokens=5) for x in inputs]
    results = {r.request_id: r for r in eng.run(burst=2)}
    for i, (rid, expect) in enumerate(zip(rids, refs)):
        assert results[rid].tokens == expect, f"request {i}"


def test_chunked_prefill_matches_isolated():
    """prefill_chunk splits long prompts into per-step chunk dispatches
    (flash_chunked_prefill routing); final tokens must equal isolated
    generation exactly.  Short prompts still take the single-dispatch
    path."""
    model = make_model()
    long_p, short_p = prompts(21, 5)
    eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                   prompt_buckets=(8, 24), prefill_chunk=8)
    r_long = eng.submit(long_p, max_new_tokens=6)
    r_short = eng.submit(short_p, max_new_tokens=6)
    results = {r.request_id: r for r in eng.run()}
    assert results[r_long].tokens == ref_generate(model, long_p, 6)
    assert results[r_short].tokens == ref_generate(model, short_p, 6)


def test_chunked_prefill_interleaves_decode():
    """A resident slot keeps emitting one token per step while a long
    prompt prefills chunk-by-chunk — admission latency is bounded by one
    chunk, not one prompt."""
    model = make_model()
    resident, newcomer = prompts(5, 22)
    eng = ContinuousBatchingEngine(model, max_slots=2, max_len=64,
                                   prompt_buckets=(8, 24), prefill_chunk=8)
    r0 = eng.submit(resident, max_new_tokens=12)
    eng.step()  # admit + first token (readback rides the next step:
    eng.step()  # step() drains in-flight results before admitting)
    assert len(eng.slots[0].generated) >= 1
    r1 = eng.submit(newcomer, max_new_tokens=4)
    # 22-token prompt over chunk=8 -> 3 chunk steps before slot 1 decodes
    emitted = []
    for _ in range(3):
        eng.step()
        emitted.append(len(eng.slots[0].generated))
        assert 1 in eng._prefilling or eng.slots[1].active
    # the resident slot advanced on every chunked-prefill step
    assert emitted == [emitted[0] + i for i in range(3)]
    results = {r.request_id: r for r in eng.run()}
    assert results[r0].tokens == ref_generate(model, resident, 12)
    assert results[r1].tokens == ref_generate(model, newcomer, 4)


def test_chunked_prefill_quantized_kv():
    """Chunked prefill through the int8 row cache: per-chunk quantized
    appends land in the private cache, the scatter installs int8 payloads
    + scales."""
    model = make_model()
    (p,) = prompts(19)
    ref_eng = ContinuousBatchingEngine(model, max_slots=1, max_len=48,
                                       prompt_buckets=(24,),
                                       quantized_kv=True)
    ref_eng.submit(p, max_new_tokens=6)
    expect = ref_eng.run()[0].tokens
    eng = ContinuousBatchingEngine(model, max_slots=1, max_len=48,
                                   prompt_buckets=(24,), quantized_kv=True,
                                   prefill_chunk=8)
    eng.submit(p, max_new_tokens=6)
    got = eng.run()[0].tokens
    assert got == expect


def test_seq2seq_rejects_prefill_chunk():
    from dmx_compressor_tpu.models.whisper import (
        WhisperConfig,
        WhisperForConditionalGeneration,
    )
    from dmx_compressor_tpu.serving import Seq2SeqBatchingEngine

    cfg = WhisperConfig.tiny()
    model = WhisperForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    with pytest.raises(AssertionError):
        Seq2SeqBatchingEngine(model, prefill_chunk=4)


def test_warmup_compiles_then_results_unchanged():
    """warmup() dry-runs one synthetic request per bucket (chunked prefill
    offsets included), leaves no residue, and subsequent requests produce
    the same tokens as a cold engine."""
    model = make_model()
    ps = prompts(7, 11)
    eng = ContinuousBatchingEngine(model, max_slots=2, max_len=48,
                                   prompt_buckets=(8, 16), prefill_chunk=4)
    eng.warmup(burst=2)
    assert not eng.finished and not eng.queue
    assert all(not s.active for s in eng.slots)
    # chunked-prefill shapes are compiled: a bucket-16 prompt walks chunk
    # offsets 4/8/12 during warmup
    assert eng._chunk_fns, "warmup should have populated the chunk fns"
    rids = [eng.submit(p, max_new_tokens=4) for p in ps]
    results = {r.request_id: r for r in eng.run()}
    for rid, p in zip(rids, ps):
        assert results[rid].tokens == ref_generate(model, p, 4)


def test_chunk_cadence_finishes_admission_in_one_step():
    """chunks_per_step > 1: a prefilling slot consumes several chunks per
    engine step (each chunk its own dispatch), so chunked admission costs
    ~the same number of engine steps as monolithic — with unchanged
    greedy parity."""
    model = make_model()
    resident, newcomer = prompts(5, 22)
    eng = ContinuousBatchingEngine(model, max_slots=2, max_len=64,
                                   prompt_buckets=(8, 24), prefill_chunk=8,
                                   chunks_per_step=3)
    r0 = eng.submit(resident, max_new_tokens=12)
    eng.step()
    r1 = eng.submit(newcomer, max_new_tokens=4)
    eng.step()  # 22-token prompt = 3 chunks -> all consumed this step
    assert 1 not in eng._prefilling and eng.slots[1].active
    assert eng.last_step_chunks == 3
    results = {r.request_id: r for r in eng.run()}
    assert results[r0].tokens == ref_generate(model, resident, 12)
    assert results[r1].tokens == ref_generate(model, newcomer, 4)


def test_queue_fed_turnover_readmits_in_drain_step():
    """A queued request is admitted in the same step() that reads back the
    retiring slot's final tokens (drain happens before admission), and
    every request still matches isolated generation."""
    model = make_model()
    ps = prompts(5, 6, 7)
    eng = ContinuousBatchingEngine(model, max_slots=1, max_len=48,
                                   prompt_buckets=(8,))
    rids = [eng.submit(p, max_new_tokens=3) for p in ps]
    turnover_same_step = 0
    guard = 0
    while (eng.queue or eng._pending or any(s.active for s in eng.slots)):
        n_done = len(eng.finished)
        eng.step()
        if len(eng.finished) > n_done and eng.last_step_admissions:
            turnover_same_step += 1
        guard += 1
        assert guard < 200
    results = {r.request_id: r for r in eng.finished}
    assert len(results) == 3
    for rid, p in zip(rids, ps):
        assert results[rid].tokens == ref_generate(model, p, 3)
    # with a single slot and a waiting queue, at least one turnover must
    # have retired + readmitted inside one step
    assert turnover_same_step >= 1
