"""Continuous-batching serving engine (slot-based, static shapes).

Production serving surface with NO reference analogue (the reference is a
fake-quant simulator; its only runtime is a HF pipeline wrapper,
hf.py:314-361).  TPU-native design:

- **Static shapes everywhere.**  The engine owns a fixed-slot batch
  (``max_slots`` rows) and a fixed-capacity per-row KV cache
  (:class:`~..ops.kv_cache.RowKVCache`): shapes never change across the
  lifetime of the engine, so XLA compiles exactly two device programs —
  one prefill per prompt-length bucket and ONE decode step — and never
  recompiles as requests come and go.
- **Per-row offsets instead of re-batching.**  Each slot sits at its own
  sequence position (``RowKVCache.lengths``); a single decode dispatch
  advances every active slot by one token with per-row positions and
  per-row causal masks (models/opt.py per-row ``position_offset``).
- **Prefill-to-slot.**  A new request prefills in isolation (batch 1,
  prompt right-padded to a bucket) and its K/V rows are scattered into
  the free slot — decode latency of resident requests is unaffected by
  admission compute only to the extent of the one prefill dispatch.
- **Chunked prefill interleaving** (``prefill_chunk=N``): long prompts
  are prefilled N tokens per engine step (cache prefix + fresh chunk,
  the models' offset>0 ``flash_chunked_prefill`` routing), interleaved
  with resident decode — per-step admission latency is bounded by one
  chunk instead of one whole prompt.

Works with any quantization configuration: the engine drives the live
(possibly ``compress_for_inference``-packed) modules, so packed-BFP fused
kernels, int8 activations, etc. all apply unchanged.
"""

from __future__ import annotations

import dataclasses
import itertools
from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def _slot_layout(row, cache):
    """Single-request cache row in the slot caches' s_minor [H, D, T]
    layout (ops/kv_cache.KVCache): the batch-1 prefill caches share that
    layout, so this is the identity unless a cache class diverges."""
    return row if getattr(cache, "s_minor", False) else row.swapaxes(-1, -2)


def _write_rows(slot_caches, b, caches, length, quantized):
    """Install a freshly-prefilled batch-1 cache into slot ``b`` of every
    layer's slot cache — traced inside the prefill jit so admission is ONE
    dispatch (prefill + install), not two."""
    for sc, c in zip(slot_caches, caches):
        if quantized:
            sc.write_row(
                b,
                _slot_layout(c.k_q.value[0], c),
                _slot_layout(c.v_q.value[0], c),
                c.k_scale.value[0],
                c.v_scale.value[0],
                length=length,
            )
        else:
            sc.write_row(
                b,
                _slot_layout(c.k.value[0], c),
                _slot_layout(c.v.value[0], c),
                length=length,
            )


def _greedy(logits_row):
    """argmax via two plain reduces: the tuple-reduce argmax lowering
    costs ~150us/step on the target chip vs ~10us for this form (same
    trick as bench.py's decode loop)."""
    mx = jnp.max(logits_row, axis=-1, keepdims=True)
    idx = jnp.arange(logits_row.shape[-1], dtype=jnp.int32)
    return jnp.max(
        jnp.where(logits_row == mx, idx, -1), axis=-1
    ).astype(jnp.int32)


def _pick(logits, key, temps, top_k):
    """Per-row token choice: greedy where temps == 0, otherwise
    temperature softmax sampling truncated to top_k (Pipeline.generate's
    sampler, hf.py:473-480, per row)."""
    greedy = _greedy(logits)
    lg = logits.astype(jnp.float32) / jnp.maximum(temps, 1e-6)[:, None]
    if top_k is not None:
        kth = jnp.sort(lg, axis=-1)[:, -top_k][:, None]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    sampled = jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)
    return jnp.where(temps > 0.0, sampled, greedy)


@dataclasses.dataclass
class GenerationResult:
    request_id: int
    prompt_len: int
    tokens: List[int]  # generated tokens (prompt excluded)
    finish_reason: str  # "eos" | "length"


@dataclasses.dataclass
class _Request:
    request_id: int
    prompt: np.ndarray  # [T] int32
    max_new_tokens: int
    eos_token_id: Optional[int]
    temperature: float = 0.0  # 0 = greedy; per-request sampling


@dataclasses.dataclass
class _ChunkedPrefill:
    """In-flight chunked prefill occupying (but not yet decoding in) a
    slot: a batch-1 cache filled ``prefill_chunk`` tokens per engine
    step."""

    request: _Request
    cap: int  # batch-1 cache capacity (bucket rounded up to chunks)
    cache_state: object  # nnx state of the single-request cache list
    filled: int = 0
    last_logits: object = None  # [1, C, V] of the most recent chunk


@dataclasses.dataclass
class _Slot:
    request: Optional[_Request] = None
    generated: List[int] = dataclasses.field(default_factory=list)
    last_token: int = 0

    @property
    def active(self) -> bool:
        return self.request is not None


class ContinuousBatchingEngine:
    """Slot-based continuous batching over an OPT-family causal LM.

    The model must expose ``init_cache(..., per_row=True)`` and accept a
    per-row ``position_offset`` array (models/opt.py).  Any Dmx
    configuration (fake-quant casts, packed serving kernels) applies —
    the engine runs the live module tree.
    """

    def __init__(
        self,
        model,
        *,
        max_slots: int = 4,
        max_len: int = 512,
        prompt_buckets: tuple = (16, 32, 64, 128),
        pad_id: int = 0,
        quantized_kv: bool = False,
        top_k: Optional[int] = None,
        seed: int = 0,
        prefill_chunk: Optional[int] = None,
        chunks_per_step: int = 1,
        pipeline_depth: int = 1,
    ):
        self.model = model
        self.max_slots = max_slots
        self.max_len = max_len
        usable = tuple(b for b in sorted(prompt_buckets) if b <= max_len)
        assert usable, (
            f"no prompt bucket fits max_len={max_len}: {prompt_buckets}"
        )
        self.prompt_buckets = usable
        self.pad_id = pad_id
        self.quantized_kv = quantized_kv
        self.top_k = top_k  # static truncation shared by all sampled rows
        self._key = jax.random.key(seed)
        self.caches = model.init_cache(
            max_slots, max_len, per_row=True, quantized=quantized_kv
        )
        self.slots = [_Slot() for _ in range(max_slots)]
        self.queue: deque[_Request] = deque()
        self.finished: List[GenerationResult] = []
        self._ids = itertools.count()
        self._prefill_fns: Dict[int, callable] = {}
        self._decode_fns: Dict[int, callable] = {}
        self.prefill_chunk = prefill_chunk
        # chunks dispatched per prefilling slot per engine step.  Each chunk
        # stays its own dispatch (the per-dispatch admission stall a resident
        # decoder can see remains one chunk), but a cadence of
        # ~burst/prefill_chunk keeps a prefilling slot's prompt consumption
        # in step with the decoders' token production, so chunked admission
        # costs ~the same number of engine steps as monolithic admission.
        self.chunks_per_step = max(1, int(chunks_per_step))
        self._prefilling: Dict[int, _ChunkedPrefill] = {}  # slot -> state
        # per-step admission-activity counters (serving benches use these to
        # classify steady-state steps; callers may read, never write)
        self.last_step_admissions = 0
        self.last_step_chunks = 0
        self._chunk_fns: Dict[tuple, callable] = {}
        self._finalize_fns: Dict[tuple, callable] = {}
        self._chunk_cache_defs: Dict[int, object] = {}
        # persistent device-side (model, caches) state for the decode hot
        # loop; None = the live modules are authoritative (after admission
        # writes or externally mutated state)
        self._dstate = None
        self._graphdef = None
        # device-resident per-slot last tokens / temperatures for the decode
        # dispatch, updated in place by decode outputs and admissions.
        # Keeping these on device makes the steady-state step exactly ONE
        # dispatch + one seq readback — no per-step uploads or host-side
        # key splits (each is a full tunnel round trip on this platform).
        # Eagerly initialized: with deferred prefill-token readback the
        # host slots lag the device, so they are never a rebuild source.
        self._dtoks = jnp.zeros((max_slots, 1), jnp.int32)
        self._dtemps = jnp.zeros((max_slots,), jnp.float32)
        # in-flight decode steps whose seq readback is deferred (see
        # step()): deque of (seq device array, burst, [(slot, request_id)])
        self.pipeline_depth = max(0, int(pipeline_depth))
        self._pending: deque = deque()

    # ------------------------------------------------------------- intake

    def submit(self, prompt_ids, max_new_tokens: int = 16,
               eos_token_id: Optional[int] = None,
               temperature: float = 0.0) -> int:
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        assert prompt.size > 0, "empty prompt"
        assert prompt.size <= max(self.prompt_buckets), (
            f"prompt length {prompt.size} exceeds the largest bucket "
            f"{max(self.prompt_buckets)}"
        )
        assert prompt.size + max_new_tokens <= self.max_len
        rid = next(self._ids)
        self.queue.append(
            _Request(rid, prompt, max_new_tokens, eos_token_id,
                     float(temperature))
        )
        return rid

    # ------------------------------------------------------------ warmup

    def warmup(self, burst: int = 1) -> None:
        """Compile every dispatch shape the serving loop will hit — the
        per-bucket prefill (every chunk offset plus the finalize epilogue
        when chunked prefill is on) and the ``burst``-decode — by running
        one synthetic full-bucket request per prompt bucket end to end,
        then discarding the results.

        On tunneled TPUs one remote compile costs minutes; without an
        explicit warmup the first requests pay it inside the serving loop
        (the round-4 chunked-prefill serving runs measured p99 step
        latencies of 369 s — all compilation).  Sampled decode
        (temperature > 0) uses a separate jit variant that still compiles
        on first use; warm it by submitting a synthetic request with the
        production temperature before serving.
        """
        assert not (
            self.queue or self._prefilling or self.finished or self._pending
            or any(s.active for s in self.slots)
        ), "warmup() must run on an idle engine (before any submit())"
        for bucket in self.prompt_buckets:
            # a full-bucket prompt may leave < 2 tokens of headroom under
            # max_len; warm with whatever fits (>= 1 decode-token is enough
            # to compile the decode dispatch)
            headroom = self.max_len - bucket
            if headroom < 1:
                continue
            self.submit(
                np.ones((bucket,), np.int32),
                max_new_tokens=min(2, headroom),
            )
            guard = 0
            while (
                self.queue
                or self._prefilling
                or self._pending
                or any(s.active for s in self.slots)
            ):
                self.step(burst)
                guard += 1
                assert guard < 10_000, "warmup request failed to finish"
        self.finished.clear()

    # ------------------------------------------------------------ prefill

    def _bucket_for(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        raise AssertionError("submit() bounds-checked this")

    def _prefill_fn(self, bucket: int, sampling: bool):
        """Jitted single-request prefill at one bucketed length: fresh
        batch-1 caches, installed into the slot caches INSIDE the same
        program (one async dispatch per admission, zero host syncs — the
        next token stays a device scalar until the pipelined readback)."""
        if (bucket, sampling) in self._prefill_fns:
            return self._prefill_fns[(bucket, sampling)]
        if self._graphdef is None:
            self._split_live()
        graphdef = self._graphdef[0]
        gd_c = self._graphdef[1]
        quantized = self.quantized_kv
        top_k = self.top_k
        import functools

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def prefill(model_state, cstate, dtoks, dtemps, b, ids, true_len,
                    temp, key=None):
            mod = nnx.merge(graphdef, model_state)
            slot_caches = nnx.merge(gd_c, cstate)
            caches = mod.init_cache(1, bucket, quantized=quantized)
            logits = mod(ids, caches=caches, position_offset=0)
            boundary = jax.lax.dynamic_slice_in_dim(
                logits[0], true_len - 1, 1, axis=0
            )  # [1, V]
            if sampling:
                nxt = _pick(boundary, key, temp[None], top_k)[0]
            else:
                nxt = _greedy(boundary)[0]
            _write_rows(slot_caches, b, caches, true_len, quantized)
            # fold the decode-input refresh into the same dispatch: an
            # admission is ONE device program, not prefill + 2 scatter RPCs
            return (nnx.split(slot_caches)[1],
                    dtoks.at[b, 0].set(nxt),
                    dtemps.at[b].set(temp), nxt)

        self._prefill_fns[(bucket, sampling)] = prefill
        return prefill

    # ----------------------------------- chunked prefill (interleaved)

    def _chunk_cap(self, n: int) -> int:
        """Single-request cache capacity for a chunked prefill: the prompt
        bucket rounded up to whole chunks (appends advance by exactly one
        chunk per step, pad garbage included, so capacity must be a chunk
        multiple)."""
        c = self.prefill_chunk
        return -(-self._bucket_for(n) // c) * c

    def _chunk_fn(self, cap: int, offset: int):
        """Jitted one-chunk prefill continuation: run ``prefill_chunk``
        tokens at static ``offset`` over the request's private batch-1
        cache (models route offset>0 prefills through
        ops/flash_attention.flash_chunked_prefill when transparent)."""
        if (cap, offset) in self._chunk_fns:
            return self._chunk_fns[(cap, offset)]
        graphdef = nnx.split(self.model)[0]
        cache_def = self._chunk_cache_defs[cap]

        @jax.jit
        def chunk(model_state, cache_state, ids):
            mod = nnx.merge(graphdef, model_state)
            caches = nnx.merge(cache_def, cache_state)
            logits = mod(ids, caches=caches, position_offset=offset)
            return nnx.split(caches)[1], logits

        self._chunk_fns[(cap, offset)] = chunk
        return chunk

    def _finalize_fn(self, cap: int, sampling: bool):
        """Jitted chunked-prefill epilogue: pick the next token at the true
        prompt boundary inside the final chunk's logits and install the
        filled cache rows into the slot caches — one dispatch, no sync."""
        if (cap, sampling) in self._finalize_fns:
            return self._finalize_fns[(cap, sampling)]
        if self._graphdef is None:
            self._split_live()
        gd_c = self._graphdef[1]
        cache_def = self._chunk_cache_defs[cap]
        quantized = self.quantized_kv
        top_k = self.top_k
        import functools

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def finalize(cstate, dtoks, dtemps, cache_state, b, true_len,
                     logits, pos_in_chunk, temp, key=None):
            slot_caches = nnx.merge(gd_c, cstate)
            caches = nnx.merge(cache_def, cache_state)
            boundary = jax.lax.dynamic_slice_in_dim(
                logits[0], pos_in_chunk, 1, axis=0
            )  # [1, V]
            if sampling:
                nxt = _pick(boundary, key, temp[None], top_k)[0]
            else:
                nxt = _greedy(boundary)[0]
            _write_rows(slot_caches, b, caches, true_len, quantized)
            return (nnx.split(slot_caches)[1],
                    dtoks.at[b, 0].set(nxt),
                    dtemps.at[b].set(temp), nxt)

        self._finalize_fns[(cap, sampling)] = finalize
        return finalize

    def _start_chunked(self, b: int, req: _Request) -> None:
        cap = self._chunk_cap(req.prompt.size)
        fresh = self.model.init_cache(1, cap, quantized=self.quantized_kv)
        graphdef, state = nnx.split(fresh)
        self._chunk_cache_defs.setdefault(cap, graphdef)
        self._prefilling[b] = _ChunkedPrefill(req, cap, state)

    def _advance_prefills(self) -> None:
        """Up to ``chunks_per_step`` chunk dispatches per prefilling slot
        (each chunk its OWN dispatch — the per-dispatch stall bound is
        unchanged); finished prefills scatter their rows into the slot and
        join the decode batch the same step."""
        if not self._prefilling:
            return
        C = self.prefill_chunk
        if self._dstate is None:
            self._dstate = self._split_live()
        mstate, cstate = self._dstate
        for b in list(self._prefilling):
            st = self._prefilling[b]
            req = st.request
            for _ in range(self.chunks_per_step):
                ids = np.full((1, C), self.pad_id, np.int32)
                seg = req.prompt[st.filled : st.filled + C]
                ids[0, : seg.size] = seg
                st.cache_state, st.last_logits = self._chunk_fn(
                    st.cap, st.filled
                )(mstate, st.cache_state, jnp.asarray(ids))
                st.filled += C
                self.last_step_chunks += 1
                if st.filled < req.prompt.size:
                    continue
                # final chunk done: sample the boundary token + install the
                # slot in one dispatch; the token's readback rides _pending
                pos_in_chunk = req.prompt.size - 1 - (st.filled - C)
                sampled = req.temperature > 0.0
                args = (cstate, self._dtoks, self._dtemps, st.cache_state,
                        jnp.int32(b), jnp.int32(req.prompt.size),
                        st.last_logits, pos_in_chunk,
                        np.float32(req.temperature))
                if sampled:
                    self._key, sub = jax.random.split(self._key)
                    args += (sub,)
                cstate, self._dtoks, self._dtemps, nxt = (
                    self._finalize_fn(st.cap, sampled)(*args)
                )
                self._dstate = (mstate, cstate)
                slot = self.slots[b]
                slot.request = req
                slot.generated = []
                self._pending.append(("prefill", nxt, b, req.request_id))
                del self._prefilling[b]
                break

    def _admit(self) -> None:
        for b, slot in enumerate(self.slots):
            if not self.queue:
                return
            if slot.active or b in self._prefilling:
                continue
            req = self.queue.popleft()
            if (
                self.prefill_chunk is not None
                and req.prompt.size > self.prefill_chunk
            ):
                self._start_chunked(b, req)
                self.last_step_admissions += 1
                continue
            bucket = self._bucket_for(req.prompt.size)
            ids = np.full((1, bucket), self.pad_id, np.int32)
            ids[0, : req.prompt.size] = req.prompt
            if self._dstate is None:
                self._dstate = self._split_live()
            mstate, cstate = self._dstate
            sampled = req.temperature > 0.0
            # ids ride the dispatch as a raw np array (no separate upload
            # round trip); toks/temps refresh happens inside the program
            args = (mstate, cstate, self._dtoks, self._dtemps,
                    jnp.int32(b), ids, req.prompt.size,
                    np.float32(req.temperature))
            if sampled:
                self._key, sub = jax.random.split(self._key)
                args += (sub,)
            # prefill + slot install + decode-input refresh in ONE async
            # dispatch; the next token's readback is deferred through
            # _pending (an admission costs ZERO host syncs)
            cstate, self._dtoks, self._dtemps, nxt = (
                self._prefill_fn(bucket, sampled)(*args)
            )
            self._dstate = (mstate, cstate)
            slot.request = req
            slot.generated = []
            self._pending.append(("prefill", nxt, b, req.request_id))
            self.last_step_admissions += 1

    # ------------------------------------------------------------- decode

    def _sync_to_live(self) -> None:
        """Apply the device-side state back onto the live modules (needed
        before admission writes or external inspection)."""
        if self._dstate is not None:
            mstate, cstate = self._dstate
            nnx.update(self.model, mstate)
            nnx.update(self.caches, cstate)
            self._dstate = None

    def _split_live(self):
        if self._graphdef is None:
            self._graphdef = (
                nnx.split(self.model)[0], nnx.split(self.caches)[0]
            )
        return (nnx.split(self.model)[1], nnx.split(self.caches)[1])

    def _assert_serving_safe(self) -> None:
        """The decode scan carries ONLY the cache state; any other state the
        model mutates during forward (an observer left enabled, a
        calibrating SmoothQuant) would be silently dropped — fail loudly
        instead of recording nothing (ADVICE r4)."""
        from ..numerics.cast import CastTo

        bad = []
        for path, node in nnx.iter_graph(self.model):
            p = "/".join(str(s) for s in path)
            if isinstance(node, CastTo) and node.observer_enabled:
                bad.append(f"{p}: observer enabled")
            sq = getattr(node, "smoothquant", None)
            if sq is not None and getattr(sq, "calibrating", False):
                bad.append(f"{p}: smoothquant calibrating")
        assert not bad, (
            "serving decode discards model-state mutations; disable these "
            "stateful subsystems before serving (freeze/calibrate offline): "
            + "; ".join(bad)
        )

    def _decode(self, burst: int, sampling: bool):
        """Jitted burst-decode: ``burst`` tokens per dispatch via lax.scan,
        cache state donated and kept device-side — one host round-trip per
        burst instead of per token (essential on tunneled TPUs).  Weights
        are a READ-ONLY argument, never an output or scan carry: buffer
        donation does not alias on the tunneled platform, so routing them
        through the output would copy every weight per dispatch (and OOM
        multi-GB models).  The all-greedy variant skips the sampler
        entirely (no [B, V] sort / categorical on the hot path)."""
        if (burst, sampling) in self._decode_fns:
            return self._decode_fns[(burst, sampling)]
        self._assert_serving_safe()
        if self._graphdef is None:
            self._split_live()
        gd_m, gd_c = self._graphdef
        top_k = self.top_k
        import functools

        # Greedy (the common serving case) takes NO key/temps — the whole
        # steady-state step is one dispatch on device-resident state plus
        # one seq readback.  Sampling threads the PRNG key through the jit
        # (key advances on device; no host-side jax.random.split dispatch).
        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def step(mstate, cstate, toks, key=None, temps=None):
            def body(carry, _):
                cstate, toks, key = carry
                mod = nnx.merge(gd_m, mstate)
                caches = nnx.merge(gd_c, cstate)
                off = caches[0].lengths.value  # [B] per-row positions
                logits = mod(toks, caches=caches, position_offset=off)
                c2 = nnx.split(caches)[1]
                if sampling:
                    key, sub = jax.random.split(key)
                    nxt = _pick(logits[:, -1], sub, temps, top_k)
                else:
                    nxt = _greedy(logits[:, -1])
                return (c2, nxt[:, None], key), nxt

            (cstate, toks, key), seq = jax.lax.scan(
                body, (cstate, toks, key), None, length=burst
            )
            out = (cstate, toks, seq.T)  # [B, burst]
            return out + ((key,) if sampling else ())

        self._decode_fns[(burst, sampling)] = step
        return step

    def _retire_if_done(self, b: int) -> None:
        slot = self.slots[b]
        req = slot.request
        done_eos = (
            req.eos_token_id is not None and slot.generated
            and slot.generated[-1] == req.eos_token_id
        )
        done_len = len(slot.generated) >= req.max_new_tokens
        if done_eos or done_len:
            self.finished.append(
                GenerationResult(
                    request_id=req.request_id,
                    prompt_len=int(req.prompt.size),
                    tokens=list(slot.generated),
                    finish_reason="eos" if done_eos else "length",
                )
            )
            slot.request = None
            slot.generated = []

    def step(self, burst: int = 1) -> List[GenerationResult]:
        """Admit queued requests into free slots, advance every active slot
        by ``burst`` tokens in one dispatch, and return newly finished
        results.  Slots that finish mid-burst keep decoding garbage until
        the burst ends (truncated host-side, standard slot semantics).

        The seq readback is PIPELINED: a dispatched step's tokens are read
        back only after the NEXT step is dispatched (``pipeline_depth``
        in-flight steps, default 1).  On this platform one host sync costs
        ~38 ms of tunnel round trip (tools/diag_engine_step.py), so reading
        step N while step N+1 computes hides it; the decode inputs
        (toks/temps/key) live on device, so the speculative dispatch needs
        nothing from the readback."""
        n_done = len(self.finished)
        # apply in-flight readbacks past the pipeline depth FIRST: slots
        # retired by an already-dispatched step free up before THIS step's
        # admission, and (because the prefill program refreshes the decode
        # inputs in the same dispatch) the refilled slot joins this step's
        # decode burst instead of idling one extra burst per turnover
        while len(self._pending) > self.pipeline_depth:
            self._apply_oldest()
        self.last_step_admissions = 0
        self.last_step_chunks = 0
        self._admit()  # admission installs ride the device-side cstate
        self._advance_prefills()  # bounded chunks each, interleaved
        if any(s.active for s in self.slots):
            if self._dstate is None:
                self._dstate = self._split_live()
            temps_host = [
                s.request.temperature if s.active else 0.0
                for s in self.slots
            ]
            sampling = any(t > 0.0 for t in temps_host)
            seq = self._dispatch(burst, sampling)
            snapshot = [
                (b, s.request.request_id)
                for b, s in enumerate(self.slots) if s.active
            ]
            self._pending.append(("decode", seq, burst, snapshot))
        if not (self.queue or self._prefilling):
            # no upstream work left: drain in-flight steps so callers see
            # every result without extra garbage dispatches
            while self._pending and not any(s.active for s in self.slots):
                self._apply_oldest()

            def in_flight(b):
                n = 0
                for e in self._pending:
                    if e[0] == "prefill" and e[2] == b:
                        n += 1
                    elif e[0] == "decode" and any(
                        bb == b for bb, _ in e[3]
                    ):
                        n += e[2]
                return n

            if self._pending and all(
                len(s.generated) + in_flight(b) >= s.request.max_new_tokens
                for b, s in enumerate(self.slots) if s.active
            ):
                # every remaining token is already in flight
                while self._pending:
                    self._apply_oldest()
        return self.finished[n_done:]

    def _dispatch(self, burst: int, sampling: bool):
        """Issue one decode dispatch on the device-resident state; returns
        the (not yet read back) [B, burst] token array."""
        mstate, cstate = self._dstate
        if sampling:
            cstate, self._dtoks, seq, self._key = self._decode(burst, True)(
                mstate, cstate, self._dtoks, self._key, self._dtemps
            )
        else:
            cstate, self._dtoks, seq = self._decode(burst, False)(
                mstate, cstate, self._dtoks
            )
        self._dstate = (mstate, cstate)
        return seq

    def _apply_oldest(self) -> None:
        """Read back the oldest in-flight result (a decode step's tokens or
        an admission's prefill token) and apply it to the slots that were
        active at its dispatch (identified by request id — a slot
        retired-and-readmitted since then skips the stale tokens)."""
        entry = self._pending.popleft()
        if entry[0] == "prefill":
            _, nxt, b, rid = entry
            tok = int(np.asarray(nxt))
            slot = self.slots[b]
            if slot.request is not None and slot.request.request_id == rid:
                slot.generated.append(tok)
                slot.last_token = tok
                self._retire_if_done(b)
            return
        _, seq, burst, snapshot = entry
        seq = np.asarray(seq)  # the ONE host sync of the steady-state loop
        for j in range(burst):
            for b, rid in snapshot:
                slot = self.slots[b]
                if slot.request is None or slot.request.request_id != rid:
                    continue
                slot.generated.append(int(seq[b, j]))
                slot.last_token = int(seq[b, j])
                self._retire_if_done(b)

    def run(self, burst: int = 1) -> List[GenerationResult]:
        """Drain the queue and all active slots to completion."""
        while (
            self.queue or self._prefilling or self._pending
            or any(s.active for s in self.slots)
        ):
            self.step(burst)
        while self._pending:  # safety: step() normally drains these
            self._apply_oldest()
        # hand the (donated-and-replaced) device state back to the live
        # modules so the model is usable outside the engine again
        self._sync_to_live()
        return self.finished


@dataclasses.dataclass
class _Seq2SeqRequest(_Request):
    encoder_input: Optional[np.ndarray] = None


class Seq2SeqBatchingEngine(ContinuousBatchingEngine):
    """Continuous batching for encoder-decoder models (Whisper-style).

    Each slot additionally owns a row of a fixed-shape encoder-output
    buffer [max_slots, S_enc, D]: admission encodes the request's input
    once (inside the bucketed prefill program) and scatters the encoder
    states into the slot; the decode step recomputes cross-attention
    K/V from the slot's encoder row per token (the model's own decode
    semantics, models/whisper.py).  Decoder self-attention uses the same
    per-row KV caches as the causal-LM engine.

    The model must expose ``encode(features)`` and
    ``decode(ids, enc, caches, position_offset)`` with per-row
    ``position_offset`` support.
    """

    def __init__(self, model, *, enc_capacity: Optional[int] = None,
                 **kwargs):
        assert kwargs.get("prefill_chunk") is None, (
            "chunked prefill applies to decoder-only engines (seq2seq "
            "decoder prompts are start tokens; the encoder pass is one "
            "fixed-shape dispatch)"
        )
        super().__init__(model, **kwargs)
        self._enc = None  # [max_slots, S_enc, D], allocated on first prefill
        # ragged token-id encoder inputs (T5-style) are right-padded to
        # enc_capacity and masked; fixed-shape feature inputs (Whisper) must
        # all share one shape
        self.enc_capacity = enc_capacity
        self._enc_lens = np.zeros((self.max_slots,), np.int32)
        import inspect

        params = inspect.signature(model.decode).parameters
        self._masked_encoder = (
            "enc_mask" in params
            and "attn_mask" in inspect.signature(model.encode).parameters
        )

    # ------------------------------------------------------------- intake

    def submit(self, encoder_input, decoder_start_ids=None,
               max_new_tokens: int = 16, eos_token_id: Optional[int] = None,
               temperature: float = 0.0) -> int:
        feats = np.asarray(encoder_input)  # audio features or token ids
        if feats.ndim == 1:
            assert self._masked_encoder, (
                "ragged token-id encoder inputs need a model with "
                "encode(attn_mask)/decode(enc_mask) support"
            )
            if self.enc_capacity is None:
                self.enc_capacity = int(feats.size)
            assert feats.size <= self.enc_capacity, (
                f"encoder input length {feats.size} exceeds "
                f"enc_capacity={self.enc_capacity}"
            )
        if decoder_start_ids is None:
            decoder_start_ids = np.zeros((1,), np.int32)
        prompt = np.asarray(decoder_start_ids, np.int32).reshape(-1)
        assert prompt.size > 0
        assert prompt.size <= max(self.prompt_buckets)
        assert prompt.size + max_new_tokens <= self.max_len
        rid = next(self._ids)
        self.queue.append(
            _Seq2SeqRequest(rid, prompt, max_new_tokens, eos_token_id,
                            float(temperature), encoder_input=feats)
        )
        return rid

    # ------------------------------------------------------------ prefill

    def _prefill_fn(self, bucket: int, sampling: bool):
        if (bucket, sampling) in self._prefill_fns:
            return self._prefill_fns[(bucket, sampling)]
        if self._graphdef is None:
            self._split_live()
        graphdef, gd_c = self._graphdef
        quantized = self.quantized_kv
        top_k = self.top_k
        import functools

        masked = self._masked_encoder

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3))
        def prefill(model_state, cstate, dtoks, dtemps, b, feats, ids,
                    true_len, enc_len, temp, key=None):
            mod = nnx.merge(graphdef, model_state)
            slot_caches = nnx.merge(gd_c, cstate)
            caches = mod.init_cache(1, bucket, quantized=quantized)
            if masked:
                S = feats.shape[-1]
                emask = jnp.where(
                    jnp.arange(S)[None, None, None, :] < enc_len, 0.0, -1e4
                ).astype(jnp.float32)
                enc = mod.encode(feats, attn_mask=emask)  # [1, S_enc, D]
                logits = mod.decode(ids, enc, caches=caches,
                                    position_offset=0, enc_mask=emask)
            else:
                enc = mod.encode(feats)  # [1, S_enc, D]
                logits = mod.decode(ids, enc, caches=caches,
                                    position_offset=0)
            boundary = jax.lax.dynamic_slice_in_dim(
                logits[0], true_len - 1, 1, axis=0
            )
            if sampling:
                nxt = _pick(boundary, key, temp[None], top_k)[0]
            else:
                nxt = _greedy(boundary)[0]
            _write_rows(slot_caches, b, caches, true_len, quantized)
            return (nnx.split(slot_caches)[1],
                    dtoks.at[b, 0].set(nxt),
                    dtemps.at[b].set(temp), enc[0], nxt)

        self._prefill_fns[(bucket, sampling)] = prefill
        return prefill

    def _admit(self) -> None:
        for b, slot in enumerate(self.slots):
            if not self.queue:
                return
            if slot.active:
                continue
            req = self.queue.popleft()
            bucket = self._bucket_for(req.prompt.size)
            ids = np.full((1, bucket), self.pad_id, np.int32)
            ids[0, : req.prompt.size] = req.prompt
            feats = req.encoder_input
            enc_len = feats.shape[-1]
            if feats.ndim == 1:  # ragged token ids: pad to capacity
                enc_len = feats.size
                padded = np.full((self.enc_capacity,), self.pad_id,
                                 feats.dtype)
                padded[: feats.size] = feats
                feats = padded
            if self._dstate is None:
                self._dstate = self._split_live()
            mstate, cstate = self._dstate
            sampled = req.temperature > 0.0
            args = (mstate, cstate, self._dtoks, self._dtemps,
                    jnp.int32(b), feats[None], ids, req.prompt.size,
                    enc_len, np.float32(req.temperature))
            if sampled:
                self._key, sub = jax.random.split(self._key)
                args += (sub,)
            cstate, self._dtoks, self._dtemps, enc_row, nxt = (
                self._prefill_fn(bucket, sampled)(*args)
            )
            self._enc_lens[b] = enc_len
            if self._enc is None:
                self._enc = jnp.zeros(
                    (self.max_slots, *enc_row.shape), enc_row.dtype
                )
            self._enc = self._enc.at[b].set(enc_row)
            self._dstate = (mstate, cstate)
            slot.request = req
            slot.generated = []
            self._pending.append(("prefill", nxt, b, req.request_id))
            self.last_step_admissions += 1

    # ------------------------------------------------------------- decode

    def _decode(self, burst: int, sampling: bool):
        if (burst, sampling) in self._decode_fns:
            return self._decode_fns[(burst, sampling)]
        self._assert_serving_safe()
        if self._graphdef is None:
            self._split_live()
        gd_m, gd_c = self._graphdef
        top_k = self.top_k
        import functools

        masked = self._masked_encoder

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def step(mstate, cstate, toks, enc, enc_lens, key=None, temps=None):
            if masked:
                S = enc.shape[1]
                emask = jnp.where(
                    jnp.arange(S)[None, None, None, :]
                    < enc_lens[:, None, None, None],
                    0.0, -1e4,
                ).astype(jnp.float32)

            def body(carry, _):
                cstate, toks, key = carry
                mod = nnx.merge(gd_m, mstate)
                caches = nnx.merge(gd_c, cstate)
                off = caches[0].lengths.value
                if masked:
                    logits = mod.decode(toks, enc, caches=caches,
                                        position_offset=off, enc_mask=emask)
                else:
                    logits = mod.decode(toks, enc, caches=caches,
                                        position_offset=off)
                c2 = nnx.split(caches)[1]
                if sampling:
                    key, sub = jax.random.split(key)
                    nxt = _pick(logits[:, -1], sub, temps, top_k)
                else:
                    nxt = _greedy(logits[:, -1])
                return (c2, nxt[:, None], key), nxt

            (cstate, toks, key), seq = jax.lax.scan(
                body, (cstate, toks, key), None, length=burst
            )
            out = (cstate, toks, seq.T)
            return out + ((key,) if sampling else ())

        self._decode_fns[(burst, sampling)] = step
        return step

    def _dispatch(self, burst: int, sampling: bool):
        """Causal-LM dispatch plus the slot encoder rows / lengths (the
        shared pipelined ``step()`` drives this)."""
        mstate, cstate = self._dstate
        enc_lens = jnp.asarray(self._enc_lens)
        if sampling:
            cstate, self._dtoks, seq, self._key = self._decode(burst, True)(
                mstate, cstate, self._dtoks, self._enc, enc_lens,
                self._key, self._dtemps,
            )
        else:
            cstate, self._dtoks, seq = self._decode(burst, False)(
                mstate, cstate, self._dtoks, self._enc, enc_lens
            )
        self._dstate = (mstate, cstate)
        return seq
