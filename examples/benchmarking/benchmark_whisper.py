"""Whisper transcription benchmark across evaluation modes.

Encoder-decoder counterpart of benchmark_clip.py: runs the full greedy
transcription loop (encode once + device-side scan decode,
models/whisper.py) per EVALUATION_MODE and prints runtime / accuracy /
per-layer-error tables (reference harness contract:
examples/benchmarking/README.md).

Zero-egress stand-ins: synthetic log-mel features, random weights (or
``--ckpt DIR`` for a local HF checkpoint), and token-level agreement with
the Vanilla transcription as the accuracy metric — with a real checkpoint
this becomes transcription WER parity.

Run: ``python examples/benchmarking/benchmark_whisper.py [--full] [--ckpt DIR]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

# the deployment forces the axon TPU platform into jax_platforms even when
# JAX_PLATFORMS=cpu is exported; honor the env var explicitly
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from flax import nnx

from dmx_compressor_tpu.models.whisper import (
    WhisperConfig,
    WhisperForConditionalGeneration,
)
from dmx_compressor_tpu.utils.benchmark import (
    EVALUATION_MODE,
    measure_model_accuracy,
    measure_model_error,
    measure_model_runtime,
)

BATCH = 2
GEN_LEN = 12

_vanilla_tokens = {}


def model_maker():
    cfg = WhisperConfig.small() if "--full" in sys.argv else WhisperConfig.tiny()
    model = WhisperForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    if "--ckpt" in sys.argv:
        from dmx_compressor_tpu.modeling.hf import (
            load_hf_state_dict,
            read_hf_checkpoint,
        )

        tensors = read_hf_checkpoint(sys.argv[sys.argv.index("--ckpt") + 1])
        load_hf_state_dict(model, model.hf_tensor_converter(tensors))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal(
            (BATCH, cfg.num_mel_bins, cfg.max_source_positions * 2), np.float32
        )
    )
    start = jnp.zeros((BATCH, 1), jnp.int32)

    def transcribe(m):
        # DmxModel delegates attribute access to the wrapped module, so the
        # same call covers raw and Dmx-wrapped models
        return m.generate(feats, start, max_new_tokens=GEN_LEN)

    def model_runner(m):
        # eager encoder-decoder forward (reference harness semantics:
        # per-layer hooks need an un-jitted runner); the full jitted
        # transcription loop is exercised by the accuracy evaluator
        ids = jnp.zeros((BATCH, 4), jnp.int32)
        return m(feats, ids)

    def model_evaluator(m, desc: str):
        """Token agreement with the Vanilla transcription (transcription
        parity stand-in; the reference evaluates WER on real audio)."""
        print(f"evaluating whisper model {desc}")
        toks = np.asarray(transcribe(m))
        if desc == EVALUATION_MODE.VANILLA.value:
            _vanilla_tokens[EVALUATION_MODE.VANILLA.value] = toks
        ref = _vanilla_tokens.get(EVALUATION_MODE.VANILLA.value, toks)
        return {
            "token_agreement": float(np.mean(toks == ref)),
            "n_tokens": float(toks.size),
        }

    return model, model_runner, model_evaluator


if __name__ == "__main__":
    modes = [
        EVALUATION_MODE.VANILLA,
        EVALUATION_MODE.BASELINE,
        EVALUATION_MODE.BASIC_NOVSIMD,
        EVALUATION_MODE.BASIC,
    ]
    print(f"devices: {jax.devices()}\n")
    measure_model_runtime(model_maker, modes)
    print()
    measure_model_accuracy(model_maker, modes)
    print()
    measure_model_error(
        model_maker,
        [EVALUATION_MODE.BASIC],
        reference_mode=EVALUATION_MODE.BASELINE,
    )
