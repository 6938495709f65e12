"""CLIP retrieval benchmark across evaluation modes.

TPU-native analogue of the reference's CLIP benchmark
(reference: examples/benchmarking/benchmark_clip.py): build a CLIP model,
wrap/configure it per EVALUATION_MODE, and print runtime / accuracy /
per-layer-error tables via the model_maker-contract harness
(utils/benchmark.py).

The reference evaluates text->image retrieval top-K over 1000 COCO pairs;
this environment is zero-egress, so the dataset here is a synthetic
paired corpus (image i <-> caption i) at a configurable scale and the
model is randomly initialized unless ``--ckpt`` points at a local HF
checkpoint directory (modeling/hf.py ingests safetensors/bin).  The
mode-to-mode *deltas* (BASIC vs Vanilla retrieval drop, per-layer mse)
are the meaningful output with random weights; with a real checkpoint the
absolute numbers become the reference's.

Run: ``python examples/benchmarking/benchmark_clip.py [--full] [--ckpt DIR]``
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

from dmx_compressor_tpu.models.clip import CLIPConfig, CLIPModel
from dmx_compressor_tpu.utils.benchmark import (
    EVALUATION_MODE,
    measure_model_accuracy,
    measure_model_error,
    measure_model_runtime,
)

N_PAIRS = 64
BATCH = 8
TOP_K = (1, 5, 10)

_vanilla_retrieval = {}


def make_dataset(cfg: CLIPConfig, n: int):
    """Synthetic paired (image, caption) corpus: deterministic per index."""
    rng = np.random.default_rng(0)
    v = cfg.vision
    images = rng.standard_normal(
        (n, 3, v.image_size, v.image_size), np.float32
    )
    texts = rng.integers(
        0, cfg.text.vocab_size, (n, cfg.text.max_position_embeddings)
    ).astype(np.int32)
    return jnp.asarray(images), jnp.asarray(texts)


def model_maker():
    cfg = CLIPConfig.vit_b_32() if "--full" in sys.argv else CLIPConfig.tiny()
    model = CLIPModel(cfg, rngs=nnx.Rngs(0))
    if "--ckpt" in sys.argv:
        from dmx_compressor_tpu.modeling.hf import (
            load_hf_state_dict,
            read_hf_checkpoint,
        )

        tensors = read_hf_checkpoint(sys.argv[sys.argv.index("--ckpt") + 1])
        load_hf_state_dict(model, model.hf_tensor_converter(tensors))
    images, texts = make_dataset(cfg, N_PAIRS)

    def model_runner(m):
        return m(texts[:BATCH], images[:BATCH])

    def model_evaluator(m, desc: str):
        """Text->image retrieval top-K over the paired corpus (the
        reference's COCO metric, benchmark_clip.py:17-75), plus ranking
        agreement with the Vanilla model — the metric that stays
        informative when weights are random (with a real checkpoint the
        top-K numbers become the reference's)."""
        print(f"evaluating clip model {desc}")
        img_embeds, txt_embeds = [], []
        for i in range(0, N_PAIRS, BATCH):
            img = m.get_image_features(images[i : i + BATCH])
            txt = m.get_text_features(texts[i : i + BATCH])
            img_embeds.append(img / jnp.linalg.norm(img, axis=-1, keepdims=True))
            txt_embeds.append(txt / jnp.linalg.norm(txt, axis=-1, keepdims=True))
        img_e = jnp.concatenate(img_embeds)
        txt_e = jnp.concatenate(txt_embeds)
        sim = txt_e @ img_e.T  # [n_text, n_image]
        order = jnp.argsort(-sim, axis=-1)
        correct = order == jnp.arange(sim.shape[0])[:, None]
        retrieved = np.asarray(order[:, 0])
        if desc == EVALUATION_MODE.VANILLA.value:
            _vanilla_retrieval[EVALUATION_MODE.VANILLA.value] = retrieved
        ref = _vanilla_retrieval.get(EVALUATION_MODE.VANILLA.value, retrieved)
        metrics = {
            f"top{k}_acc": float(jnp.mean(jnp.any(correct[:, :k], axis=-1)))
            for k in TOP_K
        }
        metrics["retrieval_agreement_vs_vanilla"] = float(
            np.mean(retrieved == ref)
        )
        return metrics

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
