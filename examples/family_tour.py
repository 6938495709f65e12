"""Tour of the model-family surface: every decoder family BASIC-quantized,
a seq2seq generation, and jaxpr-level interception of un-authored code.

Runs offline on CPU in a couple of minutes (tiny configs, random weights):

    JAX_PLATFORMS=cpu python examples/family_tour.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from flax import nnx

from dmx_compressor_tpu.modeling.model import DmxModel


def ids(b, t, v, seed=0):
    return np.random.RandomState(seed).randint(0, v, (b, t)).astype("int32")


def decoder_families():
    from dmx_compressor_tpu.models.gemma import GemmaConfig, GemmaForCausalLM
    from dmx_compressor_tpu.models.gpt2 import GPT2Config, GPT2LMHeadModel
    from dmx_compressor_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from dmx_compressor_tpu.models.mistral import MistralConfig, MistralForCausalLM
    from dmx_compressor_tpu.models.opt import OPTConfig, OPTForCausalLM
    from dmx_compressor_tpu.models.qwen3 import Qwen3Config, Qwen3ForCausalLM

    return [
        ("opt", OPTConfig.tiny(), OPTForCausalLM),
        ("gpt2", GPT2Config.tiny(), GPT2LMHeadModel),
        ("llama", LlamaConfig.tiny(), LlamaForCausalLM),
        ("mistral", MistralConfig.tiny(), MistralForCausalLM),
        ("gemma", GemmaConfig.tiny(), GemmaForCausalLM),
        ("qwen3", Qwen3Config.tiny(), Qwen3ForCausalLM),
    ]


def main():
    # 1. every decoder family under the BASIC rule set
    for name, cfg, cls in decoder_families():
        model = cls(cfg, rngs=nnx.Rngs(0))
        dm = DmxModel.from_raw(model)
        dm.to_basic_mode()
        x = ids(2, 16, cfg.vocab_size)
        fp32_ref = cls(cfg, rngs=nnx.Rngs(0))
        delta = float(
            jnp.abs(jnp.asarray(dm(x)) - jnp.asarray(fp32_ref(x))).max()
        )
        n_mods = sum(1 for _ in dm.named_dmx_modules())
        print(f"{name:8s} BASIC ok: {n_mods:3d} dmx modules, "
              f"|basic - fp32|max = {delta:.4f}")

    # 2. encoder-decoder generation (T5)
    from dmx_compressor_tpu.models.t5 import T5Config, T5ForConditionalGeneration

    t5 = T5ForConditionalGeneration(T5Config.tiny(), rngs=nnx.Rngs(0))
    DmxModel.from_raw(t5).to_basic_mode()
    out = t5.generate(ids(2, 10, 512), np.zeros((2, 1), np.int32), max_new_tokens=6)
    print(f"t5       BASIC seq2seq generate ok: {np.asarray(out).shape}")

    # 3. jaxpr-level interception of un-authored jax code
    def third_party(x, w1, w2):
        return jax.nn.relu(x @ w1) @ w2 + x

    rs = np.random.RandomState(0)
    args = (
        jnp.asarray(rs.randn(4, 64), jnp.float32),
        jnp.asarray(rs.randn(64, 64), jnp.float32),
        jnp.asarray(rs.randn(64, 64), jnp.float32),
    )
    qf = DmxModel.from_function(third_party, args)
    d = float(jnp.abs(qf(*args) - third_party(*args)).max())
    print(f"intercept ok: sites={qf.sites}, |quant - exact|max = {d:.4f}")


if __name__ == "__main__":
    main()
