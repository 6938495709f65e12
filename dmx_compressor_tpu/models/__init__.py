"""In-repo model zoo: authored with transformable modules, HF-checkpoint
compatible layouts."""

from .lenet import LeNet5
from ..ops.kv_cache import KVCache, QuantizedKVCache
from .opt import OPTConfig, OPTForCausalLM, loss_fn
from .gpt2 import GPT2Config, GPT2LMHeadModel
from .llama import LlamaConfig, LlamaForCausalLM
from .gemma import GemmaConfig, GemmaForCausalLM
from .qwen3 import Qwen3Config, Qwen3ForCausalLM
from .t5 import T5Config, T5ForConditionalGeneration
