"""HuggingFace integration: checkpoint import, pipeline, evaluation.

TPU-native re-design of the reference HF layer
(reference: src/dmx/compressor/modeling/hf.py).  The reference wraps
``transformers.pipeline`` and fx-traces the torch model; here HF *checkpoints*
(safetensors / torch .bin, loaded host-side to numpy) are imported into the
in-repo model zoo (models/), which is then substituted/configured through the
standard DmxModel path.  Evaluation reproduces the strided sliding-window
perplexity loop (hf.py:81-140).

Everything degrades gracefully when offline: tokenizers/datasets are optional
(zero-egress environments run on pre-tokenized ids).
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from .model import DmxConfig, DmxModel

# dataset column names for common LM eval sets (reference hf.py:52-58)
column_mapping = {
    "wikitext": "text",
    "ptb_text_only": "sentence",
    "lambada": "text",
    "EleutherAI/lambada_openai": "text",
}


# ---------------------------------------------------------------------------
# checkpoint import
# ---------------------------------------------------------------------------


def read_hf_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors of a local HF checkpoint directory to numpy."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if st_files:
        from safetensors.numpy import load_file

        for f in sorted(st_files):
            tensors.update(load_file(os.path.join(path, f)))
        return tensors
    bin_files = [f for f in os.listdir(path) if f.endswith(".bin")]
    if bin_files:
        import torch

        for f in sorted(bin_files):
            sd = torch.load(
                os.path.join(path, f), map_location="cpu", weights_only=True
            )
            tensors.update({k: v.float().numpy() for k, v in sd.items()})
        return tensors
    raise FileNotFoundError(f"no safetensors/bin checkpoint under {path}")


def _resolve(obj, path: str):
    if path == "":  # top-level parameter (e.g. CLIP's logit_scale)
        return obj
    for part in path.split("."):
        if part.isdigit():
            obj = obj[int(part)]
        else:
            obj = getattr(obj, part)
    return obj


def load_hf_state_dict(model, tensors: Dict[str, np.ndarray]) -> List[str]:
    """Assign HF-named tensors onto the model tree.

    Handles both raw nnx modules (kernel [in,out] layout) and Dmx modules
    (torch [out,in] layout).  Returns the list of unmatched keys.
    """
    from ..nn.core import DmxModule

    missed = []
    for name, arr in tensors.items():
        arr = jnp.asarray(np.asarray(arr, np.float32))
        parts = name.split(".")
        leaf = parts[-1]  # weight | bias
        try:
            owner = _resolve(model, ".".join(parts[:-1]))
        except (AttributeError, IndexError, KeyError):
            missed.append(name)
            continue
        if isinstance(owner, DmxModule):
            target = getattr(owner, leaf, None)
            if target is None:
                missed.append(name)
                continue
            target.value = arr.astype(target.value.dtype).reshape(target.value.shape)
        elif isinstance(owner, nnx.Linear):
            if leaf == "weight":
                owner.kernel.value = arr.T
            else:
                owner.bias.value = arr
        elif isinstance(owner, nnx.Embed):
            owner.embedding.value = arr
        elif isinstance(owner, (nnx.LayerNorm, nnx.RMSNorm)):
            if leaf == "weight":
                owner.scale.value = arr
            else:
                owner.bias.value = arr
        else:
            target = getattr(owner, leaf, None)
            if target is not None and hasattr(target, "value"):
                target.value = arr.reshape(target.value.shape)
            else:
                missed.append(name)
    return missed


def model_from_checkpoint(path: str, *, dtype=jnp.float32):
    """Build a zoo model from a local HF checkpoint directory (config.json
    decides the architecture)."""
    with open(os.path.join(path, "config.json")) as f:
        cfg_json = json.load(f)
    model_type = cfg_json.get("model_type")
    if model_type == "opt":
        from ..models.opt import OPTConfig, OPTForCausalLM

        cfg = OPTConfig(
            vocab_size=cfg_json["vocab_size"],
            hidden_size=cfg_json["hidden_size"],
            ffn_dim=cfg_json["ffn_dim"],
            num_hidden_layers=cfg_json["num_hidden_layers"],
            num_attention_heads=cfg_json["num_attention_heads"],
            max_position_embeddings=cfg_json["max_position_embeddings"],
            do_layer_norm_before=cfg_json.get("do_layer_norm_before", True),
            dtype=dtype,
        )
        model = OPTForCausalLM(cfg, rngs=nnx.Rngs(0))
    elif model_type == "gpt2":
        from ..models.gpt2 import GPT2Config, GPT2LMHeadModel

        cfg = GPT2Config.from_hf(cfg_json)
        model = GPT2LMHeadModel(cfg, rngs=nnx.Rngs(0))
    elif model_type == "llama":
        from ..models.llama import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig.from_hf(cfg_json)
        model = LlamaForCausalLM(cfg, rngs=nnx.Rngs(0))
    elif model_type == "mistral":
        from ..models.mistral import MistralConfig, MistralForCausalLM

        cfg = MistralConfig.from_hf(cfg_json)
        model = MistralForCausalLM(cfg, rngs=nnx.Rngs(0))
    elif model_type == "gemma":
        from ..models.gemma import GemmaConfig, GemmaForCausalLM

        cfg = GemmaConfig.from_hf(cfg_json)
        model = GemmaForCausalLM(cfg, rngs=nnx.Rngs(0))
    elif model_type == "qwen3":
        from ..models.qwen3 import Qwen3Config, Qwen3ForCausalLM

        cfg = Qwen3Config.from_hf(cfg_json)
        model = Qwen3ForCausalLM(cfg, rngs=nnx.Rngs(0))
    elif model_type == "t5":
        from ..models.t5 import T5Config, T5ForConditionalGeneration

        cfg = T5Config.from_hf(cfg_json)
        model = T5ForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    elif model_type == "whisper":
        from ..models.whisper import WhisperConfig, WhisperForConditionalGeneration

        cfg = WhisperConfig.from_hf(cfg_json)
        model = WhisperForConditionalGeneration(cfg, rngs=nnx.Rngs(0))
    elif model_type == "clip":
        from ..models.clip import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

        v, t = cfg_json["vision_config"], cfg_json["text_config"]
        cfg = CLIPConfig(
            vision=CLIPVisionConfig(
                hidden_size=v.get("hidden_size", 768),
                intermediate_size=v.get("intermediate_size", 3072),
                num_hidden_layers=v.get("num_hidden_layers", 12),
                num_attention_heads=v.get("num_attention_heads", 12),
                image_size=v.get("image_size", 224),
                patch_size=v.get("patch_size", 32),
            ),
            text=CLIPTextConfig(
                vocab_size=t.get("vocab_size", 49408),
                hidden_size=t.get("hidden_size", 512),
                intermediate_size=t.get("intermediate_size", 2048),
                num_hidden_layers=t.get("num_hidden_layers", 12),
                num_attention_heads=t.get("num_attention_heads", 8),
                max_position_embeddings=t.get("max_position_embeddings", 77),
            ),
            projection_dim=cfg_json.get("projection_dim", 512),
        )
        model = CLIPModel(cfg, rngs=nnx.Rngs(0))
    else:
        raise NotImplementedError(f"model_type {model_type}")
    tensors = read_hf_checkpoint(path)
    converter = getattr(type(model), "hf_tensor_converter", None)
    if converter is not None:
        tensors = converter(tensors)
    missed = load_hf_state_dict(model, tensors)
    return model, missed


# ---------------------------------------------------------------------------
# perplexity evaluation (reference hf.py:81-140)
# ---------------------------------------------------------------------------


def do_forward_on(
    model,
    input_ids: np.ndarray,
    max_length: Optional[int] = None,
    stride: Optional[int] = None,
    batch: int = 1,
    forward_fn=None,
) -> Dict[str, float]:
    """Strided sliding-window NLL over a token stream; ppl = exp(sum nll / N)
    (reference hf.py:97-140)."""
    ids = np.asarray(input_ids).reshape(-1)
    max_length = max_length or 1024
    stride = stride or max_length
    if forward_fn is None:
        graphdef, state = nnx.split(model)

        def forward_fn(window):
            return nnx.merge(graphdef, state)(window)

        forward_fn = jax.jit(forward_fn)

    seq_len = len(ids)
    nll_sum = 0.0
    n_tokens = 0
    prev_end = 0
    for begin in range(0, seq_len, stride):
        end = min(begin + max_length, seq_len)
        trg_len = end - prev_end
        window = ids[begin:end]
        if len(window) < 2:
            break
        pad = max_length - len(window)
        w = np.pad(window, (0, pad)) if pad else window
        logits = np.asarray(forward_fn(jnp.asarray(w[None], jnp.int32)))[0]
        logits = logits[: len(window)]
        logp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
        tgt = jnp.asarray(window[1:])
        token_nll = -jnp.take_along_axis(logp[:-1], tgt[:, None], axis=-1)[:, 0]
        # only the last trg_len tokens of the window are scored
        token_nll = token_nll[-(trg_len if prev_end else len(window) - 1):]
        nll_sum += float(jnp.sum(token_nll))
        n_tokens += int(token_nll.shape[0])
        prev_end = end
        if end == seq_len:
            break
    nll = nll_sum / max(n_tokens, 1)
    return {"loss": nll, "perplexity": math.exp(nll)}


# ---------------------------------------------------------------------------
# task evaluation beyond perplexity (reference hf.py:143-217)
# ---------------------------------------------------------------------------


def _normalize_answer(s: str) -> str:
    """SQuAD answer normalization: lowercase, strip punctuation/articles/
    extra whitespace (the convention behind HF's question-answering
    evaluator metrics)."""
    import re
    import string

    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def squad_em_f1(prediction: str, references: List[str]) -> Dict[str, float]:
    """Exact-match and token-F1 of one prediction against reference answers."""
    pred = _normalize_answer(prediction)
    em, f1 = 0.0, 0.0
    for ref in references:
        gold = _normalize_answer(ref)
        em = max(em, float(pred == gold))
        p_toks, g_toks = pred.split(), gold.split()
        if not p_toks or not g_toks:
            f1 = max(f1, float(p_toks == g_toks))
            continue
        common: Dict[str, int] = {}
        for t in p_toks:
            common[t] = common.get(t, 0) + 1
        overlap = sum(min(common.get(t, 0), g_toks.count(t)) for t in set(g_toks))
        if overlap == 0:
            continue
        prec = overlap / len(p_toks)
        rec = overlap / len(g_toks)
        f1 = max(f1, 2 * prec * rec / (prec + rec))
    return {"exact_match": em, "f1": f1}


def eval_question_answering(
    pipe: "Pipeline",
    examples: List[Dict[str, Any]],
    max_new_tokens: int = 24,
    prompt_template: str = "Context: {context}\nQuestion: {question}\nAnswer:",
) -> Dict[str, float]:
    """Generative QA evaluation (reference eval_question_answering,
    hf.py:143-161 — re-designed for zero egress: the reference delegates to
    HF ``evaluator("question-answering")``, this build generates the answer
    with the quantized model and scores SQuAD exact-match/F1 locally).

    ``examples``: dicts with "context", "question", "answers" (list[str]).
    """
    assert pipe.tokenizer is not None, "QA evaluation needs a tokenizer"
    em_sum = f1_sum = 0.0
    for ex in examples:
        prompt = prompt_template.format(**ex)
        ids = pipe.tokenizer(prompt, return_tensors="np").input_ids
        out = np.asarray(pipe.generate(ids, max_new_tokens=max_new_tokens))
        answer = pipe.tokenizer.decode(out[0, ids.shape[1]:])
        answer = answer.split("\n")[0]
        scores = squad_em_f1(answer, ex["answers"])
        em_sum += scores["exact_match"]
        f1_sum += scores["f1"]
    n = max(len(examples), 1)
    return {"exact_match": em_sum / n, "f1": f1_sum / n, "n": float(n)}


def eval_text_generation(
    pipe: "Pipeline",
    metric: str,
    references: Optional[List[str]] = None,
    dataset_ids: Optional[np.ndarray] = None,
    **kwargs,
) -> Dict[str, float]:
    """Metric-driven text-generation evaluation (reference
    eval_text_generation, hf.py:164-185).  "perplexity"/"dmx_perplexity"
    (and the reference's hub id "d-matrix/dmx_perplexity") compute locally;
    any other name goes through ``evaluate.load`` when the optional
    ``evaluate`` package is importable, mirroring the reference's metric
    dispatch."""
    if metric in ("perplexity", "dmx_perplexity", "d-matrix/dmx_perplexity"):
        if dataset_ids is None:
            assert references is not None and pipe.tokenizer is not None
            text = "\n\n".join(references)
            dataset_ids = pipe.tokenizer(text, return_tensors="np").input_ids
        return pipe.do_forward_on(dataset_ids, **kwargs)
    if metric in METRIC_REGISTRY:
        return METRIC_REGISTRY[metric](
            pipe, references=references, dataset_ids=dataset_ids, **kwargs
        )
    try:
        import evaluate  # optional; absent in zero-egress environments
    except ImportError as e:
        raise NotImplementedError(
            f"metric {metric!r} needs the optional `evaluate` package "
            f"(or register_metric({metric!r}, fn))"
        ) from e
    m = evaluate.load(metric, module_type="metric")
    return m.compute(model=pipe.raw_model, references=references, **kwargs)


# ---------------------------------------------------------------------------
# pluggable metric / task registries (the reference reaches arbitrary
# metrics through evaluate.load / evaluator(task), hf.py:143-217; this
# build additionally takes local callables so the same API shape works in
# zero-egress environments where the `evaluate` package is unavailable)
# ---------------------------------------------------------------------------

METRIC_REGISTRY: Dict[str, Any] = {}
TASK_REGISTRY: Dict[str, Any] = {}


def register_metric(name: str, fn=None):
    """Register ``fn(pipe, references=..., dataset_ids=..., **kw) -> dict``
    under a metric name for ``eval_text_generation`` /
    ``Pipeline.evaluate_task("text-generation", metric=name)``.  Usable as
    a decorator (``@register_metric("my-metric")``) or directly."""
    if fn is None:
        return lambda f: register_metric(name, f)
    METRIC_REGISTRY[name] = fn
    return fn


def register_task(name: str, fn=None):
    """Register ``fn(pipe, **kw) -> dict`` as an evaluation task for
    ``Pipeline.evaluate_task(name, ...)`` (the analogue of HF
    ``evaluator(task)`` in the reference's pipe_eval)."""
    if fn is None:
        return lambda f: register_task(name, f)
    TASK_REGISTRY[name] = fn
    return fn


def pipe_eval(pipe: "Pipeline", task: str, **kwargs) -> Dict[str, float]:
    """Task-dispatching evaluation entry (reference pipe_eval,
    hf.py:188-217).  Built-in tasks plus anything in TASK_REGISTRY."""
    mapping = {
        "text-generation": eval_text_generation,
        "question-answering": eval_question_answering,
        **TASK_REGISTRY,
    }
    if task not in mapping:
        raise ValueError(f"Unsupported task type '{task}'.")
    return mapping[task](pipe, **kwargs)


# ---------------------------------------------------------------------------
# pipeline (reference hf.py:314-361)
# ---------------------------------------------------------------------------


class Pipeline:
    """Task pipeline over a Dmx-transformed zoo model.

    ``dmx_config`` in {"BASELINE", "BASIC", "FP8"} or a yaml path applies the
    named rule set at construction (reference dmx_transform, hf.py:31-41).
    """

    def __init__(
        self,
        task: str,
        model_path: str,
        dmx_config: Optional[str] = None,
        tokenizer=None,
        dtype=jnp.float32,
    ):
        self.task = task
        self.model_path = model_path
        raw, self.missed_keys = model_from_checkpoint(model_path, dtype=dtype)
        self.raw_model = raw
        self.model = DmxModel.from_raw(raw)
        self.tokenizer = tokenizer
        if tokenizer is None:
            try:
                from transformers import AutoTokenizer

                self.tokenizer = AutoTokenizer.from_pretrained(model_path)
            except Exception:
                self.tokenizer = None
        if dmx_config is not None:
            self.configure_by_name(dmx_config)

    def configure_by_name(self, name: str) -> None:
        """Resolve ``dmx_config`` like the reference's hub-named fetch
        (reference hf.py:19-41 pulls ``configs/<name>.yaml`` from the HF
        hub): built-in rule-set names, then an explicit path, then
        ``configs/<name>.yaml`` next to a local checkpoint, then
        ``DMX_CONFIG_PATH`` (colon-separated dirs), then — network
        permitting — the hub download itself."""
        from .. import config_rules

        if name.upper() in ("BASELINE", "BASIC", "FP8"):
            self.model.configure(None, *getattr(config_rules, name.upper()))
            return
        candidates = [name]
        base = name if name.endswith((".yaml", ".yml")) else f"{name}.yaml"
        if os.path.isdir(self.model_path):
            candidates.append(os.path.join(self.model_path, "configs", base))
        for d in os.environ.get("DMX_CONFIG_PATH", "").split(":"):
            if d:
                candidates.append(os.path.join(d, base))
        for c in candidates:
            if os.path.exists(c):
                self.model.configure(DmxConfig.from_yaml(c))
                return
        try:  # hub fetch; zero-egress environments fall through cleanly
            from huggingface_hub import hf_hub_download

            p = hf_hub_download(
                repo_id=self.model_path, filename=f"configs/{base}"
            )
            self.model.configure(DmxConfig.from_yaml(p))
            return
        except Exception:
            pass
        raise ValueError(
            f"unknown dmx_config {name} (searched: {candidates}, hub)"
        )

    def evaluate(
        self,
        metric: str = "perplexity",
        dataset_ids: Optional[np.ndarray] = None,
        dataset: Optional[str] = None,
        column: Optional[str] = None,
        max_length: Optional[int] = None,
    ) -> Dict[str, float]:
        """Perplexity over pre-tokenized ids, or over a datasets split when
        tokenizer + datasets are available (reference hf.py:188-217)."""
        if dataset_ids is None:
            assert self.tokenizer is not None, "need tokenizer or dataset_ids"
            import datasets as hfds

            col = column or column_mapping.get(dataset, "text")
            ds = hfds.load_dataset(dataset, split="test")
            text = "\n\n".join(ds[col])
            dataset_ids = self.tokenizer(text, return_tensors="np").input_ids
        max_length = max_length or getattr(
            self.raw_model.config, "max_position_embeddings", 1024
        )
        return self.do_forward_on(dataset_ids, max_length=max_length)

    def do_forward_on(self, input_ids, **kwargs):
        return do_forward_on(self.raw_model, input_ids, **kwargs)

    def evaluate_task(self, task: str, **kwargs) -> Dict[str, float]:
        """Task evaluation beyond perplexity (reference pipe_eval /
        evaluator wiring, hf.py:143-217): "question-answering" scores
        generative answers with SQuAD EM/F1; "text-generation" dispatches
        on the metric name."""
        return pipe_eval(self, task, **kwargs)

    def generate(
        self,
        input_ids,
        max_new_tokens: int = 16,
        quantized_cache: bool = False,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        seed: int = 0,
    ):
        """Generation: prefill + device-side lax.scan decode loop (one host
        dispatch total — essential on tunneled TPUs).  ``temperature == 0``
        is greedy; otherwise softmax sampling, optionally truncated to the
        ``top_k`` highest-probability tokens."""
        ids = jnp.asarray(input_ids, jnp.int32)
        B, T = ids.shape
        caches = self.raw_model.init_cache(
            B, T + max_new_tokens, quantized=quantized_cache
        )
        graphdef, state = nnx.split((self.raw_model, caches))

        def pick(logits, key):
            if temperature <= 0.0:
                return jnp.argmax(logits, axis=-1)
            lg = logits.astype(jnp.float32) / temperature
            if top_k is not None:
                kth = jnp.sort(lg, axis=-1)[:, -top_k][:, None]
                lg = jnp.where(lg < kth, -jnp.inf, lg)
            return jax.random.categorical(key, lg, axis=-1)

        @jax.jit
        def run(state, ids, key):
            mod, cs = nnx.merge(graphdef, state)
            logits = mod(ids, caches=cs, position_offset=0)
            _, state = nnx.split((mod, cs))
            key, sub = jax.random.split(key)
            tok = pick(logits[:, -1], sub)

            def body(carry, i):
                state, tok, key = carry
                mod, cs = nnx.merge(graphdef, state)
                lg = mod(tok[:, None], caches=cs, position_offset=T + i)
                _, s2 = nnx.split((mod, cs))
                key, sub = jax.random.split(key)
                nxt = pick(lg[:, -1], sub)
                return (s2, nxt, key), tok

            (state, tok, key), toks = jax.lax.scan(
                body, (state, tok, key), jnp.arange(max_new_tokens - 1)
            )
            return jnp.concatenate([toks.T, tok[:, None]], axis=1)

        gen = run(state, ids, jax.random.key(seed))
        return jnp.concatenate([ids, gen], axis=1)

    def generate_seq2seq(
        self,
        encoder_input,
        decoder_start_ids=None,
        max_new_tokens: int = 16,
        eos_token_id: Optional[int] = None,
    ):
        """Seq2seq generation for encoder-decoder zoo models (T5, Whisper):
        encode once, device-side scan decode (delegates to the model's own
        generate; reference pipeline task surface for text2text /
        automatic-speech-recognition)."""
        gen = getattr(self.raw_model, "generate", None)
        assert gen is not None and hasattr(self.raw_model, "encode"), (
            "generate_seq2seq requires an encoder-decoder zoo model"
        )
        if decoder_start_ids is None:
            B = np.asarray(encoder_input).shape[0]
            decoder_start_ids = np.zeros((B, 1), np.int32)
        return gen(
            encoder_input,
            decoder_start_ids,
            max_new_tokens=max_new_tokens,
            eos_token_id=eos_token_id,
        )

    def generate_batch(
        self,
        prompts: List[np.ndarray],
        pad_id: int = 0,
        **kwargs,
    ):
        """Batch ragged prompts: left-pad to a common length (so the last
        prompt token sits at the shared prefill boundary) and generate;
        returns the [B, T_max + max_new_tokens] ids and the per-row prompt
        lengths."""
        lens = [int(np.asarray(p).reshape(-1).shape[0]) for p in prompts]
        T = max(lens)
        batch = np.full((len(prompts), T), pad_id, np.int32)
        for i, p in enumerate(prompts):
            arr = np.asarray(p, np.int32).reshape(-1)
            batch[i, T - arr.shape[0]:] = arr
        return self.generate(jnp.asarray(batch), **kwargs), lens

    def __call__(self, text_or_ids, **kwargs):
        if isinstance(text_or_ids, str):
            assert self.tokenizer is not None
            ids = self.tokenizer(text_or_ids, return_tensors="np").input_ids
            out = self.generate(ids, **kwargs)
            return self.tokenizer.batch_decode(np.asarray(out))
        return self.generate(text_or_ids, **kwargs)


def pipeline(task: str, model: str, dmx_config: Optional[str] = None, **kwargs):
    """Factory mirroring the reference's ``pipeline()`` (hf.py:314-361)."""
    return Pipeline(task, model, dmx_config=dmx_config, **kwargs)
