"""Model-level API: DmxModel, DmxConfig, DmxConfigRule.

TPU-native re-design of the reference model API
(reference: src/dmx/compressor/modeling/model.py).  ``DmxModel.from_raw``
substitutes a raw nnx model's sub-modules with Dmx-aware ones (the JAX
analogue of the reference's trace-on-first-forward: substitution here is
static and immediate since module structure is explicit, and jit re-traces
per input signature automatically — the role `_gms` plays in the reference).

Config state is applied through a queue so that configs survive
re-transformations, matching the reference's ``_dmx_configuration_queue``
semantics (model.py:587-634).
"""

from __future__ import annotations

import re
from types import SimpleNamespace
from typing import Callable, Dict, Iterator, List, Optional, Tuple, Union

import jax
from flax import nnx

from ..nn.core import DmxModule, DmxModuleConfig
from ..transform.substitute import named_dmx_modules, substitute_transform
from ..utils import io as uio


class DmxConfig(dict):
    """{module_name -> DmxModuleConfig}; yaml round-trip
    (reference model.py:668-718)."""

    @classmethod
    def from_model(cls, model, freeze: bool = False) -> "DmxConfig":
        return cls({n: m.dmx_config(freeze) for n, m in named_dmx_modules(model)})

    @classmethod
    def from_yaml(cls, fname: str) -> "DmxConfig":
        return cls(uio.load_config_file(fname))

    def to_yaml(self, fname: str) -> None:
        uio.save_config_file({k: dict(v) for k, v in self.items()}, fname)

    @property
    def module_names(self):
        return self.keys()


class DmxConfigRule(SimpleNamespace):
    """Rule: (module_types, name_re) -> module_config
    (reference model.py:721-792)."""

    def __init__(
        self,
        module_types=(),
        name_re: str = "",
        module_config: Optional[Dict] = None,
    ) -> None:
        assert all(issubclass(mt, DmxModule) for mt in module_types)
        self.module_types = tuple(module_types)
        self.name_rule = re.compile(name_re)
        self.module_config = DmxModuleConfig(module_config or {})

    def names_in(self, model_or_config) -> List[str]:
        config = (
            model_or_config
            if isinstance(model_or_config, DmxConfig)
            else DmxConfig.from_model(model_or_config, freeze=True)
        )
        return [
            n
            for n in config.module_names
            if any(
                issubclass(config[n]["instance_of"], mt) for mt in self.module_types
            )
            and self.name_rule.match(n)
        ]

    def apply_to(self, model_or_config) -> None:
        targets = set(self.names_in(model_or_config))
        if isinstance(model_or_config, DmxConfig):
            for n in targets:
                model_or_config[n].update(self.module_config)
        else:
            for n, m in named_dmx_modules(model_or_config):
                if n in targets and isinstance(m, self.module_types):
                    m.configure(self.module_config)


# alias for backward compatibility, to be deprecated (reference model.py:796)
DmxTransformation = DmxConfigRule


class DmxModel:
    """Wrapper turning a raw nnx model into a configurable Dmx model
    (reference DmxModel / DmxModelMixin, model.py:40-665)."""

    def __init__(self, module: nnx.Module):
        self._module = module
        self._dmx_configuration_queue: List[Tuple] = []
        self._jit_cache: Dict = {}

    # ------------------------------------------------------------- factory

    @classmethod
    def from_raw(
        cls,
        model: nnx.Module,
        *rules,
        additional_mappings=None,
        filter_fn=None,
    ) -> "DmxModel":
        """Substitute + wrap (the analogue of DmxModel.from_torch,
        reference model.py:574-645)."""
        module = substitute_transform(
            model, additional_mappings=additional_mappings, filter_fn=filter_fn
        )
        dm = cls(module)
        if rules:
            dm.configure(None, *rules)
        return dm

    from_nnx = from_raw  # convenience alias

    @staticmethod
    def from_function(fn, example_args, rules=None):
        """Fake-quantize an arbitrary (un-authored) jax function by jaxpr
        interception — the functional analogue of ``from_raw`` for code
        that cannot be rewritten against the module zoo (the reference
        removes the same authorship requirement with fx tracing,
        fx/tracer.py:27-173).  Returns a
        :class:`~dmx_compressor_tpu.transform.intercept.QuantizedFunction`
        whose ``sites`` list addresses every intercepted primitive and
        whose ``configure({site: SiteRule})`` plays the role of config
        rules."""
        from ..transform.intercept import QuantizedFunction

        return QuantizedFunction(fn, example_args, rules)

    # --------------------------------------------------------- delegation

    @property
    def module(self) -> nnx.Module:
        return self._module

    def __call__(self, *args, **kwargs):
        return self._module(*args, **kwargs)

    def __getattr__(self, name):
        # delegate unknown attributes to the wrapped module
        return getattr(self._module, name)

    # ------------------------------------------------------------- config

    def named_dmx_modules(self) -> Iterator[Tuple[str, DmxModule]]:
        return named_dmx_modules(self._module)

    @property
    def dmx_module_dict(self) -> Dict[str, DmxModule]:
        return dict(self.named_dmx_modules())

    def get_submodule(self, name: str) -> DmxModule:
        return self.dmx_module_dict[name]

    @property
    def op_set(self):
        return {type(m).__name__ for _, m in self.named_dmx_modules()}

    def configure(
        self,
        config: Optional[Union[str, DmxConfig]],
        *rules: DmxConfigRule,
    ) -> "DmxModel":
        """Apply a DmxConfig (by name->module_config) and/or rules
        (reference model.py:49-80)."""
        self._dmx_configuration_queue.append((config, rules))
        self._apply_configuration(config, rules)
        self._jit_cache.clear()  # config changes invalidate traces
        return self

    transform = configure

    def _apply_configuration(self, config, rules) -> None:
        if config is not None:
            if isinstance(config, str):
                config = DmxConfig.from_yaml(config)
            mods = self.dmx_module_dict
            for n, mc in config.items():
                if n in mods:
                    mods[n].configure(mc)
        for rule in rules:
            rule.apply_to(self._module)

    def replay_configuration(self) -> None:
        """Re-apply all queued configurations (used after re-substitution,
        mirroring reference model.py:632-634)."""
        for config, rules in self._dmx_configuration_queue:
            self._apply_configuration(config, rules)

    # ------------------------------------------------------- freeze / thaw

    @property
    def dmx_config(self) -> DmxConfig:
        return DmxConfig.from_model(self._module)

    def freeze(self, fname: str) -> None:
        """Persist the full config to yaml (reference model.py:116-124)."""
        DmxConfig.from_model(self._module, freeze=True).to_yaml(fname)

    def thaw(self, fname: str) -> "DmxModel":
        """Restore a frozen config (reference model.py:126-132)."""
        return self.configure(fname)

    # -------------------------------------------------------------- modes

    def to_baseline_mode(self) -> "DmxModel":
        from .. import config_rules

        return self.configure(None, *config_rules.BASELINE)

    def to_basic_mode(self, sbfp_weight_storage: bool = False) -> "DmxModel":
        from .. import config_rules

        self.configure(None, *config_rules.BASIC)
        if sbfp_weight_storage:
            self.configure(None, *config_rules.SBFP_WEIGHT_STORAGE)
        return self

    def to_fp8_mode(self) -> "DmxModel":
        from .. import config_rules

        return self.configure(None, *config_rules.FP8)

    # ----------------------------------------------------------- fold/save

    def fold_weights_and_biases(self) -> None:
        for _, m in self.named_dmx_modules():
            m.fold_weight_and_bias()

    def save_specific_layers_state_dict_and_register_urls(
        self, parent_dir: str, layers: List[str]
    ) -> None:
        """(reference model.py:214-221)"""
        mods = self.dmx_module_dict
        for n in layers:
            mods[n].save_state_dict_and_register_url(parent_dir)

    # ------------------------------------------------------------ compile

    def compiled(self, fn: Optional[Callable] = None):
        """A jitted callable over the current (static) configuration.

        nnx.jit treats Python config attributes as static graphdef: any
        reconfiguration produces a new graphdef and re-traces — the JAX
        analogue of the reference's retransform-on-signature-change.
        """
        target = fn if fn is not None else self._module
        key = id(target)
        if key not in self._jit_cache:
            self._jit_cache[key] = nnx.jit(target)
        return self._jit_cache[key]

    def visualize_graph(self, file_name=None):
        """Graphviz dot rendering of the Q/DQ graphs (reference
        model.py:647-658)."""
        from ..transform.visualize import visualize_graph

        return visualize_graph(self, file_name)

    def make_compiler_graphs(self):
        """Q/DQ-annotated export graphs per module (reference
        model.py:660-665); see transform/qdq.py."""
        from ..transform.qdq import make_compiler_graph

        return make_compiler_graph(self._module)

    # -------------------------------------------------------- monitoring

    def counting_flops(self, zero: bool = True):
        """Context manager enabling FLOP counting on every DmxModule
        (reference model.py:207-212)."""
        from contextlib import ExitStack, contextmanager

        @contextmanager
        def _cm():
            with ExitStack() as stack:
                for _, m in self.named_dmx_modules():
                    stack.enter_context(m.counting_flops(zero))
                yield self

        return _cm()

    @property
    def flops(self):
        return sum(
            m.flops or 0 for _, m in self.named_dmx_modules() if m.flop_counter
        )

    def monitoring(self, submodules: Optional[List[str]] = None):
        from ..utils.monitor import Monitoring

        return Monitoring(self, submodules)

    def measure_runtimes(self, submodules: Optional[List[str]] = None):
        from ..utils.monitor import RuntimeMeasurement

        return RuntimeMeasurement(self, submodules)


class DmxPipelineMixin:
    """Pipeline-level configure/freeze helpers (reference model.py:799-860)."""

    def configure(self, config, *rules):
        self.model.configure(config, *rules)
        return self

    def freeze(self, fname):
        self.model.freeze(fname)

    def thaw(self, fname):
        self.model.thaw(fname)
        return self


class DmxSimplePipeline(DmxPipelineMixin):
    """preproc -> model(s) -> postproc (reference model.py:863-890)."""

    def __init__(self, preprocessor=None, model=None, postprocessor=None):
        self.preprocessor = preprocessor
        self.model = model
        self.postprocessor = postprocessor

    def __call__(self, x):
        if self.preprocessor is not None:
            x = self.preprocessor(x)
        x = self.model(x)
        if self.postprocessor is not None:
            x = self.postprocessor(x)
        return x


# legacy alias (reference model.py:893-907)
Model = DmxSimplePipeline
