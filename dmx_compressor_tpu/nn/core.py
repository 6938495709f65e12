"""DmxModule: the quantization-aware module base.

TPU-native re-design of the reference DmxModule
(reference: src/dmx/compressor/modeling/nn/core.py).  A DmxModule wraps one
logical op with the full co-design surface:

    smoothquant input scale -> input casts -> (hessian measurement)
    -> (approximation tuning) -> _forward -> output casts -> plugins
    -> flop counting -> caller-dtype realignment           (core.py:215-264)

and a weight pipeline ("weight hypernet", core.py:179-198):

    sparsify -> smoothquant scale -> weight storage cast -> weight cast

Differences from the reference driven by TPU idiom:
- modules are flax nnx Modules; weights are nnx.Param, quantizer state are
  Variable subclasses, config attributes are static Python attrs (changing
  config retraces jitted callables — the analogue of fx retransformation).
- no device alignment: placement is governed by jax.sharding.
- approximation uses value-replacement via stop_gradient blending
  (functional/approximate.py) rather than .data mutation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..functional.approximate import (
    Approximate,
    ApproximationFunction,
    NoApproximation,
    approx_blend,
)
from ..layer_reconstruction import LayerReconstructionMixin
from ..numerics.cast import CastTo, CastToDict
from ..numerics.format import Format, Same
from ..numerics.smoothquant import ActivationWeightSmoothQuant
from ..perf_proxy import PerformanceProxyMixin
from ..plugins import PluginBase, PluginLayerData
from ..sparse import Dense, Sparsify
from ..utils import io as uio
from ..utils.tracing import eager as _eager, try_set

Array = jax.Array


def is_configurable(m) -> bool:
    return isinstance(m, DmxModule)


class DmxModule(
    PerformanceProxyMixin,
    LayerReconstructionMixin,
    nnx.Module,
):
    """Extended nnx.Module with numerics/sparsity/approximation co-design."""

    is_compound: bool = False
    functional_forward = None
    plugins: List[PluginBase] = []
    # inference mode: approximation value-replacement returns the surrogate
    # value directly (identical values; skips the exact op whose only role is
    # carrying gradients) — set via ops.compress.inference_mode()
    inference_mode: bool = False

    # cast topology, overridden per subclass (reference cast.py:413-436)
    ch_axis: Optional[int] = None  # input channel axis
    win_ch_axis: Optional[int] = None  # weight input-channel axis
    wout_ch_axis: Optional[int] = None  # weight output-channel axis
    has_accum: bool = False  # matmul-accumulator cast present
    input_cast_names = ("input_cast",)
    output_cast_names = ("output_cast",)
    has_weight: bool = False
    has_bias: bool = False
    sparsifiable: bool = False  # weight sparsifier attached

    def __init__(self, state_dict_url: Optional[str] = None) -> None:
        self.align_boundary_dtype = True
        self.state_dict_url = state_dict_url
        self.approximator = Approximate()
        self.approximation_error = nnx.data(None)
        self.aft = None
        self.obc = None
        self.init_casts()
        self.init_sparsifier()
        self.init_smoothquant()

    # ------------------------------------------------------------------ init

    def init_casts(self) -> None:
        self.input_casts = CastToDict(
            {
                name: CastTo(ch_axis=self.ch_axis if i == 0 else -1)
                for i, name in enumerate(self.input_cast_names)
            }
        )
        self.output_casts = CastToDict(
            {name: CastTo() for name in self.output_cast_names}
        )
        self.accum_cast = CastTo() if self.has_accum else None
        self.weight_storage_cast = (
            CastTo(ch_axis=self.wout_ch_axis) if self.has_weight else None
        )
        self.weight_cast = CastTo(ch_axis=self.wout_ch_axis) if self.has_weight else None
        self.bias_cast = CastTo() if self.has_bias else None

    def init_sparsifier(self) -> None:
        self.weight_sparsifier = Sparsify() if self.sparsifiable else None

    def init_smoothquant(
        self,
        migration_strength: float = 0.5,
        scale_format: Union[str, Format] = "SAME",
        dynamic: bool = False,
    ) -> None:
        self.smoothquant = (
            ActivationWeightSmoothQuant(
                self.ch_axis,
                self.win_ch_axis,
                migration_strength,
                scale_format,
                dynamic,
            )
            if self.ch_axis is not None and self.win_ch_axis is not None
            else None
        )

    # ----------------------------------------------------------- configure

    def configure(self, config: Dict[str, Any]) -> None:
        """Apply a DmxModuleConfig (reference core.py:65-110).

        Also accepts the legacy singular-key yaml grammar
        (configs/dmx_example_config_lenet5.yaml): ``input_format`` /
        ``output_format`` scalars and ``instance`` labels.
        """
        config = dict(config)
        if "input_format" in config:
            config.setdefault("input_formats", [config.pop("input_format")])
        if "output_format" in config:
            config.setdefault("output_formats", [config.pop("output_format")])
        for k in ("input_formats", "output_formats"):
            if k in config and isinstance(config[k], (list, tuple)):
                config[k] = [
                    Format.from_shorthand(f) if isinstance(f, str) else f
                    for f in config[k]
                ]
        if "input_formats" in config:
            self.input_casts.set_format(config["input_formats"])
        if "pre_input_transform" in config:
            self.input_casts.set_pre_transform(config["pre_input_transform"])
        if "output_formats" in config:
            self.output_casts.set_format(config["output_formats"])
        if "pre_output_transform" in config:
            self.output_casts.set_pre_transform(config["pre_output_transform"])
        if self.accum_cast is not None and "accum_format" in config:
            self.accum_cast.set_format(config["accum_format"])
        if self.weight_storage_cast is not None and "weight_storage_format" in config:
            self.weight_storage_cast.set_format(config["weight_storage_format"])
        if self.weight_cast is not None and "weight_format" in config:
            self.weight_cast.set_format(config["weight_format"])
        if self.weight_cast is not None and "pre_weight_transform" in config:
            self.weight_cast.set_pre_transform(config["pre_weight_transform"])
        if self.bias_cast is not None and "bias_format" in config:
            self.bias_cast.set_format(config["bias_format"])
        if self.smoothquant is not None and "smoothquant_scale_format" in config:
            self.smoothquant.set_scale_format(config["smoothquant_scale_format"])
        if self.weight_sparsifier is not None and "weight_sparseness" in config:
            self.weight_sparsifier.configure(sparseness=config["weight_sparseness"])
        if "approximation_function" in config:
            self.approximator.set_function(config["approximation_function"])
        if (
            "state_dict_url" in config
            and config["state_dict_url"] != self.state_dict_url
        ):
            self.load_state_dict_and_register_url(config["state_dict_url"])

    transform = configure  # NOTE: to be deprecated (reference core.py:112)

    def dmx_config(self, freeze: bool = False) -> "DmxModuleConfig":
        return DmxModuleConfig.from_module(self, freeze)

    # ---------------------------------------------------------- state dicts

    def state_dict(self) -> Dict[str, Any]:
        import numpy as np

        state = nnx.state(self)
        flat = {}
        for path, leaf in nnx.to_flat_state(state):
            flat["/".join(str(p) for p in path)] = np.asarray(leaf.value)
        return flat

    def load_state_dict(self, flat: Dict[str, Any]) -> None:
        state = nnx.state(self)
        updates = []
        for path, leaf in nnx.to_flat_state(state):
            k = "/".join(str(p) for p in path)
            if k in flat:
                leaf = leaf.replace(jnp.asarray(flat[k]))
            updates.append((path, leaf))
        nnx.update(self, nnx.from_flat_state(updates))

    def load_state_dict_and_register_url(self, url: str) -> None:
        import pickle
        from urllib.parse import urlparse
        from urllib.request import url2pathname

        path = url2pathname(urlparse(url).path)
        with open(path, "rb") as f:
            self.load_state_dict(pickle.load(f))
        self.state_dict_url = url

    def save_state_dict_and_register_url(self, parent_dir: str) -> None:
        import os
        import pickle
        import tempfile
        import shutil
        from pathlib import Path

        fd, tmp = tempfile.mkstemp()
        os.close(fd)
        with open(tmp, "wb") as f:
            pickle.dump(self.state_dict(), f)
        md5 = uio.compute_md5(tmp)
        file_name = os.path.join(parent_dir, f"{md5}.pkl")
        shutil.move(tmp, file_name)
        self.state_dict_url = Path(os.path.abspath(file_name)).as_uri()

    # ------------------------------------------------------- weight pipeline

    @property
    def effective_weight(self):
        if self.weight_sparsifier is None:
            return self.weight.value
        return self.weight_sparsifier(self.weight.value)

    def weight_hypernet(self, w: Array) -> Array:
        """sparsify -> smoothquant -> storage cast -> weight cast
        (reference core.py:179-198)."""
        if self.weight_sparsifier is not None:
            w = self.weight_sparsifier(w)
        if self.smoothquant is not None and not self.smoothquant.fused_to_weight:
            w = self.smoothquant.scale_weight(w)
        if self.weight_storage_cast is not None:
            w = self.weight_storage_cast(w)
        if self.weight_cast is not None:
            w = self.weight_cast(w)
        return w

    @property
    def _weight(self) -> Array:
        return self.weight_hypernet(self.weight.value)

    @property
    def _bias(self) -> Optional[Array]:
        if getattr(self, "bias", None) is None:
            return None
        return self.bias_cast(self.bias.value) if self.bias_cast is not None else None

    def fold_weight_and_bias(self) -> None:
        """Bake all weight/bias transforms into the parameters
        (reference core.py:146-176)."""
        if self.bias_cast is not None and not isinstance(self.bias_format, Same):
            self.bias.value = self.bias_cast(self.bias.value)
            self.bias_cast = CastTo(format=Same())
        if self.weight_sparsifier is not None and not isinstance(
            self.weight_sparseness, Dense
        ):
            self.weight.value = self.effective_weight
            self.weight_sparsifier = Sparsify(sparseness=Dense())
        if self.smoothquant is not None and not self.smoothquant.fused_to_weight:
            self.weight.value = self.smoothquant.fuse_to_weight(self.weight.value)
        if self.weight_storage_cast is not None and not isinstance(
            self.weight_storage_cast.format, Same
        ):
            self.weight.value = self.weight_storage_cast(self.weight.value)
            self.weight_storage_cast = CastTo(format=Same())
        if self.weight_cast is not None and not isinstance(self.weight_cast.format, Same):
            self.weight.value = self.weight_cast(self.weight.value)
            self.weight_cast = CastTo(format=Same())

    # ----------------------------------------------------------- forward

    def _forward(self, *args, **kwargs):
        raise NotImplementedError

    def approximator_wrapper(self, inputs, approx_args, approx_kwargs, **wrapper_kwargs):
        """Hook for input pre-processing before the SIMD surrogate
        (reference approximate.py:288-298); overridden by e.g. Softmax."""
        return self.approximator(*inputs, *approx_args, **approx_kwargs)

    def approx_forward(self, inputs: tuple, *args, **kwargs):
        """Exact forward with value-replacement by the approximation
        (reference approximate.py:300-327)."""
        fn = self.approximator.function
        if DmxModule.inference_mode and not isinstance(fn, NoApproximation):
            # blend(exact, approx) == approx in value; the exact op only
            # matters for gradients, which inference does not need
            return self.approximator_wrapper(inputs, args, kwargs, **fn.wrapper_params)
        if self.functional_forward is not None:
            exact = self.functional_forward(*inputs, *args, **kwargs)
        else:
            exact = self._raw_forward(*inputs, *args, **kwargs)
        if not isinstance(fn, NoApproximation):
            approx = self.approximator_wrapper(inputs, args, kwargs, **fn.wrapper_params)
            if isinstance(approx, tuple):
                try_set(self, "approximation_error",
                        [jax.lax.stop_gradient(a - e) for a, e in zip(approx, exact)])
            else:
                try_set(self, "approximation_error",
                        jax.lax.stop_gradient(approx - exact))
            exact = approx_blend(exact, approx)
        return exact

    @property
    def approximation_function(self) -> ApproximationFunction:
        return self.approximator.function

    def __call__(self, input: Array, *args, **kwargs):
        """Universal forward pipeline (reference core.py:215-264)."""
        _dtype = jnp.asarray(input).dtype
        if self.smoothquant is not None:
            if self.smoothquant.dynamic or self.smoothquant.calibrating:
                self.update_smoothquant_scale(input)
            input_scaled = self.smoothquant.scale_input(input)
        else:
            input_scaled = input
        _input, args2, kwargs2 = self.input_casts(input_scaled, *args, **kwargs)
        if self.obc is not None:
            self.obc.measure_hessian(_input)
        if self.aft is not None:
            self.aft.optimize(_input, *args2, **kwargs2)
        _output = self._forward(_input, *args2, **kwargs2)
        output = self.output_casts(_output, output=True)

        if DmxModule.plugins:
            data = PluginLayerData(
                input_before_cast=input,
                input_after_cast=_input,
                output_before_cast=_output,
                output_after_cast=output,
                mod=self,
                args=args2,
                kwargs=kwargs2,
            )
            plugins_copy = list(DmxModule.plugins)
            for p in plugins_copy:
                DmxModule.plugins = [q for q in plugins_copy if q is not p]
                p.process_layer(data)
                DmxModule.plugins = list(plugins_copy)

        if self.flop_counter_enabled and _eager():
            out0 = output[0] if isinstance(output, (tuple, list)) else output
            self.count_flops(input, out0)
        if self.align_boundary_dtype:
            output = (
                type(output)(a.astype(_dtype) for a in output)
                if isinstance(output, (tuple, list))
                else output.astype(_dtype)
            )
        return output

    # --------------------------------------------------------- format views

    def check_format_dim_consistency(self) -> bool:
        """Blocked formats must block along the module's channel axes
        (reference cast.py:487-537)."""

        def ok(cast: Optional[CastTo], axis) -> bool:
            return (
                cast is None
                or not cast.format.blocked
                or axis is None
                or cast.block_dim == axis
            )

        good = ok(self.input_casts[self.input_cast_names[0]], self.ch_axis)
        good = good and ok(self.weight_cast, self.win_ch_axis)
        return good

    @property
    def input_formats(self):
        return {k: cast.format for k, cast in self.input_casts.items()}

    @property
    def output_formats(self):
        return {k: cast.format for k, cast in self.output_casts.items()}

    @property
    def input_precision(self):
        return self.input_casts[self.input_cast_names[0]].get_precision()

    @property
    def weight_precision(self):
        return self.weight_cast.get_precision()

    @property
    def weight_storage_precision(self):
        return self.weight_storage_cast.get_precision()

    @property
    def accum_format(self):
        return self.accum_cast.format if self.accum_cast is not None else None

    @property
    def weight_format(self):
        return self.weight_cast.format if self.weight_cast is not None else None

    @property
    def weight_storage_format(self):
        return (
            self.weight_storage_cast.format
            if self.weight_storage_cast is not None
            else None
        )

    @property
    def bias_format(self):
        return self.bias_cast.format if self.bias_cast is not None else None

    @property
    def weight_sparseness(self):
        return (
            self.weight_sparsifier.sparseness
            if self.weight_sparsifier is not None
            else None
        )

    @property
    def weight_scale(self):
        return self.weight_cast.scale.value

    @property
    def weight_zero_point(self):
        return self.weight_cast.zero_point.value

    @property
    def weight_storage_scale(self):
        return self.weight_storage_cast.scale.value

    @property
    def weight_storage_zero_point(self):
        return self.weight_storage_cast.zero_point.value

    # -------------------------------------------------------------- export

    def to_compiler_graph(self):
        """Q/DQ-annotated op graph for the downstream compiler
        (reference core.py:428-571); see transform/qdq.py."""
        from ..transform.qdq import module_compiler_graph

        return module_compiler_graph(self)


class DmxModuleConfig(dict):
    """Dict of a DmxModule's configurable surface (reference core.py:368-425)."""

    @classmethod
    def from_module(cls, module: DmxModule, freeze: bool = False):
        cc = cls(instance_of=module.__class__)
        if isinstance(module, DmxModule):
            if module.input_formats is not None and (
                freeze or not all(isinstance(f, Same) for f in module.input_formats.values())
            ):
                cc["input_formats"] = module.input_formats
            if module.output_formats is not None and (
                freeze or not all(isinstance(f, Same) for f in module.output_formats.values())
            ):
                cc["output_formats"] = module.output_formats
            if module.accum_format is not None and (
                freeze or not isinstance(module.accum_format, Same)
            ):
                cc["accum_format"] = module.accum_format
            if module.weight_format is not None and (
                freeze or not isinstance(module.weight_format, Same)
            ):
                cc["weight_format"] = module.weight_format
            if module.weight_storage_format is not None and (
                freeze or not isinstance(module.weight_storage_format, Same)
            ):
                cc["weight_storage_format"] = module.weight_storage_format
            if module.bias_format is not None and (
                freeze or not isinstance(module.bias_format, Same)
            ):
                cc["bias_format"] = module.bias_format
            if module.smoothquant is not None and (
                freeze or not isinstance(module.smoothquant.scale_cast.format, Same)
            ):
                cc["smoothquant_scale_format"] = module.smoothquant.scale_cast.format
            if module.weight_sparseness is not None and (
                freeze or not isinstance(module.weight_sparseness, Dense)
            ):
                cc["weight_sparseness"] = module.weight_sparseness
            if freeze or not isinstance(module.approximation_function, NoApproximation):
                cc["approximation_function"] = module.approximation_function
            if module.state_dict_url is not None:
                cc["state_dict_url"] = module.state_dict_url
        return cc
