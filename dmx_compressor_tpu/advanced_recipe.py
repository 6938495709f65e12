"""Post-training optimization recipes.

TPU-native port of the reference recipe layer
(reference: src/dmx/compressor/advanced_recipe.py).  A recipe is an ExitStack
of per-module context managers produced by a hyperparameter generator; the
user runs calibration batches through the model inside the ``applied_to``
context and the per-module state machines do the rest.
"""

from __future__ import annotations

from contextlib import ExitStack, contextmanager
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

from .numerics.observer import HistogramObserver, MinMaxObserver


# ---------------------------------------------------------------------------
# hyperparameter dataclasses (reference advanced_recipe.py:42-112)
# ---------------------------------------------------------------------------


@dataclass
class DmxModuleQuantizerCalibrationHyperparams:
    """Per-cast calibration settings keyed like the cast dicts."""

    inputs: Optional[Dict[str, "CastCalibrationHyperparams"]] = None
    outputs: Optional[Dict[str, "CastCalibrationHyperparams"]] = None
    weight: Optional["CastCalibrationHyperparams"] = None
    weight_storage: Optional["CastCalibrationHyperparams"] = None


@dataclass
class CastCalibrationHyperparams:
    observer_cls: type = HistogramObserver
    qscheme_to_overload: Optional[str] = "per_tensor_affine"
    group_size: Optional[int] = None
    ch_axis: Optional[int] = None


@dataclass
class DmxModuleSmoothQuantHyperparams:
    migration_strength: float = 0.5
    fuse_to_weight: bool = False


@dataclass
class DmxModuleGPTQHyperparams:
    microblock_size: int = 1
    block_size: int = 128
    percdamp: float = 0.01


@dataclass
class DmxModuleApproximationFunctionTuningHyperparams:
    # search_space: list of (param_name, low, high)
    search_space: List[Tuple[str, float, float]] = field(default_factory=list)


@dataclass
class DmxModuleSLaNCHyperparams:
    position: str = "post_attn"  # post_attn | post_mlp | first
    mlp_type: str = "standard"  # standard | llama
    prev_ln_weight: Optional[object] = None
    v_proj: Optional[object] = None
    o_proj: Optional[object] = None
    fc1: Optional[object] = None
    fc2: Optional[object] = None
    gate_proj: Optional[object] = None
    up_proj: Optional[object] = None
    down_proj: Optional[object] = None
    device: Optional[object] = None


# ---------------------------------------------------------------------------
# recipes (reference advanced_recipe.py:14-163)
# ---------------------------------------------------------------------------


class DmxBaseRecipe:
    """ExitStack of per-module context managers from a hyperparam generator
    (reference DmxBaseRecipe.applied_to, advanced_recipe.py:24-39)."""

    context_method: str = ""

    def __init__(self, hyperparam_generator: Callable):
        self.hyperparam_generator = hyperparam_generator

    @contextmanager
    def applied_to(self, model):
        hp_map = self.hyperparam_generator(model)
        with ExitStack() as stack:
            for module, hp in hp_map.items():
                cm = getattr(module, self.context_method)(hp)
                stack.enter_context(cm)
            yield model


class DmxQuantizerCalibrationRecipe(DmxBaseRecipe):
    context_method = "calibrating_quantizers"


class DmxSmoothQuantRecipe(DmxBaseRecipe):
    context_method = "calibrating_smoothquant"


class DmxGPTQRecipe(DmxBaseRecipe):
    context_method = "optimal_brain_compressing"


class DmxApproximationFunctionTuningRecipe(DmxBaseRecipe):
    context_method = "tuning_approximation_function"


class DmxSLaNCRecipe(DmxBaseRecipe):
    context_method = "slanc_tuning"


# ---------------------------------------------------------------------------
# convenience generators
# ---------------------------------------------------------------------------


def input_calibration_for_all_linears(
    observer_cls=HistogramObserver,
    qscheme="per_tensor_affine",
    group_size=None,
) -> Callable:
    """Generator: calibrate every Linear's input cast."""

    def gen(model):
        from .nn import modules as dmxnn
        from .transform.substitute import named_dmx_modules

        mods = {}
        for _, m in named_dmx_modules(
            model.module if hasattr(model, "module") else model
        ):
            if isinstance(m, dmxnn.Linear):
                mods[m] = DmxModuleQuantizerCalibrationHyperparams(
                    inputs={
                        k: CastCalibrationHyperparams(
                            observer_cls=observer_cls,
                            qscheme_to_overload=qscheme,
                            group_size=group_size,
                        )
                        for k in m.input_casts.keys()
                    }
                )
        return mods

    return gen


def smoothquant_for_all_linears(
    migration_strength: float = 0.5, fuse_to_weight: bool = False
) -> Callable:
    def gen(model):
        from .nn import modules as dmxnn
        from .transform.substitute import named_dmx_modules

        return {
            m: DmxModuleSmoothQuantHyperparams(migration_strength, fuse_to_weight)
            for _, m in named_dmx_modules(
                model.module if hasattr(model, "module") else model
            )
            if isinstance(m, dmxnn.Linear)
        }

    return gen


def gptq_for_all_linears(**kw) -> Callable:
    def gen(model):
        from .nn import modules as dmxnn
        from .transform.substitute import named_dmx_modules

        return {
            m: DmxModuleGPTQHyperparams(**kw)
            for _, m in named_dmx_modules(
                model.module if hasattr(model, "module") else model
            )
            if isinstance(m, dmxnn.Linear)
        }

    return gen
