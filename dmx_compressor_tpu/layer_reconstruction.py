"""Layer reconstruction: post-training per-module optimization machinery.

TPU-native re-design of the reference layer-reconstruction subsystem
(reference: src/dmx/compressor/layer_reconstruction.py).  Provides the
per-module enable/disable plumbing and context managers for:

- quantizer (observer) calibration
- static SmoothQuant calibration (with optional fuse-to-weight)
- Optimal Brain Compression / GPTQ (Hessian accumulation + blocked
  Cholesky-inverse update, arXiv:2208.11580)
- approximation-function tuning (derivative-free search over extra_params,
  replacing the reference's scikit-optimize gp_minimize dependency)
- SLaNC norm-scale calibration (analytic, arXiv:2410.10553)
"""

from __future__ import annotations

import math
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .functional.approximate import NoApproximation
from .numerics.observer import HistogramObserver


class LayerReconstructionMixin:
    """Mixed into DmxModule (reference layer_reconstruction.py:14-202)."""

    def update_smoothquant_scale(self, input):
        if self.smoothquant is not None:
            self.smoothquant.observe(input, self.effective_weight)

    # ---------------------------------------------------------- calibration

    def enable_quantizer_calib(self, state: bool, hyperparams) -> None:
        if hyperparams.inputs is not None:
            for _k in self.input_casts.keys():
                self.input_casts[_k].enable_calibration(
                    state, **vars(hyperparams.inputs[_k])
                )
        if hyperparams.outputs is not None:
            for _k in self.output_casts.keys():
                self.output_casts[_k].enable_calibration(
                    state, **vars(hyperparams.outputs[_k])
                )
        if getattr(self, "weight", None) is not None:
            if hyperparams.weight is not None:
                self.weight_cast.enable_calibration(state, **vars(hyperparams.weight))
                if not state:
                    # weights are static: observe once at calibration end
                    pass
            if hyperparams.weight_storage is not None:
                self.weight_storage_cast.enable_calibration(
                    state, **vars(hyperparams.weight_storage)
                )

    def enable_smoothquant_calib(self, state: bool, hyperparams) -> None:
        if self.smoothquant is not None:
            if self.smoothquant.fused_to_weight:
                raise RuntimeError(
                    "calibrating a SmoothQuant whose scale was already folded "
                    "into the weight would double-apply the migration"
                )
            self.smoothquant.set_migration_strength(hyperparams.migration_strength)
            # dynamic mode recomputes maxabs per batch; the calibration pass
            # only makes sense for the static variant
            self.smoothquant.set_dynamic(False)
            self.smoothquant.enable(not state)
            self.smoothquant.calibrating = state
            if not state and hyperparams.fuse_to_weight:
                self.weight.value = self.smoothquant.fuse_to_weight(self.weight.value)

    def enable_optimal_brain_compression(self, state: bool, hyperparams) -> None:
        if getattr(self, "weight", None) is None or self.win_ch_axis is None:
            return
        if state:
            self.obc = OptimalBrainCompressor(self)
            self.input_casts.disable_fake_quant()
            self.weight_cast.disable_fake_quant()
        else:
            self.input_casts.enable_fake_quant()
            self.weight_cast.enable_fake_quant()
            self.obc.apply(**vars(hyperparams))
            self.obc = None

    def enable_approximation_function_tuning(self, state: bool, hyperparams) -> None:
        if not isinstance(self.approximation_function, NoApproximation):
            if state:
                self.aft = ApproximationFunctionTuner(self, hyperparams.search_space)
            else:
                self.aft = None

    # ------------------------------------------------------ context managers

    @contextmanager
    def calibrating_quantizers(self, hyperparams):
        self.enable_quantizer_calib(True, hyperparams)
        yield self
        self.enable_quantizer_calib(False, hyperparams)

    @contextmanager
    def calibrating_smoothquant(self, hyperparams):
        self.enable_smoothquant_calib(True, hyperparams)
        yield self
        self.enable_smoothquant_calib(False, hyperparams)

    @contextmanager
    def optimal_brain_compressing(self, hyperparams):
        self.enable_optimal_brain_compression(True, hyperparams)
        yield self
        self.enable_optimal_brain_compression(False, hyperparams)

    @contextmanager
    def tuning_approximation_function(self, hyperparams):
        self.enable_approximation_function_tuning(True, hyperparams)
        yield self
        self.enable_approximation_function_tuning(False, hyperparams)

    @contextmanager
    def slanc_tuning(self, hyperparams):
        """Analytic SLaNC norm computation from surrounding weights
        (reference layer_reconstruction.py:120-202; arXiv:2410.10553)."""
        from .nn import modules as dmxnn

        applicable = (
            isinstance(self, (dmxnn.LayerNorm, dmxnn.RMSNorm))
            and not isinstance(self.approximation_function, NoApproximation)
            and self.approximation_function.algorithm == "vsimd"
        )
        if applicable:
            norm = compute_slanc_norm(hyperparams)
            # approximator functions may be shared across modules; fork ours
            import copy

            self.approximator.function = copy.deepcopy(self.approximator.function)
            # SLaNC divides the norm input by `norm`; the SIMD kernels multiply
            # by the `norm` parameter, hence the reciprocal.
            self.approximator.function.extra_params.update({"norm": 1.0 / norm})
        yield self


def _get_weight(mod):
    """Weight array of either a Dmx/nnx module, as float32."""
    w = mod.weight
    w = getattr(w, "value", w)
    return jnp.asarray(w, jnp.float32)


def compute_slanc_norm(hp) -> float:
    """SLaNC analytic norms per position (reference
    layer_reconstruction.py:127-201).

    Weight layout convention matches the reference (torch Linear: W is
    [out, in]); callers pass modules whose .weight follows that layout.
    """
    if hp.position == "post_attn":
        prev_ln_weight = _get_weight(hp.prev_ln_weight)
        W_V = _get_weight(hp.v_proj)
        P = _get_weight(hp.o_proj)
        assert P.shape[1] % W_V.shape[0] == 0
        num_kv_heads = P.shape[1] // W_V.shape[0]
        norm = P @ jnp.tile(W_V, (num_kv_heads, 1))
        assert norm.shape[0] == norm.shape[1]
        norm = norm + jnp.eye(norm.shape[0])
        norm = norm * prev_ln_weight
        return float(jnp.linalg.norm(norm))  # Frobenius
    elif hp.position == "post_mlp" and hp.mlp_type == "standard":
        prev_ln_weight = _get_weight(hp.prev_ln_weight)
        A = _get_weight(hp.fc1)
        B = _get_weight(hp.fc2)
        return float(
            jnp.linalg.norm(prev_ln_weight, ord=1)
            * jnp.linalg.norm(A, ord=2)
            * jnp.linalg.norm(B, ord=2)
            / prev_ln_weight.shape[0]
        )
    elif hp.position == "post_mlp" and hp.mlp_type == "llama":
        prev_ln_weight = _get_weight(hp.prev_ln_weight)
        W_gate = _get_weight(hp.gate_proj)
        W_up = _get_weight(hp.up_proj)
        W_down = _get_weight(hp.down_proj)
        return float(
            jnp.linalg.norm(W_down @ (W_up * prev_ln_weight))
            * jnp.linalg.norm(W_gate * prev_ln_weight, ord=2)
        )
    elif hp.position == "first":
        return 1.0
    raise ValueError(f"unknown SLaNC position {hp.position}")


class ApproximationFunctionTuner:
    """Derivative-free tuning of approximation extra_params minimizing the
    approximation-error MSE (reference layer_reconstruction.py:205-230).

    The reference uses scikit-optimize's gp_minimize (20 calls); here a
    low-discrepancy random search with local refinement of the best point,
    same call budget, no external dependency.
    """

    def __init__(self, module, search_space, n_calls: int = 20, seed: int = 0):
        self.module = module
        # search_space: list of (name, low, high)
        self.search_space = [
            (s.name, s.low, s.high) if hasattr(s, "name") else tuple(s)
            for s in search_space
        ]
        self.n_calls = n_calls
        self.rng = np.random.default_rng(seed)

    def optimize(self, input, *args, **kwargs):
        import copy

        self.module.approximator.function = copy.deepcopy(
            self.module.approximator.function
        )
        module_aft = self.module.aft
        self.module.aft = None  # avoid recursion through forward

        def objective(params: dict) -> float:
            self.module.approximator.function.extra_params.update(params)
            _ = self.module(input, *args, **kwargs)
            e = self.module.approximation_error
            if isinstance(e, (list, tuple)):
                return float(sum(jnp.mean(jnp.square(x)) for x in e))
            return float(jnp.mean(jnp.square(e)))

        names = [n for n, _, _ in self.search_space]
        los = np.array([lo for _, lo, _ in self.search_space], float)
        his = np.array([hi for _, _, hi in self.search_space], float)
        n_explore = max(self.n_calls // 2, 1)
        best_x, best_y = None, float("inf")
        for i in range(self.n_calls):
            if i == 0:
                x = (los + his) / 2
            elif i < n_explore or best_x is None:
                x = self.rng.uniform(los, his)
            else:  # refine around the incumbent
                x = np.clip(
                    best_x + self.rng.normal(0, (his - los) / 8), los, his
                )
            y = objective(dict(zip(names, x)))
            if y < best_y:
                best_x, best_y = x, y
        self.module.aft = module_aft
        self.module.approximator.function.extra_params.update(
            dict(zip(names, best_x))
        )


class OptimalBrainCompressor:
    """GPTQ / Optimal Brain Compression (reference
    layer_reconstruction.py:233-327; arXiv:2208.11580).

    Hessian accumulation runs on-device per forward; the blocked
    Cholesky-inverse weight update runs once at context exit.
    """

    def __init__(self, module):
        self.module = module
        self.example_counter = 0
        self.H: Optional[jnp.ndarray] = None

    def measure_hessian(self, inp) -> None:
        inp = jnp.asarray(inp, jnp.float32)
        if inp.ndim == 2:
            inp = inp[None]
        batch = inp.shape[0]
        if getattr(self.module, "unfold_input_for_hessian", None) is not None:
            inp = self.module.unfold_input_for_hessian(inp)  # conv im2col path
        else:
            inp = inp.reshape(-1, inp.shape[-1]).T  # [in_features, tokens]
        if self.H is None:
            self.H = jnp.zeros((inp.shape[0], inp.shape[0]), jnp.float32)
        self.H = self.H * (self.example_counter / (self.example_counter + batch))
        self.example_counter += batch
        inp = math.sqrt(2.0 / self.example_counter) * inp
        self.H = self.H + inp @ inp.T

    def apply(self, microblock_size: int = 1, block_size: int = 128, percdamp: float = 0.01):
        assert block_size % microblock_size == 0
        mod = self.module
        if mod.weight_sparsifier is not None and mod.weight_sparsifier.sparseness.blocked:
            assert microblock_size % mod.weight_sparsifier.sparseness.block_size == 0
        if mod.weight_cast.format.blocked:
            assert microblock_size % mod.weight_cast.format.block_size == 0

        W = np.array(mod.weight.value, np.float32)  # mutable copy
        orig_shape = W.shape
        if W.ndim > 2:
            W = W.reshape(W.shape[0], -1)
        ncols = W.shape[1]

        H = np.asarray(self.H, np.float64)
        self.H = None
        dead = np.diag(H) == 0
        H[dead, dead] = 1.0
        W[:, dead] = 0.0

        damp = percdamp * np.mean(np.diag(H))
        H[np.arange(ncols), np.arange(ncols)] += damp
        # Hinv = upper Cholesky factor of H^-1 (GPTQ trick)
        L = np.linalg.cholesky(H)
        Hinv_full = np.linalg.inv(L.T) @ np.linalg.inv(L)
        Hinv = np.linalg.cholesky(Hinv_full[::-1, ::-1])[::-1, ::-1].T
        # the flip trick produces the upper-triangular Cholesky factor

        Q = np.zeros_like(W)
        for i1 in range(0, ncols, block_size):
            i2 = min(i1 + block_size, ncols)
            count = i2 - i1
            _W = W[:, i1:i2].copy()
            _E = np.zeros_like(_W)
            _Hinv = Hinv[i1:i2, i1:i2]
            for j1 in range(0, count, microblock_size):
                j2 = min(j1 + microblock_size, count)
                w = _W[:, j1:j2]
                hinv = _Hinv[j1:j2, j1:j2]
                q = np.asarray(mod.weight_hypernet(jnp.asarray(w)), np.float32)
                err = (w - q) @ np.linalg.inv(hinv)
                Q[:, i1 + j1 : i1 + j2] = q
                _W[:, j2:] -= err @ _Hinv[j1:j2, j2:]
                _E[:, j1:j2] = err
            W[:, i2:] -= _E @ Hinv[i1:i2, i2:]

        mod.weight.value = jnp.asarray(
            Q.reshape(orig_shape), mod.weight.value.dtype
        )
