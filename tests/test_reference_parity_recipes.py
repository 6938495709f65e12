"""PTQ-recipe parity against the LIVE reference library.

Extends the kernel-level (test_reference_parity.py) and module/model-level
(test_reference_parity_model.py) oracles to the post-training-optimization
recipes: identical weights + identical calibration batches drive the
reference's torch implementations (observer calibration reference
cast.py:308-340, SmoothQuant smoothquant.py:301-354, GPTQ/OBC
layer_reconstruction.py:233-327) and this build's, and the learned state
(scales, zero-points, migrated weights, GPTQ-updated weights) is compared.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
SHIMS = os.path.join(os.path.dirname(__file__), "..", "tools", "refshims")

ref_available = os.path.isdir(REF)
if ref_available:
    sys.path.insert(0, os.path.abspath(SHIMS))
    sys.path.insert(0, REF)
    try:
        import torch
        import transformers
        import transformers.modeling_utils

        if not hasattr(transformers.modeling_utils, "ModelOutput"):
            transformers.modeling_utils.ModelOutput = transformers.utils.ModelOutput
        from dmx.compressor.advanced_recipe import (
            DmxModuleGPTQHyperparams as RefGPTQHp,
        )
        from dmx.compressor.advanced_recipe import (
            DmxModuleSmoothQuantHyperparams as RefSQHp,
        )
        from dmx.compressor.modeling import nn as refnn
        from dmx.compressor.numerical import Format as RefFormat
        from dmx.compressor.numerical.observer import (
            MinMaxObserver as RefMinMaxObserver,
        )
    except Exception:  # pragma: no cover
        ref_available = False

pytestmark = pytest.mark.skipif(
    not ref_available, reason="reference library not importable here"
)

import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from dmx_compressor_tpu.advanced_recipe import (  # noqa: E402
    DmxModuleGPTQHyperparams,
    DmxModuleSmoothQuantHyperparams,
)
from dmx_compressor_tpu.nn import modules as dmxnn  # noqa: E402
from dmx_compressor_tpu.numerics.observer import MinMaxObserver  # noqa: E402

RNG = np.random.default_rng(11)

INT8 = "XP[8,0](CSN)"


def _pair_of_linears(K=32, N=16, bias=True, seed=0):
    """A reference Linear and this build's Linear with identical weights."""
    torch.manual_seed(seed)
    raw = torch.nn.Linear(K, N, bias=bias)
    ref = refnn.Linear.from_raw(raw)
    mine = dmxnn.Linear(K, N, bias=bias, rngs=nnx.Rngs(0))
    mine.weight.value = jnp.asarray(raw.weight.detach().numpy())
    if bias:
        mine.bias.value = jnp.asarray(raw.bias.detach().numpy())
    return ref, mine


def test_minmax_input_calibration_parity():
    """MinMax observer calibration learns the same scale/zero_point and the
    calibrated fake-quant produces the same outputs."""
    ref, mine = _pair_of_linears()
    ref.input_casts["input_cast"].set_format(RefFormat.from_shorthand(INT8))
    mine.input_casts.set_format([INT8])

    batches = [
        (RNG.standard_normal((8, 32)) * s).astype(np.float32) for s in (1.0, 3.0)
    ]
    ref.input_casts["input_cast"].enable_calibration(
        True, observer_cls=RefMinMaxObserver
    )
    mine.input_casts["input_cast"].enable_calibration(
        True, observer_cls=MinMaxObserver
    )
    for x in batches:
        with torch.no_grad():
            ref(torch.from_numpy(x))
        mine(jnp.asarray(x))
    ref.input_casts["input_cast"].enable_calibration(False)
    mine.input_casts["input_cast"].enable_calibration(False)

    ref_scale = float(ref.input_casts["input_cast"].scale)
    ref_zp = float(ref.input_casts["input_cast"].zero_point)
    my_scale = float(np.asarray(mine.input_casts["input_cast"].scale.value).ravel()[0])
    my_zp = float(
        np.asarray(mine.input_casts["input_cast"].zero_point.value).ravel()[0]
    )
    np.testing.assert_allclose(my_scale, ref_scale, rtol=1e-6)
    np.testing.assert_allclose(my_zp, ref_zp, atol=1e-6)

    x = (RNG.standard_normal((8, 32)) * 2).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(mine(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_smoothquant_calibration_parity():
    """Static SmoothQuant calibration migrates the same per-channel scale
    (reference scale = a_max^alpha / w_max^(1-alpha), smoothquant.py:301-321)
    and the scaled forward matches.

    Single calibration batch on purpose: the reference's
    ActivationWeightSmoothQuant.forward assigns ``self.input_maxabs`` — a
    plain attribute, NOT the registered ``a_maxabs`` buffer — so
    ``input_maxabs_exists`` stays False forever and only the LAST batch's
    maxabs survives (reference smoothquant.py:525-531, a latent bug).  This
    build accumulates the true running max across batches; on one batch the
    two semantics coincide and the scale formula is what's verified."""
    ref, mine = _pair_of_linears(K=24, N=12)
    xs = [(RNG.standard_normal((16, 24)) * 2).astype(np.float32)]
    xs[0][:, 0] *= 50.0  # channel outlier to make migration non-trivial

    ref_hp = RefSQHp(migration_strength=0.5, fuse_to_weight=False)
    my_hp = DmxModuleSmoothQuantHyperparams(
        migration_strength=0.5, fuse_to_weight=False
    )
    with ref.calibrating_smoothquant(ref_hp):
        for x in xs:
            with torch.no_grad():
                ref(torch.from_numpy(x))
    with mine.calibrating_smoothquant(my_hp):
        for x in xs:
            mine(jnp.asarray(x))

    ref_scale = ref.smoothquant.scale.detach().numpy().ravel()
    my_scale = np.asarray(mine.smoothquant.scale.value).ravel()
    np.testing.assert_allclose(my_scale, ref_scale, rtol=1e-5)

    x = xs[0]
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(mine(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_smoothquant_fuse_to_weight_parity():
    ref, mine = _pair_of_linears(K=24, N=12, seed=3)
    xs = [(RNG.standard_normal((16, 24)) * 2).astype(np.float32)]
    xs[0][:, 1] *= 30.0

    with ref.calibrating_smoothquant(RefSQHp(0.5, True)):
        with torch.no_grad():
            ref(torch.from_numpy(xs[0]))
    with mine.calibrating_smoothquant(DmxModuleSmoothQuantHyperparams(0.5, True)):
        mine(jnp.asarray(xs[0]))

    np.testing.assert_allclose(
        np.asarray(mine.weight.value),
        ref.weight.detach().numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize(
    "wfmt,micro,block",
    [
        (INT8, 1, 16),  # per-column GPTQ on a fixed-point grid
        ("BFP[8|8]{16}(SN)", 16, 32),  # microblocks = BFP blocks
    ],
)
def test_gptq_weight_update_parity(wfmt, micro, block):
    """The blocked Cholesky-inverse GPTQ update produces the same quantized
    weights given the same Hessian batches (reference
    layer_reconstruction.py:266-327)."""
    ref, mine = _pair_of_linears(K=32, N=16, seed=5)
    ref.weight_cast.set_format(RefFormat.from_shorthand(wfmt))
    mine.configure(dict(weight_format=wfmt))

    xs = [
        (RNG.standard_normal((32, 32))).astype(np.float32) for _ in range(4)
    ]
    ref_hp = RefGPTQHp(microblock_size=micro, block_size=block, percdamp=0.01)
    my_hp = DmxModuleGPTQHyperparams(
        microblock_size=micro, block_size=block, percdamp=0.01
    )
    if not torch.cuda.is_available():
        # reference apply() calls torch.cuda.synchronize() unconditionally
        torch.cuda.synchronize = lambda *a, **k: None
    with ref.optimal_brain_compressing(ref_hp):
        for x in xs:
            with torch.no_grad():
                ref(torch.from_numpy(x))
    with mine.optimal_brain_compressing(my_hp):
        for x in xs:
            mine(jnp.asarray(x))

    want = ref.weight.detach().numpy()
    got = np.asarray(mine.weight.value)
    if micro == 1:
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    else:
        # blocked fake-quant inside the update loop: this build accumulates
        # the Hessian in float64 (reference: float32), so exact rounding
        # midpoints can flip by one mantissa LSB on a few entries — accept
        # rare one-step differences, nothing larger
        diff = np.abs(got - want)
        assert (diff > 1e-6).mean() < 0.05, (diff > 1e-6).mean()
        # per-block LSB: BFP[8|8]{16} mantissa step = 2^(block_exp - 6)
        blocks = np.abs(want).reshape(want.shape[0], -1, 16).max(-1)
        lsb = 2.0 ** (np.floor(np.log2(np.maximum(blocks, 1e-30))) - 6)
        lsb = np.repeat(lsb, 16, axis=1)
        assert (diff <= 1.05 * lsb + 1e-9).all(), float((diff / lsb).max())


def test_histogram_calibration_parity():
    """Histogram observer with the L2-norm-minimizing non-linear search
    (reference observer.py:213-582): same single calibration batch, same
    learned scale/zero_point up to histogram-resolution granularity.

    Integer-valued range endpoints on purpose: the reference builds its
    histogram with ``torch.histc(x, bins, min=int(min), max=int(max))``
    (observer.py:470-471) — truncating the range to ints and silently
    dropping out-of-range values — while its L2 search still interprets the
    bins over the FLOAT min/max (a latent torch.ao-era bug).  This build
    histograms the true float range and counts every value; with integer
    endpoints the two semantics coincide and the search itself is what's
    verified (it matches the reference's search bit-for-bit on identical
    histograms)."""
    from dmx.compressor.numerical.observer import (
        HistogramObserver as RefHistogramObserver,
    )

    from dmx_compressor_tpu.numerics.observer import HistogramObserver

    ref, mine = _pair_of_linears(K=32, N=16, seed=9)
    ref.input_casts["input_cast"].set_format(RefFormat.from_shorthand(INT8))
    mine.input_casts.set_format([INT8])

    x = (RNG.standard_normal((64, 32)) * 2).astype(np.float32)
    x = np.clip(x, -6.0, 7.0)
    x[0, 0], x[0, 1] = -6.0, 7.0  # exact integer endpoints
    ref.input_casts["input_cast"].enable_calibration(
        True, observer_cls=RefHistogramObserver
    )
    mine.input_casts["input_cast"].enable_calibration(
        True, observer_cls=HistogramObserver
    )
    with torch.no_grad():
        ref(torch.from_numpy(x))
    mine(jnp.asarray(x))
    ref.input_casts["input_cast"].enable_calibration(False)
    mine.input_casts["input_cast"].enable_calibration(False)

    ref_scale = float(ref.input_casts["input_cast"].scale)
    my_scale = float(
        np.asarray(mine.input_casts["input_cast"].scale.value).ravel()[0]
    )
    ref_zp = float(ref.input_casts["input_cast"].zero_point)
    my_zp = float(
        np.asarray(mine.input_casts["input_cast"].zero_point.value).ravel()[0]
    )
    np.testing.assert_allclose(my_scale, ref_scale, rtol=1e-4)
    assert abs(my_zp - ref_zp) <= 1.0  # zp quantizes the same bin boundary


@pytest.mark.parametrize(
    "position,mlp_type",
    [("post_attn", None), ("post_mlp", "standard"), ("post_mlp", "llama")],
)
def test_slanc_norm_parity(position, mlp_type):
    """The SLaNC analytic norms (Frobenius / spectral compositions of the
    surrounding weights, reference layer_reconstruction.py:127-201) match
    the live reference for every position/mlp-type."""
    from dmx.compressor.advanced_recipe import (
        DmxSLaNCHyperparams as RefSLaNCHp,
    )
    from dmx.compressor.functional import ApproximationFunction as RefAF

    from dmx_compressor_tpu.advanced_recipe import DmxModuleSLaNCHyperparams
    from dmx_compressor_tpu.functional.approximate import ApproximationFunction

    D, H = 16, 32
    torch.manual_seed(7)
    t_prev_ln = torch.nn.LayerNorm(D)
    with torch.no_grad():
        t_prev_ln.weight.mul_(1.0 + 0.3 * torch.randn(D))
    t_v = torch.nn.Linear(D, D, bias=False)
    t_o = torch.nn.Linear(D, D, bias=False)
    t_fc1 = torch.nn.Linear(D, H, bias=False)
    t_fc2 = torch.nn.Linear(H, D, bias=False)
    t_gate = torch.nn.Linear(D, H, bias=False)
    t_up = torch.nn.Linear(D, H, bias=False)
    t_down = torch.nn.Linear(H, D, bias=False)

    # reference side: LayerNorm with a vsimd-tagged approximation
    raw_ln = torch.nn.LayerNorm(D)
    ref_ln = refnn.LayerNorm.from_raw(raw_ln)
    ref_ln.approximator.function = RefAF.from_shorthand("LAYER_NORM[vsimd]{}()")
    ref_hp = RefSLaNCHp(
        position=position, mlp_type=mlp_type, device=torch.device("cpu"),
        prev_ln_weight=t_prev_ln, v_proj=t_v, o_proj=t_o,
        fc1=t_fc1, fc2=t_fc2, gate_proj=t_gate, up_proj=t_up, down_proj=t_down,
    )
    with ref_ln.slanc_tuning(ref_hp):
        pass
    ref_norm = float(ref_ln.approximator.function.extra_params["norm"])

    # this build: same weights through dmx module wrappers
    def as_mine(t_mod, cls, *shape):
        m = cls(*shape, rngs=nnx.Rngs(0)) if shape else cls(D)
        m.weight.value = jnp.asarray(t_mod.weight.detach().numpy())
        return m

    ln = dmxnn.LayerNorm(D)
    ln.configure(dict(approximation_function="LAYER_NORM[vsimd]{}()"))
    my_hp = DmxModuleSLaNCHyperparams(
        position=position, mlp_type=mlp_type,
        prev_ln_weight=as_mine(t_prev_ln, dmxnn.LayerNorm),
        v_proj=as_mine(t_v, dmxnn.Linear, D, D),
        o_proj=as_mine(t_o, dmxnn.Linear, D, D),
        fc1=as_mine(t_fc1, dmxnn.Linear, D, H),
        fc2=as_mine(t_fc2, dmxnn.Linear, H, D),
        gate_proj=as_mine(t_gate, dmxnn.Linear, D, H),
        up_proj=as_mine(t_up, dmxnn.Linear, D, H),
        down_proj=as_mine(t_down, dmxnn.Linear, H, D),
    )
    with ln.slanc_tuning(my_hp):
        pass
    my_norm = float(ln.approximator.function.extra_params["norm"])
    np.testing.assert_allclose(my_norm, ref_norm, rtol=1e-5)


def test_btopk_sparsity_mask_parity():
    """BTOPK N:M structured masks match the reference's BlockTopK
    (reference sparse.py:147-204) element for element."""
    from dmx.compressor.sparse import Sparseness as RefSparseness

    from dmx_compressor_tpu.sparse import Sparseness

    x = (RNG.standard_normal((8, 64)) * 3).astype(np.float32)
    for sh in ("BTOPK{4:8,-1}(U)", "BTOPK{2:8,-1}(U)", "TOPK{0.5}(U)"):
        ref_sp = RefSparseness.from_shorthand(sh)
        my_sp = Sparseness.from_shorthand(sh)
        ref_mask = ref_sp.get_mask(torch.from_numpy(x)).numpy()
        my_mask = np.asarray(my_sp.get_mask(jnp.asarray(x)))
        np.testing.assert_array_equal(my_mask, ref_mask, err_msg=sh)
