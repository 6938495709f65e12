"""Live bit-exact parity against the reference's own C++ kernels.

Imports the actual reference library (/root/reference, public untrusted
content — only its *kernels* are executed as an oracle) with minimal
dependency shims (tools/refshims).  Skipped when the reference tree or a
C++ toolchain is unavailable.  These tests are the strongest parity
evidence: they compare every format x rounding mode bit-for-bit.
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
        import torch  # noqa: F401
        from dmx.compressor.quant import (  # noqa: F401
            block_quantize as ref_block,
            fixed_point_quantize as ref_fixed,
            float_quantize as ref_float,
        )
        from dmx.compressor.quant.quant_function import quant_cpu
    except Exception as e:  # pragma: no cover
        ref_available = False
        _reason = str(e)

pytestmark = pytest.mark.skipif(
    not ref_available, reason="reference library not importable here"
)

import jax.numpy as jnp  # noqa: E402

from dmx_compressor_tpu.numerics import rounding as R  # noqa: E402
from dmx_compressor_tpu.numerics.format import Format  # noqa: E402

RNG = np.random.default_rng(123)


def _x(n=8192, scale=4.0):
    return (RNG.standard_normal(n) * scale).astype(np.float32)


@pytest.mark.parametrize("mode", ["nearest", "up", "down"])
@pytest.mark.parametrize("wl,fl,sym", [(8, 0, True), (8, 0, False), (4, 2, True)])
def test_fixed_point_bit_exact(mode, wl, fl, sym):
    import torch

    x = _x()
    ref = ref_fixed(torch.from_numpy(x), wl, fl, True, sym, mode).numpy()
    mine = np.asarray(R.fixed_point_quantize(jnp.asarray(x), wl, fl, True, sym, mode))
    np.testing.assert_array_equal(ref, mine)


@pytest.mark.parametrize("mode", ["nearest", "up", "down"])
@pytest.mark.parametrize("man,exp", [(3, 4), (10, 5), (2, 5)])
@pytest.mark.parametrize("flush", [True, False])
def test_float_bit_exact(mode, man, exp, flush):
    import torch

    x = _x()
    bias = 2 ** (exp - 1) - 1
    cfn = {
        "nearest": quant_cpu.float_quantize_nearest,
        "up": quant_cpu.float_quantize_up,
        "down": quant_cpu.float_quantize_down,
    }[mode]
    ref = cfn(torch.from_numpy(x), man, exp, bias, flush).numpy()
    mine = np.asarray(R.float_quantize(jnp.asarray(x), man, exp, bias, flush, mode))
    np.testing.assert_array_equal(ref, mine)


@pytest.mark.parametrize("mode", ["nearest", "up", "down"])
@pytest.mark.parametrize("wl", [4, 8, 16])
def test_block_bit_exact(mode, wl):
    import torch

    blocks = (RNG.standard_normal((64, 64)) * 3).astype(np.float32)
    ref = ref_block(torch.from_numpy(blocks), wl, 0, True, mode).numpy()
    mine = np.asarray(R.block_quantize(jnp.asarray(blocks), wl, mode))
    np.testing.assert_array_equal(ref, mine)


@pytest.mark.parametrize(
    "sh",
    [
        "BFP[8|8]{64}(SN)",
        "BFP[8|8]{64}(_N)",
        "BFP[4|8]{16}(SN)",
        "BFP[24|8]{1}(SN)",
        "SBFP<XP[4,0](CSN)><FP[0|4|4,7](FN)>{16}",
        "MXINT8{32}",
        "XP[8,0](CSN)",
        "FP[1|4|3,7](_N)",
    ],
)
def test_format_cast_bit_exact(sh):
    import torch
    from dmx.compressor.numerical.format import Format as RefFormat

    x = (RNG.standard_normal((16, 100)) * 5).astype(np.float32)
    rf = RefFormat.from_shorthand(sh)
    mf = Format.from_shorthand(sh)
    ref = (
        rf.cast(torch.from_numpy(x), -1) if rf.blocked else rf.cast(torch.from_numpy(x))
    ).numpy()
    mine = np.asarray(mf.cast(jnp.asarray(x), block_dim=-1))
    np.testing.assert_array_equal(ref, mine)
