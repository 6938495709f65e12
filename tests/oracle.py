"""Independent float64 oracle for the low-precision rounding semantics.

This is a from-the-spec reimplementation of the reference kernel semantics
(quant_cpu.cpp / block_kernel.cu) in numpy float64 *grid arithmetic*, kept
deliberately different in structure from the library's fp32 implementation so
that agreement between the two is meaningful evidence of correctness.
"""

import numpy as np


def _round_grid(x, step, mode, rng=None, bit_mode=False):
    s = x / step  # exact: step is a power of two, x is fp32-representable
    if mode == "nearest":
        return np.round(s) * step  # numpy round = half-to-even
    if mode == "up":
        if bit_mode:  # reference bitwise up: magnitude bump away from zero
            return np.sign(s) * (np.floor(np.abs(s)) + 1.0) * step
        return np.ceil(s) * step
    if mode == "down":
        if bit_mode:  # reference bitwise down: truncate toward zero
            return np.trunc(s) * step
        return np.floor(s) * step
    if mode == "stochastic":
        r = rng.random(np.shape(s))
        return np.round(s + r - 0.5) * step
    raise ValueError(mode)


def fixed_point_quantize(x, wl, fl, clamp=True, symmetric=False, mode="nearest"):
    x = np.asarray(x, np.float64)
    q = _round_grid(x, 2.0**-fl, mode)
    if clamp:
        t_min = -(2.0 ** (wl - fl - 1))
        t_max = -t_min - 2.0**-fl
        if symmetric:
            t_min += 2.0**-fl
        q = np.clip(q, t_min, t_max)
    return q


def float_quantize(x, man, exp, bias=None, flush_subnormal=True, mode="nearest"):
    x = np.asarray(x, np.float64)
    if bias is None:
        bias = 2 ** (exp - 1) - 1
    out = np.zeros_like(x)
    min_exp = -(bias - 1)
    emax = 2 ** (exp - 1)
    maxv = (2.0 - 2.0**-man) * 2.0**emax
    for i, v in np.ndenumerate(x):
        if v == 0.0:
            out[i] = v
            continue
        e = int(np.floor(np.log2(abs(v))))
        # fp32 boundary fixup: log2 of exact powers of two is exact, but a
        # value just below a power of two can round up; recompute robustly.
        while 2.0**e > abs(v):
            e -= 1
        while 2.0 ** (e + 1) <= abs(v):
            e += 1
        if e < min_exp:  # subnormal w.r.t. bias
            if flush_subnormal:
                out[i] = 0.0
            else:
                # double rounding: the shift add first rounds onto the fp32
                # mantissa grid at min_exp, then bit-rounds to the format grid
                fine = _round_grid(v, 2.0 ** (min_exp - 23), "nearest")
                out[i] = _round_grid(fine, 2.0 ** (min_exp - man), mode, bit_mode=True)
        else:
            q = _round_grid(v, 2.0 ** (e - man), mode, bit_mode=True)
            if q != 0.0 and abs(q) >= 2.0 ** (emax + 1):
                q = np.sign(q) * maxv
            out[i] = q
    return out


def block_quantize_blocks(blocks, wl, mode="nearest"):
    """Symmetric BFP over the last axis (each trailing vector = one block)."""
    blocks = np.asarray(blocks, np.float64)
    out = np.zeros_like(blocks)
    flat = blocks.reshape(-1, blocks.shape[-1])
    oflat = out.reshape(-1, blocks.shape[-1])
    for r in range(flat.shape[0]):
        row = flat[r]
        amax = np.max(np.abs(row))
        if amax == 0.0:
            continue
        e = int(np.floor(np.log2(amax)))
        while 2.0**e > amax:
            e -= 1
        while 2.0 ** (e + 1) <= amax:
            e += 1
        step = 2.0 ** (e + 2 - wl)
        # fp32 rebase-add double rounding (see rounding.py block_quantize)
        base = 6.0 * 2.0**e
        t = (row.astype(np.float32) + np.float32(base)).astype(np.float64)
        q = _round_grid(t, step, mode, bit_mode=True) - base
        lim = 2.0 ** (e + 1)
        maxv = (2.0 - 2.0 ** -(wl - 2)) * 2.0**e
        q = np.where(np.abs(q) >= lim, np.sign(q) * maxv, q)
        oflat[r] = q
    return out


def make_mantissa_asymmetric_blocks(q, x, nbits):
    """Reference's asymmetric post-pass (format.py:349-372) over last axis."""
    q = np.asarray(q, np.float64).copy()
    x = np.asarray(x, np.float64)
    qf = q.reshape(-1, q.shape[-1])
    xf = x.reshape(-1, x.shape[-1])
    for r in range(qf.shape[0]):
        row = qf[r]
        man, ex = np.frexp(row)
        ex = np.where((ex == 0) & (man == 0.0), -200, ex)
        max_exp = ex.max() - nbits + 1
        int_man = (man * 2.0 ** (ex - max_exp)).astype(np.int64)
        edge = int_man == -(2 ** (nbits - 1) - 1)
        old_err = row - xf[r]
        cand_err = old_err - 2.0**max_exp
        sub = edge & (np.abs(cand_err) <= np.abs(old_err))
        qf[r] = np.where(sub, row - 2.0**max_exp, row)
    return q


def bfp_cast(x, precision, block_size, block_dim, symmetric=True, mode="nearest"):
    """Full BFP cast semantics: transpose/flatten/split-with-remainder."""
    x = np.asarray(x, np.float64)
    xt = np.moveaxis(x, block_dim, -1)
    shape = xt.shape
    flat = xt.reshape(-1, shape[-1])
    outs = []
    for s in range(0, shape[-1], block_size):
        blk = flat[:, s : s + block_size]
        q = block_quantize_blocks(blk, precision, mode)
        if not symmetric:
            q = make_mantissa_asymmetric_blocks(q, blk, precision)
        outs.append(q)
    out = np.concatenate(outs, axis=-1).reshape(shape)
    return np.moveaxis(out, -1, block_dim)


def sbfp_cast(x, block_prec, scaler_man, scaler_exp, scaler_bias, block_size, block_dim):
    """SBFP cast (reference format.py:453-479)."""
    x = np.asarray(x, np.float64)
    xt = np.moveaxis(x, block_dim, -1)
    shape = xt.shape
    flat = xt.reshape(-1, shape[-1])
    man_scaling = 2 ** (block_prec - 1) - 1
    outs = []
    for s in range(0, shape[-1], block_size):
        blk = flat[:, s : s + block_size]
        cmax = np.max(np.abs(blk), axis=-1, keepdims=True) / man_scaling
        safe = np.where(cmax > 0, cmax, 1.0)
        qm = fixed_point_quantize(blk / safe, block_prec, 0, True, True, "nearest")
        qs = float_quantize(cmax, scaler_man, scaler_exp, scaler_bias, True, "nearest")
        outs.append(np.where(cmax > 0, qm * qs, blk))
    out = np.concatenate(outs, axis=-1).reshape(shape)
    return np.moveaxis(out, -1, block_dim)
