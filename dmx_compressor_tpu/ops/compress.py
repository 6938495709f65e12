"""Inference compression: freeze fake-quant Linears into packed fused kernels.

``compress_for_inference(dmx_model)`` rewrites every Linear whose weight
format is BFP into a :class:`PackedBFPLinear`: the weight pipeline (sparsify
-> smoothquant -> storage cast) is folded once, the result packed into int8
mantissas + block exponents, and the forward runs the fused Pallas
dequant-matmul (ops/bfp_linear.py).  Weight numerics are unchanged — the
packed reconstruction is bit-exact w.r.t. the fake-quant weight cast — but
weights occupy ~wl/32 of the fp32 footprint in HBM and are dequantized in
VMEM.  Activation numerics: exact whenever the input cast quantizes to
<= 8 mantissa bits (all quantized serving configs) and on every large-M
(prefill) matmul; the ONE approximation is the small-M decode matmul under
SAME/FP16 input casts, which rides the MXU in bf16 — a deliberate, measured
serving policy (see PackedBFPLinear._forward).

This stage has no analogue in the reference (which always recomputes
fake-quant weights per forward, torch_modules.py:346-360); it is the TPU
build's production serving path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..nn import modules as dmxnn
from ..nn.core import DmxModule
from ..numerics.format import BlockFloatingPoint, Same, ScaledBlockFloatingPoint
from .bfp_linear import bfp_linear
from .bfp_pack import PackedBFP, PackedSBFP, bfp_pack, sbfp_pack, sbfp_unpack


class PackedBFPLinear(DmxModule):
    """Inference-only Linear with packed BFP weights and fused dequant-matmul."""

    ch_axis = -1
    win_ch_axis = -1
    wout_ch_axis = 0
    has_accum = False
    has_weight = False  # weight lives packed; no weight casts
    has_bias = True
    sparsifiable = False

    def __init__(self, packed: PackedBFP, bias: Optional[jax.Array], src: dmxnn.Linear):
        self.in_features = src.in_features
        self.out_features = src.out_features
        self.has_bias = bias is not None
        super().__init__()
        self.weight_mantissa = nnx.Variable(packed.mantissa)
        self.weight_exponent = nnx.Variable(packed.exponent)
        self.precision = packed.precision
        self.block_size = packed.block_size
        # optional bf16 dequant cache for small-M (decode) matmuls; EXACT for
        # mantissa width <= 8 (BFP16/14/12).  Per-layer policy re-measured on
        # the real chip in round 3 (tools/diag_bfpkernel_ab.py, marginal
        # per-call cost at OPT-1.3B decode shapes): the bf16 MXU path wins
        # every transformer-block shape (qkv 18 vs 55us, fc1 27 vs 38, fc2
        # 31 vs 30 tie), and the fused int8 kernel — which reads half the
        # bytes — only wins once the weight is LM-head-sized and the read is
        # genuinely bandwidth-bound (50k x 2048: 216 vs 297us).  [The round-2
        # "fused wins at in_features >= 2048" policy came from a concat-form
        # kernel measurement that did not hold up; it cost 1.3B BASIC decode
        # 0.68x vs fp32.]  DMX_DECODE_BF16CACHE=1 / DMX_DECODE_FUSED=1 force
        # either path for A/B runs.
        import os

        from .bfp_pack import bfp_unpack

        n_weights = self.in_features * self.out_features
        use_bf16 = packed.precision <= 9 and not (
            self.in_features >= 1024
            and self.out_features >= 16384
            and n_weights >= 32_000_000
        )
        if os.environ.get("DMX_DECODE_BF16CACHE"):
            use_bf16 = packed.precision <= 9
        if os.environ.get("DMX_DECODE_FUSED"):
            use_bf16 = False
        self.weight_bf16 = (
            nnx.Variable(bfp_unpack(packed).astype(jnp.bfloat16))
            if use_bf16
            else None
        )
        if use_bf16:
            # EITHER the bf16 dequant cache OR the int8 payload lives on the
            # module, never both: keeping both doubled weight HBM residency
            # and OOM'd gemma-2b (2.5B params) at build time.  All matmuls
            # (decode AND prefill) ride the kept copy; re-deriving the
            # payload from the bf16 cache is lossless (bfp_pack is
            # idempotent on already-quantized values — the block amax of a
            # quantized block keeps its exponent: grid values are clipped
            # below 2^(e+1) and nearest-rounding never crosses down past
            # 2^e), which is how merge_parallel_linears re-packs.
            self.weight_mantissa = None
            self.weight_exponent = None
        self.bias = nnx.Param(bias) if bias is not None else None
        # inherit the live input/output/bias casts so activation quantization
        # and calibration state carry over
        self.input_casts = src.input_casts
        self.output_casts = src.output_casts
        self.bias_cast = src.bias_cast
        self.input_casts["input_cast"].block_dim = -1

    @property
    def packed(self) -> PackedBFP:
        assert self.weight_mantissa is not None, (
            "int8 payload was dropped in favor of the bf16 dequant cache; "
            "matmuls must route through weight_bf16"
        )
        return PackedBFP(
            self.weight_mantissa.value,
            self.weight_exponent.value,
            self.precision,
            self.block_size,
        )

    # ---- fused fake-quant path: ONE kernel for cast + matmul + fp16 out ----

    def _fusable(self, x) -> bool:
        """Static check: the whole BASIC pipeline of this module folds into
        the tight fused path (ops/basic_linear.py).  Falls back to the
        modular path whenever any stateful subsystem is active."""
        from ..numerics.format import BlockFloatingPoint as BFP
        from ..numerics.format import FloatingPoint
        from ..utils.tracing import eager as _eager

        if x.ndim < 1 or x.shape[-1] != self.in_features:
            return False
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if rows > 256:  # decode/small-batch regime only; prefill amortizes
            return False
        ic = self.input_casts["input_cast"]
        oc = self.output_casts[self.output_cast_names[0]]
        in_ok = (
            isinstance(ic.format, BFP)
            and ic.format.symmetric
            and ic.format.rounding == "nearest"
            and ic.format.block_size > 1
            and ic.block_dim in (-1, x.ndim - 1)
            and self.in_features % ic.format.block_size == 0
            and ic.fake_quant_enabled
            and not ic.observer_enabled
            and not ic.pre_transform
        )
        out_ok = (
            isinstance(oc.format, Same)
            or (
                isinstance(oc.format, FloatingPoint)
                and repr(oc.format) == "FP[1|5|10,15](FN)"
            )
        ) and oc.fake_quant_enabled and not oc.observer_enabled and not oc.pre_transform
        quiet = (
            not DmxModule.plugins
            and self.obc is None
            and self.aft is None
            and not (self.flop_counter_enabled and _eager())
            and (
                self.smoothquant is None
                or not (self.smoothquant.dynamic or self.smoothquant.calibrating)
            )
        )
        return in_ok and out_ok and quiet

    def __call__(self, input, *args, **kwargs):
        if not self._fusable(input):
            return super().__call__(input, *args, **kwargs)
        from ..numerics.format import FloatingPoint
        from .basic_linear import fused_basic_linear

        _dtype = jnp.asarray(input).dtype
        x = input
        if self.smoothquant is not None:
            x = self.smoothquant.scale_input(x)
        ic = self.input_casts["input_cast"]
        oc = self.output_casts[self.output_cast_names[0]]
        out = fused_basic_linear(
            x.astype(jnp.float32),
            w_bf16=self.weight_bf16.value if self.weight_bf16 is not None else None,
            packed=None if self.weight_bf16 is not None else self.packed,
            bias=self.bias.value if self.bias is not None else None,
            in_wl=ic.format.precision,
            in_block=ic.format.block_size,
            out_fp16=isinstance(oc.format, FloatingPoint),
        )
        if self.align_boundary_dtype:
            out = out.astype(_dtype)
        return out

    def _acts_exact_in_bf16(self) -> bool:
        """True when the live input cast guarantees activations arriving at
        ``_forward`` are exactly representable in bf16 (BFP with <= 8
        mantissa bits, fake-quant on) — the quantized serving configs."""
        from ..numerics.format import BlockFloatingPoint as BFP

        ic = self.input_casts["input_cast"]
        return (
            isinstance(ic.format, BFP)
            and ic.format.precision <= 9
            and ic.fake_quant_enabled
        )

    def _forward(self, _input):
        if self.weight_bf16 is not None:
            rows = 1
            for d in _input.shape[:-1]:
                rows *= d
            if rows > 256 and not self._acts_exact_in_bf16():
                # Prefill with activations that do NOT fit bf16 exactly
                # (SAME / FP16 input casts, i.e. weights-only serving):
                # upcast the bf16 dequant cache — itself the EXACT quantized
                # weight (<= 8 mantissa bits) — and run the matmul in f32.
                # Prefill is compute-bound, so the transient convert is
                # noise; this keeps exact-f32 prefill numerics without a
                # second weight payload resident in HBM (ADVICE r4 medium).
                y = jnp.matmul(
                    _input.astype(jnp.float32),
                    self.weight_bf16.value.T.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
            else:
                # bf16 weights feed the MXU directly (exact for quantized
                # operands: <= 8 mantissa bits), half the fp32 HBM traffic,
                # zero kernel overhead at tiny M.  With SAME/FP16 inputs the
                # small-M bf16 activation cast is a deliberate, measured
                # serving approximation (same policy as PackedSBFPLinear).
                y = jnp.matmul(
                    _input.astype(jnp.bfloat16),
                    self.weight_bf16.value.T,
                    preferred_element_type=jnp.float32,
                )
            if self.bias is not None:
                y = y + self._bias.astype(y.dtype)
            return y.astype(_input.dtype)
        return bfp_linear(_input, self.packed, bias=self._bias)

    def _flops_for(self, input_shape, output_shape):
        import numpy as np

        return int(np.prod(input_shape)) * self.out_features

    @classmethod
    def from_linear(cls, lin: dmxnn.Linear) -> "PackedBFPLinear":
        fmt = lin.weight_format
        assert isinstance(fmt, BlockFloatingPoint), (
            f"PackedBFPLinear requires a BFP weight format, got {fmt!r}"
        )
        w = lin.weight.value
        # fold the pre-cast pipeline once (sparsify -> smoothquant -> storage)
        if lin.weight_sparsifier is not None:
            w = lin.weight_sparsifier(w)
        if lin.smoothquant is not None and not lin.smoothquant.fused_to_weight:
            w = lin.smoothquant.scale_weight(w)
        if lin.weight_storage_cast is not None and not isinstance(
            lin.weight_storage_cast.format, Same
        ):
            w = lin.weight_storage_cast(w)
        packed = bfp_pack(
            jnp.asarray(w, jnp.float32), fmt.precision, fmt.block_size
        )
        bias = None
        if lin.bias is not None:
            bias = (
                lin.bias_cast(lin.bias.value)
                if lin.bias_cast is not None
                else lin.bias.value
            )
            if lin.bias_cast is not None:  # folded: downstream cast is identity
                lin.bias_cast.set_format("SAME")
        return cls(packed, bias, lin)


class PackedSBFPLinear(DmxModule):
    """Inference-only Linear serving directly from SBFP payloads: two's-
    complement int4 mantissas packed two-per-byte + one low-bit-fp scale per
    block (~0.56 bytes/elem for SBFP12_16 vs 4 for fp32).  Covers the
    weights-only serving of the SBFP_WEIGHT_STORAGE configs (BASELINE.md
    OPT-1.3B row): weight_storage_format SBFP with weight_format SAME.

    Decode matmuls use a bf16 dequant cache: an int4 mantissa (3
    significant bits) times an m4 scale (5) needs <= 8 significand bits —
    exactly bf16's precision — so the cached WEIGHTS are lossless.  Like
    PackedBFPLinear's decode path, activations ride the MXU in bf16: exact
    when the input cast quantizes to <= 9 bits (the quantized serving
    configs), a deliberate bf16-serving approximation when inputs are SAME
    (raw fp32).  Prefill (rows >= 128) dequantizes f32 throughout."""

    ch_axis = -1
    win_ch_axis = -1
    wout_ch_axis = 0
    has_accum = False
    has_weight = False
    has_bias = True
    sparsifiable = False

    def __init__(self, packed: PackedSBFP, bias, src: dmxnn.Linear):
        self.in_features = src.in_features
        self.out_features = src.out_features
        self.has_bias = bias is not None
        super().__init__()
        self.weight_nibbles = nnx.Variable(packed.nibbles)
        self.weight_block_scale = nnx.Variable(packed.scale)
        self.block_size = packed.block_size
        import os

        use_bf16 = not os.environ.get("DMX_DECODE_FUSED")
        self.weight_bf16 = (
            nnx.Variable(sbfp_unpack(packed).astype(jnp.bfloat16))
            if use_bf16
            else None
        )
        self.bias = nnx.Param(bias) if bias is not None else None
        self.input_casts = src.input_casts
        self.output_casts = src.output_casts
        self.bias_cast = src.bias_cast
        self.input_casts["input_cast"].block_dim = -1

    @property
    def packed(self) -> PackedSBFP:
        return PackedSBFP(
            self.weight_nibbles.value, self.weight_block_scale.value, self.block_size
        )

    def _forward(self, _input):
        rows = 1
        for d in _input.shape[:-1]:
            rows *= d
        if self.weight_bf16 is not None and rows < 128:
            y = jnp.matmul(
                _input.astype(jnp.bfloat16),
                self.weight_bf16.value.T,
                preferred_element_type=jnp.float32,
            )
        else:
            # fused on-chip dequant (Pallas on TPU; unpack-matmul reference
            # elsewhere) — the int4 payload + per-block scales never
            # materialize as a full f32 weight in HBM
            from .bfp_linear import sbfp_linear

            y = sbfp_linear(_input.astype(jnp.float32), self.packed)
        if self.bias is not None:
            y = y + self._bias.astype(y.dtype)
        return y.astype(_input.dtype)

    def _flops_for(self, input_shape, output_shape):
        import numpy as np

        return int(np.prod(input_shape)) * self.out_features

    @classmethod
    def from_linear(cls, lin: dmxnn.Linear) -> "PackedSBFPLinear":
        fmt = lin.weight_storage_format
        assert isinstance(fmt, ScaledBlockFloatingPoint)
        assert isinstance(lin.weight_format, Same), (
            "SBFP storage + non-SAME weight cast packs via PackedBFPLinear"
        )
        w = lin.weight.value
        if lin.weight_sparsifier is not None:
            w = lin.weight_sparsifier(w)
        if lin.smoothquant is not None and not lin.smoothquant.fused_to_weight:
            w = lin.smoothquant.scale_weight(w)
        packed = sbfp_pack(jnp.asarray(w, jnp.float32), fmt)
        bias = None
        if lin.bias is not None:
            bias = (
                lin.bias_cast(lin.bias.value)
                if lin.bias_cast is not None
                else lin.bias.value
            )
            if lin.bias_cast is not None:
                lin.bias_cast.set_format("SAME")
        return cls(packed, bias, lin)


def merge_parallel_linears(mods):
    """Concatenate sibling PackedBFPLinears that consume the SAME input into
    one module (e.g. q/k/v projections): one fused kernel + one shared input
    cast instead of three.  Bit-exact: the matmul is row-independent and the
    FLOAT16 output cast is elementwise, so concatenating along the output
    dim changes nothing numerically.  Returns None unless every module has
    identical static cast config and inactive stateful subsystems."""
    if not mods or not all(isinstance(m, PackedBFPLinear) for m in mods):
        return None

    def sig(m):
        ic = m.input_casts["input_cast"]
        oc = m.output_casts[m.output_cast_names[0]]
        return (
            m.in_features,
            repr(ic.format), ic.block_dim, ic.fake_quant_enabled,
            ic.observer_enabled, bool(ic.pre_transform),
            repr(oc.format), oc.fake_quant_enabled, oc.observer_enabled,
            bool(oc.pre_transform),
            m.precision, m.block_size,
            m.weight_bf16 is not None, m.bias is not None,
        )

    if len({sig(m) for m in mods}) != 1:
        return None
    for m in mods:
        if m.smoothquant is not None and (
            m.smoothquant.dynamic or m.smoothquant.input_maxabs_exists
        ):
            return None
    bf16 = mods[0].weight_bf16 is not None  # sig() proved all agree
    if bf16:
        # children carry only the bf16 dequant cache; re-derive the payload
        # losslessly (bfp_pack is idempotent on already-quantized values —
        # see PackedBFPLinear.__init__) purely to ride the normal
        # constructor, which re-unpacks it; both transients are build-time
        w_cat = jnp.concatenate(
            [m.weight_bf16.value for m in mods], axis=0
        ).astype(jnp.float32)
        packed = bfp_pack(w_cat, mods[0].precision, mods[0].block_size)
    else:
        packed = PackedBFP(
            jnp.concatenate([m.weight_mantissa.value for m in mods], axis=0),
            jnp.concatenate([m.weight_exponent.value for m in mods], axis=0),
            mods[0].precision,
            mods[0].block_size,
        )
    bias = (
        jnp.concatenate([m.bias.value for m in mods])
        if mods[0].bias is not None
        else None
    )
    # construct through the normal path (nnx object machinery), then fix the
    # merged dimensions; __init__ inherits mods[0]'s live casts, which is
    # exactly the sharing we want (identical configs checked above)
    merged = PackedBFPLinear(packed, bias, src=mods[0])
    merged.out_features = sum(m.out_features for m in mods)
    # reconcile storage with the children's (the constructor's size policy
    # saw mods[0]'s dims): exactly ONE of bf16 cache / int8 payload lives
    if bf16:
        merged.weight_bf16 = nnx.Variable(w_cat.astype(jnp.bfloat16))
        merged.weight_mantissa = None
        merged.weight_exponent = None
    else:
        merged.weight_bf16 = None
        merged.weight_mantissa = nnx.Variable(packed.mantissa)
        merged.weight_exponent = nnx.Variable(packed.exponent)
    return merged


from contextlib import contextmanager


@contextmanager
def inference_mode():
    """Within this context, approximated ops compute only the surrogate
    (identical values, no gradient path)."""
    prev = DmxModule.inference_mode
    DmxModule.inference_mode = True
    try:
        yield
    finally:
        DmxModule.inference_mode = prev


def set_inference_mode(enabled: bool = True) -> None:
    DmxModule.inference_mode = enabled


def compress_for_inference(dm, keep_originals: bool = False) -> int:
    """Replace BFP-weight Linears in a DmxModel with PackedBFPLinear.

    Returns the number of modules converted.

    After composite modules fuse their children (merged qkv / gate-up), the
    dead original projections stay attached for config/introspection but
    their weight arrays are RELEASED — keeping them doubled weight HBM
    residency and OOM'd gemma-2b (2.5B params) at build.  Pass
    ``keep_originals=True`` to keep them runnable (tests that defuse back
    to the modular path).
    """
    from ..transform.substitute import _items, _set, _is_module_container

    model = dm.module if hasattr(dm, "module") else dm
    count = 0
    seen = set()

    def walk(container):
        nonlocal count
        if id(container) in seen:
            return
        seen.add(id(container))
        for key, value in _items(container):
            if isinstance(key, str) and key.startswith("_"):
                continue
            if isinstance(value, dmxnn.Linear) and isinstance(
                value.weight_format, BlockFloatingPoint
            ) and value.weight_format.block_size > 1 and (
                value.in_features % value.weight_format.block_size == 0
            ):
                _set(container, key, PackedBFPLinear.from_linear(value))
                count += 1
            elif isinstance(value, dmxnn.Linear) and isinstance(
                value.weight_format, Same
            ) and isinstance(
                value.weight_storage_format, ScaledBlockFloatingPoint
            ) and value.weight_storage_format.block_format.precision <= 4 and (
                value.in_features % value.weight_storage_format.block_size == 0
            ):
                _set(container, key, PackedSBFPLinear.from_linear(value))
                count += 1
            elif _is_module_container(value) and not isinstance(value, nnx.Variable):
                walk(value)

    walk(model)

    # second pass: let composite modules (attention blocks) fuse their
    # now-packed children (e.g. q/k/v -> one merged projection)
    seen2 = set()

    def walk_fuse(container):
        if id(container) in seen2:
            return
        seen2.add(id(container))
        if hasattr(container, "fuse_for_inference"):
            container.fuse_for_inference()
        for key, value in _items(container):
            if isinstance(key, str) and key.startswith("_"):
                continue
            if _is_module_container(value) and not isinstance(value, nnx.Variable):
                walk_fuse(value)

    walk_fuse(model)
    if not keep_originals:
        release_dead_originals(model)
    return count


def release_dead_originals(model) -> int:
    """Free the weight arrays of projections superseded by a merged module
    (``qkv_merged`` / ``gateup_merged``).  The modules stay attached — their
    cast configs and dims remain introspectable — but calling them raises.
    Returns the number of modules released."""
    from ..transform.substitute import _is_module_container, _items

    released = 0
    seen = set()

    def strip(m):
        nonlocal released
        if isinstance(m, PackedBFPLinear):
            if m.weight_bf16 is None and m.weight_mantissa is None:
                return  # already released
            m.weight_bf16 = None
            m.weight_mantissa = None
            m.weight_exponent = None
            released += 1
        elif isinstance(m, PackedSBFPLinear):
            if m.weight_bf16 is None and m.weight_nibbles is None:
                return
            m.weight_bf16 = None
            m.weight_nibbles = None
            m.weight_block_scale = None
            released += 1

    def walk(container):
        if id(container) in seen:
            return
        seen.add(id(container))
        if getattr(container, "qkv_merged", None) is not None:
            for name in ("q_proj", "k_proj", "v_proj"):
                strip(getattr(container, name, None))
        if getattr(container, "gateup_merged", None) is not None:
            for name in ("gate_proj", "up_proj"):
                strip(getattr(container, name, None))
        for key, value in _items(container):
            if isinstance(key, str) and key.startswith("_"):
                continue
            if _is_module_container(value) and not isinstance(value, nnx.Variable):
                walk(value)

    walk(model)
    return released
