"""Scan-based ablation of BASIC decode throughput (tunnel-RTT-free).

Reuses bench.build/run; ablations are applied by monkeypatching before the
model is built.  Usage: python tools/diag_basic_scan.py [opt-125m]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench.enable_compile_cache()


ONLY = [a for a in sys.argv[2:]]


def run_variant(tag, cfg, mode="basic", patch=None, unpatch=None):
    if ONLY and not any(s in tag for s in ONLY):
        return 0.0
    if patch:
        patch()
    try:
        tps = bench.run(mode, cfg, reps=2)
    finally:
        if unpatch:
            unpatch()
    print(f"{tag:24s} {tps:9.1f} tok/s", flush=True)
    return tps


def main():
    from dmx_compressor_tpu.models.opt import OPTConfig
    import dmx_compressor_tpu.ops.compress as C
    import dmx_compressor_tpu.ops.basic_attention as BA
    import dmx_compressor_tpu.models.opt as OPT

    name = sys.argv[1] if len(sys.argv) > 1 else "opt-125m"
    cfg = {
        "opt-125m": OPTConfig.opt_125m,
        "opt-1.3b": OPTConfig.opt_1_3b,
    }[name]()

    base = run_variant("baseline", cfg, mode="baseline")
    full = run_variant("basic(full)", cfg)

    orig_fusable = C.PackedBFPLinear._fusable
    run_variant(
        "basic no-fused-linear", cfg,
        patch=lambda: setattr(C.PackedBFPLinear, "_fusable", lambda s, x: False),
        unpatch=lambda: setattr(C.PackedBFPLinear, "_fusable", orig_fusable),
    )
    orig_shape = BA.basic_sdpa_shape
    run_variant(
        "basic no-fused-sdpa", cfg,
        patch=lambda: setattr(OPT, "__dummy__", None) or setattr(
            sys.modules["dmx_compressor_tpu.ops.basic_attention"],
            "basic_sdpa_shape", lambda *a, **k: None),
        unpatch=lambda: setattr(
            sys.modules["dmx_compressor_tpu.ops.basic_attention"],
            "basic_sdpa_shape", orig_shape),
    )

    # strip everything except Linear casts (isolate linear cost)
    from dmx_compressor_tpu.functional.approximate import NoApproximation
    from dmx_compressor_tpu.nn import modules as dmxnn
    from dmx_compressor_tpu.modeling.model import DmxModel

    orig_basic = DmxModel.to_basic_mode

    def linonly(dm):
        orig_basic(dm)
        for _, m in dm.named_dmx_modules():
            if not isinstance(m, dmxnn.Linear):
                m.input_casts.set_format(["SAME"] * len(m.input_casts))
                m.output_casts.set_format(["SAME"] * len(m.output_casts))
                m.approximator.function = NoApproximation()

    def nonlin(dm):
        orig_basic(dm)
        for _, m in dm.named_dmx_modules():
            if isinstance(m, dmxnn.Linear):
                m.input_casts.set_format(["SAME"] * len(m.input_casts))
                m.output_casts.set_format(["SAME"] * len(m.output_casts))
                m.approximator.function = NoApproximation()

    run_variant(
        "basic linear-casts-only", cfg,
        patch=lambda: setattr(DmxModel, "to_basic_mode", linonly),
        unpatch=lambda: setattr(DmxModel, "to_basic_mode", orig_basic),
    )
    run_variant(
        "basic nonlinear-only", cfg,
        patch=lambda: setattr(DmxModel, "to_basic_mode", nonlin),
        unpatch=lambda: setattr(DmxModel, "to_basic_mode", orig_basic),
    )

    def only(pred):
        def f(dm):
            orig_basic(dm)
            for name, m in dm.named_dmx_modules():
                if not pred(name, m):
                    m.input_casts.set_format(["SAME"] * len(m.input_casts))
                    m.output_casts.set_format(["SAME"] * len(m.output_casts))
                    m.approximator.function = NoApproximation()
        return f

    for tag, pred in (
        ("only-layernorm", lambda n, m: isinstance(m, dmxnn.LayerNorm)),
        ("only-sdpa", lambda n, m: "sdpa" in n),
        ("only-resadd", lambda n, m: isinstance(m, dmxnn.ResAdd) and "sdpa" not in n),
        ("only-relu+embed", lambda n, m: isinstance(m, (dmxnn.ReLU, dmxnn.Embedding))),
    ):
        run_variant(
            f"basic {tag}", cfg,
            patch=(lambda p=pred: setattr(DmxModel, "to_basic_mode", only(p))),
            unpatch=lambda: setattr(DmxModel, "to_basic_mode", orig_basic),
        )
    print(f"ratio full/base = {full / base:.3f}", flush=True)


if __name__ == "__main__":
    main()
