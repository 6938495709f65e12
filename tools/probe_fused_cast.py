"""Granular Mosaic probes for the fused BASIC-linear kernel building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def run(name, kernel, x, out_shape, ref_fn):
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape)(x)
        ref = ref_fn(x)
        ok = bool(jnp.array_equal(out, ref))
        print(f"{name}: compiled, exact={ok}")
        return ok
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        print(f"{name}: FAILED: {type(e).__name__}: {msg}")
        return False


def main():
    print("devices:", jax.devices())
    B, bm, bk = 64, 8, 768
    nb = bk // B
    x = jax.random.normal(jax.random.key(0), (bm, bk), jnp.float32)

    # (a) reshape split lanes only
    run(
        "a_reshape_split",
        lambda x_ref, o_ref: o_ref.__setitem__(
            slice(None), x_ref[:].reshape(bm, nb, B).reshape(bm, bk)
        ),
        x,
        jax.ShapeDtypeStruct((bm, bk), jnp.float32),
        lambda x: x,
    )

    # (b) reshape split + max, 2D out
    def kb(x_ref, o_ref):
        o_ref[:] = jnp.max(jnp.abs(x_ref[:]).reshape(bm, nb, B), axis=-1)

    run(
        "b_split_max",
        kb,
        x,
        jax.ShapeDtypeStruct((bm, nb), jnp.float32),
        lambda x: jnp.max(jnp.abs(x).reshape(bm, nb, B), axis=-1),
    )

    # (c) bitcast + shifts (exponent extraction) elementwise
    def kc(x_ref, o_ref):
        bits = jax.lax.bitcast_convert_type(x_ref[:], jnp.int32)
        e = ((bits >> 23) & 0xFF) - 127
        o_ref[:] = e.astype(jnp.float32)

    run(
        "c_bitcast_exp",
        kc,
        x,
        jax.ShapeDtypeStruct((bm, bk), jnp.float32),
        lambda x: (
            ((jax.lax.bitcast_convert_type(x, jnp.int32) >> 23) & 0xFF) - 127
        ).astype(jnp.float32),
    )

    # (d) pow2 construction via int shift + bitcast
    def kd(x_ref, o_ref):
        k = jnp.clip(x_ref[:].astype(jnp.int32), -10, 10)
        bits = (k + 127) << 23
        o_ref[:] = jax.lax.bitcast_convert_type(bits, jnp.float32)

    run(
        "d_pow2",
        kd,
        x,
        jax.ShapeDtypeStruct((bm, bk), jnp.float32),
        lambda x: jax.lax.bitcast_convert_type(
            (jnp.clip(x.astype(jnp.int32), -10, 10) + 127) << 23, jnp.float32
        ),
    )

    # (e) jnp.round (half-even)
    run(
        "e_round",
        lambda x_ref, o_ref: o_ref.__setitem__(slice(None), jnp.round(x_ref[:] * 3.7)),
        x,
        jax.ShapeDtypeStruct((bm, bk), jnp.float32),
        lambda x: jnp.round(x * 3.7),
    )

    # (f) fp16 roundtrip epilogue
    def kf(x_ref, o_ref):
        y = jnp.clip(x_ref[:], -65504.0, 65504.0).astype(jnp.float16)
        y = jnp.where(jnp.abs(y) < jnp.float16(6.103515625e-05), jnp.float16(0), y)
        o_ref[:] = y.astype(jnp.float32)

    run(
        "f_fp16_epilogue",
        kf,
        x,
        jax.ShapeDtypeStruct((bm, bk), jnp.float32),
        lambda x: jnp.where(
            jnp.abs(jnp.clip(x, -65504.0, 65504.0).astype(jnp.float16))
            < jnp.float16(6.103515625e-05),
            jnp.float16(0),
            jnp.clip(x, -65504.0, 65504.0).astype(jnp.float16),
        ).astype(jnp.float32),
    )

    # (g) 3D input block (pre-reshaped outside) + max + broadcast + merge back
    x3 = x.reshape(bm, nb, B)

    def kg(x_ref, o_ref):
        a = jnp.abs(x_ref[:])
        amax = jnp.max(a, axis=-1, keepdims=True)
        o_ref[:] = jnp.broadcast_to(amax, (bm, nb, B))

    run(
        "g_3dblock_max",
        kg,
        x3,
        jax.ShapeDtypeStruct((bm, nb, B), jnp.float32),
        lambda x3: jnp.broadcast_to(
            jnp.max(jnp.abs(x3), axis=-1, keepdims=True), (bm, nb, B)
        ),
    )

    # (h) expansion dot from a [bm, nb] operand (no reshape involved)
    e_in = jnp.max(jnp.abs(x).reshape(bm, nb, B), axis=-1)

    def kh(e_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, bk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (nb, bk), 1)
        expand = (cols // B == rows).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            e_ref[:], expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    run(
        "h_expand_dot",
        kh,
        e_in,
        jax.ShapeDtypeStruct((bm, bk), jnp.float32),
        lambda e: jnp.repeat(e, B, axis=-1),
    )


if __name__ == "__main__":
    main()
