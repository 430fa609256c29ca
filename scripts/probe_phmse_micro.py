"""Incremental hardware bisection of the fused-MSE head kernel's runtime
INTERNAL crash (scripts/probe_phmse.py compiles clean but dies at first
execution on the tunneled v5e).

Variants add one suspect construct at a time on top of the PROVEN _phead
fwd kernel body (which runs for hours in the AE bench program):

    spec    — phmse's exact in/out specs (12-lane tpack, 6-lane tpoles,
              (k,1,8) f32 out), trivial body (write zeros)
    iota_mm — + 2-D broadcasted_iota selector S and the (k,rows)@(rows,F)
              MXU matmul, consuming tpack as the data
    head    — + one phase's real compute (affine+relu+1x1 matmul+tanh)
    corner  — + the pole corner extraction v[:, c, 0/h-1, 0/w-1, :]
    full    — everything = the real fwd kernel recipe

Usage (detached, never under timeout):
    PROBE_VARIANT=spec PROBE_BS=36 python scripts/probe_phmse_micro.py
Small-shape mode (fast compiles, separates op-lowering from VMEM issues):
    PROBE_S=3 PROBE_CIN=16 PROBE_BS=4 ...
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    variant = os.environ.get("PROBE_VARIANT", "spec")
    B = int(os.environ.get("PROBE_BS", "36"))
    s = int(os.environ.get("PROBE_S", "5"))
    cin = int(os.environ.get("PROBE_CIN", "64"))
    k = int(os.environ.get("PROBE_K", "2"))
    F = 3
    h, w = (1 << s) // 2, (1 << (s + 1)) // 2
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    mk = lambda i, *shape: jax.random.normal(ks[i], shape, jnp.float32)

    b0 = tuple(mk(p, B, 5, h, w, cin).astype(dt) for p in range(4))
    y10 = tuple(mk(4 + p, B, 5, h, w, cin).astype(dt) for p in range(4))
    affs = [mk(8 + i, cin) * 0.1 + 1.0 for i in range(4)]
    Wh = (mk(12, cin, F) * 0.05).astype(dt)
    bh = mk(13, F) * 0.05
    tpack = mk(14, B, 5, h, w, 4 * F) * 0.3
    tpoles = mk(15, B, 2 * F) * 0.3

    def kernel(*refs, variant):
        tb0 = refs[0:4]
        ty10 = refs[4:8]
        mul1, add1 = refs[8][0], refs[9][0]
        mul2, add2 = refs[10][0], refs[11][0]
        KW, kb = refs[12], refs[13]
        tpack_ref, tpole_ref = refs[14], refs[15]
        out_ref = refs[16]
        n = k * 5
        rows = n * h * w
        rows_per = 5 * h * w
        if variant == "spec":
            out_ref[...] = jnp.zeros((k, 1, 8), jnp.float32)
            return
        sample_of_row = (
            jax.lax.broadcasted_iota(jnp.int32, (k, rows), 1) // rows_per
        )
        sample_id = jax.lax.broadcasted_iota(jnp.int32, (k, rows), 0)
        S = (sample_of_row == sample_id).astype(jnp.float32)
        if variant == "lane_slice":
            # the library kernel's unaligned lane slices: offsets 3/6/9 of
            # the 12-lane packed target (micro `corner` only used offset 0)
            acc = jnp.zeros((k, F), jnp.float32)
            for p in range(4):
                dd = (tpack_ref[...][..., p * F : (p + 1) * F]
                      .astype(jnp.float32).reshape(rows, F))
                acc += jnp.dot(S, dd * dd, preferred_element_type=jnp.float32)
            sse2 = jnp.dot(acc, jnp.ones((F, 1), jnp.float32),
                           preferred_element_type=jnp.float32)
            out_ref[...] = jnp.pad(sse2, ((0, 0), (0, 7))).reshape(k, 1, 8)
            return
        if variant == "four_phase":
            # all four phases' full compute at k (the real fwd kernel body,
            # minus pole corners), but reading the target at offset 0 only —
            # separates "4x compute/VMEM" from "unaligned lane slicing"
            acc = jnp.zeros((k, F), jnp.float32)
            for p in range(4):
                a32p = tb0[p][...].reshape(n, h, w, cin).astype(jnp.float32)
                b32p = ty10[p][...].reshape(n, h, w, cin).astype(jnp.float32)
                prep = a32p * mul1 + add1 + b32p * mul2 + add2
                tt = jnp.maximum(prep, 0.0).astype(dt).reshape(rows, cin)
                zz = jnp.dot(tt, KW[...], preferred_element_type=jnp.float32)
                zz = (zz + kb[0].astype(jnp.float32)).astype(dt).astype(jnp.float32)
                vv = jnp.tanh(zz).reshape(k, 5, h, w, F)
                d = vv - tpack_ref[...][..., 0:F].astype(jnp.float32)
                acc += jnp.dot(S, (d * d).reshape(rows, F),
                               preferred_element_type=jnp.float32)
            sse2 = jnp.dot(acc, jnp.ones((F, 1), jnp.float32),
                           preferred_element_type=jnp.float32)
            out_ref[...] = jnp.pad(sse2, ((0, 0), (0, 7))).reshape(k, 1, 8)
            return
        if variant == "iota_mm":
            dd = tpack_ref[...][..., 0:F].astype(jnp.float32).reshape(rows, F)
            acc = jnp.dot(S, dd * dd, preferred_element_type=jnp.float32)
            sse2 = jnp.dot(acc, jnp.ones((F, 1), jnp.float32),
                           preferred_element_type=jnp.float32)
            out_ref[...] = jnp.pad(sse2, ((0, 0), (0, 7))).reshape(k, 1, 8)
            return
        # one phase's real head compute
        a32 = tb0[0][...].reshape(n, h, w, cin).astype(jnp.float32)
        b32 = ty10[0][...].reshape(n, h, w, cin).astype(jnp.float32)
        pre = a32 * mul1 + add1 + b32 * mul2 + add2
        t = jnp.maximum(pre, 0.0).astype(dt).reshape(rows, cin)
        z = jnp.dot(t, KW[...], preferred_element_type=jnp.float32)
        z = (z + kb[0].astype(jnp.float32)).astype(dt).astype(jnp.float32)
        v = jnp.tanh(z).reshape(k, 5, h, w, F)
        d = v - tpack_ref[...][..., 0:F].astype(jnp.float32)
        acc = jnp.dot(S, (d * d).reshape(rows, F),
                      preferred_element_type=jnp.float32)
        if variant == "head":
            sse2 = jnp.dot(acc, jnp.ones((F, 1), jnp.float32),
                           preferred_element_type=jnp.float32)
            out_ref[...] = jnp.pad(sse2, ((0, 0), (0, 7))).reshape(k, 1, 8)
            return
        fifth = jnp.asarray(0.2, jnp.float32)
        pn = sum(v[:, c, 0, 0, :] for c in range(5)) * fifth
        ps = sum(v[:, c, h - 1, w - 1, :] for c in range(5)) * fifth
        tp = tpole_ref[...].reshape(k, 2 * F).astype(jnp.float32)
        dn = pn - tp[:, 0:F]
        ds_ = ps - tp[:, F : 2 * F]
        sse2 = jnp.dot(acc + dn * dn + ds_ * ds_, jnp.ones((F, 1), jnp.float32),
                       preferred_element_type=jnp.float32)
        out_ref[...] = jnp.pad(sse2, ((0, 0), (0, 7))).reshape(k, 1, 8)
        # "corner"/"full" share this path (full == the library kernel's
        # recipe once all four phases are added; one phase is enough to
        # reproduce an op-level fault)

    if variant in ("library_body", "library_cost", "library_jit"):
        # the REAL fwd kernel body under micro's specs — isolates body
        # interaction from spec/cost-estimate differences. library_cost
        # additionally applies the library's CostEstimate.
        from geniconet_tpu.ops.pallas import phase_kernel as _pk

        kern = functools.partial(
            _pk._phmse_fwd_kernel, h=h, w=w, k=k, cin=cin, F=F, cdtype=dt
        )
        blk2 = lambda shape: pl.BlockSpec(
            shape, lambda b: (b,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM)
        cst2 = lambda shape: pl.BlockSpec(
            shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
        in_specs = [blk2((k, 5, h, w, cin))] * 8
        in_specs += [cst2((1, cin))] * 4
        in_specs += [cst2((cin, F)), cst2((1, F))]
        in_specs += [blk2((k, 5, h, w, 4 * F)), blk2((k, 1, 2 * F))]
        args = (
            list(b0) + list(y10)
            + [v.reshape(1, cin) for v in affs]
            + [Wh, bh.reshape(1, F), tpack, tpoles.reshape(B, 1, 2 * F)]
        )
        extra = {}
        if variant == "library_cost":
            extra["cost_estimate"] = pl.CostEstimate(
                flops=2 * B * 5 * h * w * 4 * cin * F,
                bytes_accessed=B * 5 * h * w * cin * 2 * 8,
                transcendentals=0,
            )
        call = pl.pallas_call(
            kern,
            grid=(B // k,),
            in_specs=in_specs,
            out_specs=blk2((k, 1, 8)),
            out_shape=jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            **extra,
        )
        if variant == "library_jit":
            # one jitted program with XLA ops around the custom call — the
            # library probe's shape (jit(sum(phmse(...)))); bisects
            # program-level interaction from the bare custom call
            out = jax.jit(lambda *a: jnp.sum(call(*a)[:, 0, 0]))(*args)
            val = np.asarray(jax.device_get(out)).reshape(1, 1, 1)
        else:
            out = call(*args)
            val = np.asarray(jax.device_get(out))
        assert np.all(np.isfinite(val)), val
        print(f"probe_phmse_micro variant={variant} B={B} s={s} cin={cin} "
              f"k={k}: OK (out[0]={val[0,0,0]:.4f})", flush=True)
        return

    blk = lambda shape: pl.BlockSpec(
        shape, lambda b: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    cst = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [blk((k, 5, h, w, cin))] * 8
    in_specs += [cst((1, cin))] * 4
    in_specs += [cst((cin, F)), cst((1, F))]
    in_specs += [blk((k, 5, h, w, 4 * F)), blk((k, 1, 2 * F))]
    args = (
        list(b0) + list(y10)
        + [v.reshape(1, cin) for v in affs]
        + [Wh, bh.reshape(1, F), tpack, tpoles.reshape(B, 1, 2 * F)]
    )
    out = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=blk((k, 1, 8)),
        out_shape=jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    val = np.asarray(jax.device_get(out))
    assert np.all(np.isfinite(val)), val
    print(f"probe_phmse_micro variant={variant} B={B} s={s} cin={cin} k={k}: "
          f"OK (out[0]={val[0,0,0]:.4f})", flush=True)


if __name__ == "__main__":
    main()
