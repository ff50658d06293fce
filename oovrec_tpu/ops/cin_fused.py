"""Fused CIN layer (xDeepFM) — Pallas TPU kernel.

One CIN layer computes, per batch row b and embedding lane d,
    out[b, l, d] = relu( Σ_{h,f} A[b,h,d]·B0[b,f,d]·W[h·F+f, l] + bias[l] )
(`ref:xdeepfm.py:134-193`: pairwise Hadamard feature maps + a 1×1 conv
over the pair axis). The XLA formulation materializes the Hadamard slab
z = (B, H, F, D) to HBM (~92 MB per wide layer at bench shapes) and reads
it back for the conv — the profiled step spends ~⅔ of its time moving
that slab (EXPERIMENTS.md round 4). This kernel forms z one (d, b-tile)
slice at a time in VMEM and feeds the MXU directly; HBM sees only A, B0,
W and the output.

Layout: everything rides **batch-minor** — A' (H, D, B), B0' (F, D, B),
out' (L, D, B) — so the 128-lane axis is the batch for every load/store
and the next CIN layer consumes the previous output without a transpose.
Kernel I/O is f32 (Mosaic only supports non-no-op minor-dim insertion on
32-bit types, which middle-index slicing of 3D blocks needs); the MXU
dots run in `mxu_dtype` (bf16 under the production precision policy).

Backward is a second kernel (custom VJP): recomputes z per tile, masks
through the saved activations, accumulates dW across sequential grid
steps, and contracts dz back to dA/dB0 on the VPU.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tiles(B: int, D: int, cap: int):
    """(TB, DS): batch tile (lane axis, >=128 per Mosaic) and D slice such
    that the merged (DS·TB) working width stays under `cap` — the kernels
    hold a few (H·F, DS·TB) f32 temporaries, so this is the VMEM knob."""
    TB = next((t for t in (256, 128) if B % t == 0), B)
    DS = D
    while DS * TB > cap and DS % 2 == 0 and (DS // 2) % 8 == 0:
        DS //= 2
    if DS * TB > cap and D % 8 == 0:
        DS = 8
    return TB, DS


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _make_fwd_kernel(mxu):
    def _fwd_kernel(a_ref, b_ref, w_ref, bias_ref, out_ref):
        H, D, TB = a_ref.shape
        F = b_ref.shape[0]
        L = w_ref.shape[1]
        w = w_ref[:].astype(mxu)           # (H*F, L)
        bias = bias_ref[:]                 # (1, L)
        # one MXU call per tile: the (d, tb) axes merge into one lane
        # axis (they're contiguous in the row-major block), so the whole
        # Hadamard slab for this tile is a single (H·F, D·TB) VMEM value
        a2 = a_ref[:].reshape(H, D * TB)
        b2 = b_ref[:].reshape(F, D * TB)
        z = (a2[:, None, :] * b2[None, :, :]).reshape(
            H * F, D * TB
        ).astype(mxu)
        o = jax.lax.dot_general(
            w, z, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                  # (L, D·TB)
        out_ref[:] = jnp.maximum(
            o + bias.reshape(-1, 1), 0.0
        ).reshape(L, D, TB)

    return _fwd_kernel


def _make_bwd_kernel(mxu):
    def _bwd_kernel(a_ref, b_ref, w_ref, out_ref, g_ref,
                    da_ref, db_ref, dw_ref, dbias_ref):
        H, D, TB = a_ref.shape
        F = b_ref.shape[0]
        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        @pl.when(first)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        w = w_ref[:].astype(mxu)           # (H*F, L)
        L = w_ref.shape[1]
        a2 = a_ref[:].reshape(H, D * TB)
        b2 = b_ref[:].reshape(F, D * TB)
        mask = (out_ref[:].reshape(L, D * TB) > 0).astype(jnp.float32)
        dpre = g_ref[:].reshape(L, D * TB) * mask
        z = (a2[:, None, :] * b2[None, :, :]).reshape(H * F, D * TB)
        # dW += z @ dpreᵀ : (HF, D·TB) x (L, D·TB) → (HF, L)
        dw_ref[:] = dw_ref[:] + jax.lax.dot_general(
            z.astype(mxu), dpre.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dz = W @ dpre : (HF, L) x (L, D·TB) → (HF, D·TB)
        dz = jax.lax.dot_general(
            w, dpre.astype(mxu), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz3 = dz.reshape(H, F, D * TB)
        da_ref[:] = jnp.sum(
            dz3 * b2[None, :, :], axis=1
        ).reshape(H, D, TB)
        db_ref[:] = jnp.sum(
            dz3 * a2[:, None, :], axis=0
        ).reshape(F, D, TB)
        # dbias accumulates in-kernel: recomputing the relu mask outside
        # re-reads out+g from HBM (~315 MB/step at bench shapes)
        dbias_ref[:] = dbias_ref[:] + jnp.sum(
            dpre, axis=1, keepdims=True
        ).reshape(1, -1)

    return _bwd_kernel


def _fwd_call(a, b0, w, bias, mxu):
    H, D, B = a.shape
    F = b0.shape[0]
    L = w.shape[1]
    TB, DS = _tiles(B, D, cap=4096)
    grid = (B // TB, D // DS)
    return pl.pallas_call(
        _make_fwd_kernel(mxu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, DS, TB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, DS, TB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H * F, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, DS, TB), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, D, B), jnp.float32),
        interpret=_interpret(),
    )(a, b0, w, bias.reshape(1, L))


def _bwd_call(a, b0, w, out, g, mxu):
    H, D, B = a.shape
    F = b0.shape[0]
    L = w.shape[1]
    TB, DS = _tiles(B, D, cap=2048)
    grid = (B // TB, D // DS)
    return pl.pallas_call(
        _make_bwd_kernel(mxu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, DS, TB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, DS, TB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H * F, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, DS, TB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, DS, TB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((H, DS, TB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, DS, TB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            # every grid step revisits the SAME (HF, L) / (1, L) blocks —
            # grid execution is sequential on TPU, so += accumulation is
            # safe
            pl.BlockSpec((H * F, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, D, B), jnp.float32),
            jax.ShapeDtypeStruct((F, D, B), jnp.float32),
            jax.ShapeDtypeStruct((H * F, L), jnp.float32),
            jax.ShapeDtypeStruct((1, L), jnp.float32),
        ],
        interpret=_interpret(),
    )(a, b0, w, out, g)


@lru_cache(maxsize=4)
def _make_cin_layer(mxu_name: str):
    mxu = jnp.dtype(mxu_name)

    @jax.custom_vjp
    def f(a, b0, w, bias):
        return _fwd_call(a, b0, w, bias, mxu)

    def fwd(a, b0, w, bias):
        out = _fwd_call(a, b0, w, bias, mxu)
        return out, (a, b0, w, out)

    def bwd(res, g):
        a, b0, w, out = res
        da, db, dw, dbias = _bwd_call(a, b0, w, out, g, mxu)
        return (da.astype(a.dtype), db.astype(b0.dtype),
                dw.astype(w.dtype), dbias.reshape(-1).astype(w.dtype))

    f.defvjp(fwd, bwd)
    return f


def cin_layer(a, b0, w, bias, mxu_dtype="float32"):
    """relu(Hadamard-pair conv) for one CIN layer.

    a    (H, D, B)  previous hidden, batch-minor, f32
    b0   (F, D, B)  layer-0 features, batch-minor, f32
    w    (H*F, L)   conv kernel (pair axis h·F+f — the reference's
                    z-reshape ordering, `xdeepfm.py:156-170`), f32
    bias (L,)       f32
    mxu_dtype       dtype the MXU dots run in ('bfloat16' under the
                    production precision policy; accumulation is f32)
    → out (L, D, B) f32
    """
    return _make_cin_layer(str(jnp.dtype(mxu_dtype)))(a, b0, w, bias)


# --------------------------------------------------------------------
# Pooled split-free form (round 5): the model only ever consumes the
# direct-connect half of a CIN layer through `sum over D` — so the
# kernel pools it in VMEM and writes (Lp, B) instead of (Lp, D, B),
# and emits the next-layer hidden as a SECOND output (no jnp.split /
# pad copies between layers: the round-5 trace showed 0.39 ms/step of
# pad_maximum fusions from the split alone). Kernel I/O rides bf16
# when the (DS, TB) block is (16, 128)-aligned — under the bf16
# precision policy this halves every slab's HBM traffic.


def cin_io_dtype(D: int, B: int, mxu_dtype) -> jnp.dtype:
    """The dtype `cin_layer_pooled` wants its a/b0 operands in: bf16
    when the policy is bf16 and both the fwd and bwd block layouts are
    (16, 128)-tileable, else f32."""
    mxu = jnp.dtype(mxu_dtype)
    if mxu != jnp.bfloat16:
        return jnp.dtype(jnp.float32)
    for cap in (4096, 2048):
        TB, DS = _tiles(B, D, cap=cap)
        if DS % 16 or TB % 128:
            return jnp.dtype(jnp.float32)
    return jnp.dtype(jnp.bfloat16)


def _make_pooled_fwd(mxu, io, nh, pool_all):
    def _kernel(a_ref, b_ref, w_ref, bias_ref, *out_refs):
        H, DS, TB = a_ref.shape
        F = b_ref.shape[0]
        L = w_ref.shape[1]
        ps = 0 if pool_all else nh
        w = w_ref[:].astype(mxu)
        bias = bias_ref[:]
        a2 = a_ref[:].astype(mxu).reshape(H, DS * TB)
        b2 = b_ref[:].astype(mxu).reshape(F, DS * TB)
        z = (a2[:, None, :] * b2[None, :, :]).reshape(H * F, DS * TB)
        o = jax.lax.dot_general(
            w, z, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o3 = jnp.maximum(o + bias.reshape(-1, 1), 0.0).reshape(L, DS, TB)
        refs = list(out_refs)
        if nh:
            refs.pop(0)[:] = o3[:nh].astype(io)
        pooled_ref = refs[0]
        po = jnp.sum(o3[ps:], axis=1)          # (Lp, TB) f32

        @pl.when(pl.program_id(1) == 0)
        def _():
            pooled_ref[:] = jnp.zeros_like(pooled_ref)

        pooled_ref[:] = pooled_ref[:] + po

    return _kernel


def _make_pooled_bwd(mxu, io, nh, pool_all):
    def _kernel(a_ref, b_ref, w_ref, bias_ref, *refs):
        H, DS, TB = a_ref.shape
        F = b_ref.shape[0]
        L = w_ref.shape[1]
        ps = 0 if pool_all else nh
        Lp = L - ps
        refs = list(refs)
        gh_ref = refs.pop(0) if nh else None
        gp_ref = refs.pop(0)
        da_ref, db_ref, dw_ref, dbias_ref = refs
        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        @pl.when(first)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

        w = w_ref[:].astype(mxu)
        a2 = a_ref[:].astype(mxu).reshape(H, DS * TB)
        b2 = b_ref[:].astype(mxu).reshape(F, DS * TB)
        z = (a2[:, None, :] * b2[None, :, :]).reshape(H * F, DS * TB)
        pre = jax.lax.dot_general(
            w, z, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[:].reshape(-1, 1)          # (L, DS*TB) f32
        gp = gp_ref[:]                          # (Lp, TB) f32
        gpb = jnp.broadcast_to(
            gp[:, None, :], (Lp, DS, TB)
        ).reshape(Lp, DS * TB)
        if nh and pool_all:                     # direct mode: both paths
            dpre = gh_ref[:].astype(jnp.float32).reshape(
                nh, DS * TB) + gpb
        elif nh:
            dpre = jnp.concatenate(
                [gh_ref[:].astype(jnp.float32).reshape(nh, DS * TB),
                 gpb], axis=0)
        else:
            dpre = gpb
        dpre = jnp.where(pre > 0, dpre, 0.0)
        dw_ref[:] = dw_ref[:] + jax.lax.dot_general(
            z.astype(mxu), dpre.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbias_ref[:] = dbias_ref[:] + jnp.sum(
            dpre, axis=1, keepdims=True
        ).reshape(1, -1)
        dz = jax.lax.dot_general(
            w, dpre.astype(mxu), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz3 = dz.reshape(H, F, DS * TB)
        da_ref[:] = jnp.sum(
            dz3 * b2.astype(jnp.float32)[None, :, :], axis=1
        ).reshape(H, DS, TB).astype(io)
        db_ref[:] = jnp.sum(
            dz3 * a2.astype(jnp.float32)[:, None, :], axis=0
        ).reshape(F, DS, TB).astype(io)

    return _kernel


def _pooled_fwd_call(a, b0, w, bias, mxu, io, nh, pool_all):
    H, D, B = a.shape
    F = b0.shape[0]
    L = w.shape[1]
    ps = 0 if pool_all else nh
    Lp = L - ps
    TB, DS = _tiles(B, D, cap=4096)
    grid = (B // TB, D // DS)
    tile3 = lambda n: pl.BlockSpec(  # noqa: E731
        (n, DS, TB), lambda i, j: (0, j, i), memory_space=pltpu.VMEM)
    out_specs = []
    out_shape = []
    if nh:
        out_specs.append(tile3(nh))
        out_shape.append(jax.ShapeDtypeStruct((nh, D, B), io))
    # pooled is revisited across the D grid axis (sequential on TPU) —
    # the kernel zero-inits at j == 0 and accumulates
    out_specs.append(pl.BlockSpec((Lp, TB), lambda i, j: (0, i),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((Lp, B), jnp.float32))
    res = pl.pallas_call(
        _make_pooled_fwd(mxu, io, nh, pool_all),
        grid=grid,
        in_specs=[
            tile3(H), tile3(F),
            pl.BlockSpec((H * F, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(a, b0, w, bias.reshape(1, L))
    if nh:
        return res[0], res[1]
    return None, res[0]


def _pooled_bwd_call(a, b0, w, bias, gh, gp, mxu, io, nh, pool_all):
    H, D, B = a.shape
    F = b0.shape[0]
    L = w.shape[1]
    ps = 0 if pool_all else nh
    Lp = L - ps
    # a wider (cap 4096) batch tile fits under bf16 I/O but measured
    # SLOWER (6.65 vs 5.73 ms/step at bench shapes — VMEM pressure
    # degrades the dot pipelining); keep the 2048 tile
    TB, DS = _tiles(B, D, cap=2048)
    grid = (B // TB, D // DS)
    tile3 = lambda n: pl.BlockSpec(  # noqa: E731
        (n, DS, TB), lambda i, j: (0, j, i), memory_space=pltpu.VMEM)
    in_specs = [
        tile3(H), tile3(F),
        pl.BlockSpec((H * F, L), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [a, b0, w, bias.reshape(1, L)]
    if nh:
        in_specs.append(tile3(nh))
        args.append(gh)
    in_specs.append(pl.BlockSpec((Lp, TB), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM))
    args.append(gp)
    return pl.pallas_call(
        _make_pooled_bwd(mxu, io, nh, pool_all),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            tile3(H), tile3(F),
            pl.BlockSpec((H * F, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, D, B), io),
            jax.ShapeDtypeStruct((F, D, B), io),
            jax.ShapeDtypeStruct((H * F, L), jnp.float32),
            jax.ShapeDtypeStruct((1, L), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)


@lru_cache(maxsize=32)
def _make_cin_pooled(mxu_name: str, io_name: str, nh: int,
                     pool_all: bool):
    mxu = jnp.dtype(mxu_name)
    io = jnp.dtype(io_name)

    @jax.custom_vjp
    def f(a, b0, w, bias):
        return _pooled_fwd_call(a, b0, w, bias, mxu, io, nh, pool_all)

    def fwd(a, b0, w, bias):
        out = _pooled_fwd_call(a, b0, w, bias, mxu, io, nh, pool_all)
        return out, (a, b0, w, bias)

    def bwd(res, g):
        a, b0, w, bias = res
        gh, gp = g
        if nh and gh is None:  # hidden output unused downstream
            gh = jnp.zeros((nh,) + a.shape[1:], io)
        da, db, dw, dbias = _pooled_bwd_call(
            a, b0, w, bias, gh, gp, mxu, io, nh, pool_all)
        return (da.astype(a.dtype), db.astype(b0.dtype),
                dw.astype(w.dtype), dbias.reshape(-1).astype(w.dtype))

    f.defvjp(fwd, bwd)
    return f


def cin_layer_pooled(a, b0, w, bias, mxu_dtype="float32",
                     n_hidden: int = 0, pool_all: bool = False):
    """One CIN layer, split-free: returns `(hidden, pooled)` where
    `hidden = relu(conv)[:n_hidden]` (next layer's input, `None` when
    `n_hidden == 0`) and `pooled = Σ_D relu(conv)[pool_start:]` with
    `pool_start = 0 if pool_all else n_hidden` — i.e. the sum-pooled
    direct-connect rows the model feeds `cin_linear`
    (`ref:xdeepfm.py:171-193`: split → pool(sum over D) → concat).

    a (H, D, B), b0 (F, D, B) in `cin_io_dtype(D, B, mxu_dtype)`;
    w (H·F, L), bias (L,) f32. hidden rides the io dtype, pooled f32.
    """
    io = cin_io_dtype(a.shape[1], a.shape[2], mxu_dtype)
    return _make_cin_pooled(
        str(jnp.dtype(mxu_dtype)), str(io), int(n_hidden), bool(pool_all)
    )(a, b0, w, bias)


def cin_layer_reference(a, b0, w, bias, mxu_dtype="float32"):
    """XLA reference of the same math (used by tests and as the non-TPU
    fallback in the model): materializes the Hadamard slab."""
    H, D, B = a.shape
    F = b0.shape[0]
    mxu = jnp.dtype(mxu_dtype)
    z = jnp.einsum(
        "hdb,fdb->hfdb", a.astype(jnp.float32), b0.astype(jnp.float32)
    ).reshape(H * F, D, B)
    o = jnp.einsum(
        "kdb,kl->ldb", z.astype(mxu), w.astype(mxu),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(
        o + bias.astype(jnp.float32)[:, None, None], 0.0
    ).astype(jnp.float32)
