"""One-off TPU experiment: where does the SQ8 select's time go?

val_sq8 run 1: select net 14ms @1M / 30.7ms @10M / 48.6ms @20M — a huge
~12ms fixed cost + ~290 GB/s marginal vs the tree kernel's 2.6ms @1M bf16
and 580 GB/s. Variants isolate the delta:

  tree      exact tree kernel on a bf16 corpus (reference point)
  sq8       production sq8_candidates (int8 + scal2 + bound FMA + qn)
  sq8_bf16  same kernel structure, corpus pre-widened to bf16 (isolates
            the int8->bf16 in-kernel conversion)
  sq8_nosc  int8 corpus, bounds = raw dot (no scal2 stream, no FMA)
  kernel-only vs +merge (approx_max_k/certs) split for sq8

Run: PYTHONPATH=/root/repo python scripts/exp_sq8_perf.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D, Q = 512, 48


def log(m):
    print(m, flush=True)


def p50(fn, iters=9):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from evossearch_tpu.index.sq8 import _sq8_select, quantize_rows_device
    from evossearch_tpu.ops.topk_pallas import (
        LANES, SQ8_TILE_ROWS, TREE_CLASSES, _make_tree_kernel,
        _tree_reduce_emit, _tree_candidates, sq8_candidates,
    )

    trivial = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,))
    np.asarray(trivial(z))
    log(f"devices: {jax.devices()}")
    floor = p50(lambda: trivial(z), iters=9)
    log(f"floor {floor:.1f}ms")

    tile = SQ8_TILE_ROWS

    def variant_call(e, scal2, qp, qn, kern_factory, extra_scal):
        n, d = e.shape
        grid = pl.cdiv(n, tile)
        cand_block = pl.BlockSpec((LANES, 2 * TREE_CLASSES), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        cert_block = pl.BlockSpec((LANES, TREE_CLASSES), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        outs = (
            jax.ShapeDtypeStruct((LANES, grid * 2 * TREE_CLASSES), jnp.float32),
            jax.ShapeDtypeStruct((LANES, grid * 2 * TREE_CLASSES), jnp.int32),
            jax.ShapeDtypeStruct((LANES, grid * TREE_CLASSES), jnp.float32),
        )
        in_specs = [
            pl.BlockSpec((LANES, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        args = [qp, qn, e]
        if extra_scal:
            in_specs.append(pl.BlockSpec((2, tile), lambda i: (0, i),
                                         memory_space=pltpu.VMEM))
            args.append(scal2)
        return pl.pallas_call(
            kern_factory(n, d),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=(cand_block, cand_block, cert_block),
            out_shape=outs,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)

    def make_bf16_struct_kernel(n, d):
        # sq8 structure but bf16 corpus: isolates the int8 conversion
        def kernel(q_ref, qn_ref, e_ref, s_ref, cs_ref, ci_ref, m3_ref):
            i = pl.program_id(0)
            q = q_ref[:].astype(jnp.bfloat16)
            dot = jax.lax.dot_general(
                q, e_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            bounds = dot * s_ref[0:1, :] + qn_ref[:] * s_ref[1:2, :]
            _tree_reduce_emit(n, tile, i, bounds, cs_ref, ci_ref, m3_ref)
        return kernel

    def make_noscale_kernel(n, d):
        # int8 corpus, no scal2 stream / bound FMA: isolates those
        def kernel(q_ref, qn_ref, e_ref, cs_ref, ci_ref, m3_ref):
            i = pl.program_id(0)
            q = q_ref[:].astype(jnp.bfloat16)
            e = e_ref[:].astype(jnp.bfloat16)
            dot = jax.lax.dot_general(
                q, e, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            _tree_reduce_emit(n, tile, i, dot, cs_ref, ci_ref, m3_ref)
        return kernel

    @functools.partial(jax.jit, static_argnames=("which",))
    def run_variant(e, scal2, qp, qn, which: str):
        if which == "bf16_struct":
            cs, ci, m3 = variant_call(
                e, scal2, qp, qn, make_bf16_struct_kernel, True)
        else:
            cs, ci, m3 = variant_call(
                e, scal2, qp, qn, make_noscale_kernel, False)
        return cs.sum() + m3.sum() + ci.sum()

    @jax.jit
    def sq8_kernel_only(e8, scal2, qp, qn):
        cs, ci, m3 = sq8_candidates(e8, scal2, qp, qn, tile, False)
        return cs.sum() + m3.sum() + ci.sum()

    @jax.jit
    def tree_kernel_only(emb, qp):
        cs, ci, m3 = _tree_candidates(emb, qp, tile, False)
        return cs.sum() + m3.sum() + ci.sum()

    for n in (1 << 20, 10 << 20):
        keys = jax.random.split(jax.random.key(n), 3)

        @functools.partial(jax.jit, static_argnames=("nn",))
        def gen(nn, key):
            chunk = 1 << 19

            def body(c, out):
                k = jax.random.fold_in(key, c)
                v = jax.random.normal(k, (chunk, D), jnp.float32)
                v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
                return jax.lax.dynamic_update_slice(
                    out, v.astype(jnp.bfloat16), (c * chunk, 0))

            return jax.lax.fori_loop(
                0, nn // chunk, body, jnp.zeros((nn, D), jnp.bfloat16))

        emb16 = gen(n, keys[0])

        @functools.partial(jax.jit, static_argnames=("nn",))
        def quant(nn, emb16):
            chunk = 1 << 19

            def body(c, carry):
                e8_all, s2_all = carry
                blk = jax.lax.dynamic_slice(
                    emb16, (c * chunk, 0), (chunk, D)).astype(jnp.float32)
                e8, s2 = quantize_rows_device(blk)
                return (
                    jax.lax.dynamic_update_slice(e8_all, e8, (c * chunk, 0)),
                    jax.lax.dynamic_update_slice(s2_all, s2, (0, c * chunk)),
                )

            init = (jnp.zeros((nn, D), jnp.int8),
                    jnp.zeros((2, nn), jnp.float32))
            return jax.lax.fori_loop(0, nn // chunk, body, init)

        e8, scal2 = quant(n, emb16)
        qs = jax.random.normal(keys[2], (Q, D), jnp.float32)
        qs = qs / jnp.linalg.norm(qs, axis=1, keepdims=True)
        qp = jnp.concatenate([qs, jnp.zeros((LANES - Q, D), jnp.float32)])
        qn = jnp.linalg.norm(qp, axis=1, keepdims=True)

        np.asarray(tree_kernel_only(emb16, qp))
        np.asarray(sq8_kernel_only(e8, scal2, qp, qn))
        np.asarray(run_variant(emb16, scal2, qp, qn, "bf16_struct"))
        np.asarray(run_variant(e8, scal2, qp, qn, "noscale"))
        np.asarray(_sq8_select(e8, scal2, qs, 512, tile, False))

        t_tree = p50(lambda: tree_kernel_only(emb16, qp)) - floor
        t_sq8k = p50(lambda: sq8_kernel_only(e8, scal2, qp, qn)) - floor
        t_bf16 = p50(lambda: run_variant(emb16, scal2, qp, qn, "bf16_struct")) - floor
        t_nosc = p50(lambda: run_variant(e8, scal2, qp, qn, "noscale")) - floor
        t_sel = p50(lambda: _sq8_select(e8, scal2, qs, 512, tile, False)) - floor
        log(f"N={n}: tree={t_tree:.2f} sq8_kernel={t_sq8k:.2f} "
            f"bf16_struct={t_bf16:.2f} int8_noscale={t_nosc:.2f} "
            f"select_e2e={t_sel:.2f} merge={t_sel - t_sq8k:.2f} (ms net)")
        del emb16, e8, scal2


main()
