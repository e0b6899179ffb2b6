"""Pallas TPU kernel: fused L2-normalize(query) + GEMM + streaming top-k.

Replaces the FAISS IndexFlatIP scan (reference oldapp.py:87/2005) at the
kernel level. The embedding matrix streams HBM -> VMEM tile by tile (Pallas
double-buffers the grid automatically); each tile's scores are computed on
the MXU and folded into a running top-k kept entirely in VMEM — the
million-element score vector is never materialized in HBM.

Exactness: guaranteed. A tile is merged only when its max score beats the
current k-th best (the common case after the first few tiles is a cheap
skip); the merge itself is a k-step selection with the same tie contract as
the rest of the framework (equal scores -> lowest global index).

Shapes: k <= 128 (we keep one 128-lane running buffer; the API contract
k <= 48 from the reference's MAX_RESULTS fits comfortably).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NEG_INF = float(np.finfo(np.float32).min)


def _merge_topk(cand_s, cand_i, k: int):
    """k-step selection: top-k of candidates by (score desc, index asc).

    cand_s/cand_i: (1, C) float32 / int32. Returns ((1, LANES) scores,
    (1, LANES) indices) with entries >= k set to -inf / -1.
    """
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    out_s = jnp.full((1, LANES), NEG_INF, jnp.float32)
    out_i = jnp.full((1, LANES), -1, jnp.int32)
    big = jnp.int32(2**31 - 1)

    def body(j, carry):
        cand_s, cand_i, out_s, out_i = carry
        m = jnp.max(cand_s)
        is_max = cand_s == m
        sel = jnp.min(jnp.where(is_max, cand_i, big))  # lowest index on ties
        out_s = jnp.where(lane_ids == j, m, out_s)
        out_i = jnp.where(lane_ids == j, sel, out_i)
        cand_s = jnp.where(is_max & (cand_i == sel), NEG_INF, cand_s)
        return cand_s, cand_i, out_s, out_i

    _, _, out_s, out_i = jax.lax.fori_loop(
        0, k, body, (cand_s, cand_i, out_s, out_i)
    )
    return out_s, out_i


def _make_kernel(n: int, block_rows: int, k: int):
    def kernel(q_ref, e_ref, out_s_ref, out_i_ref, run_s, run_i):
        i = pl.program_id(0)
        num = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            run_s[:] = jnp.full((1, LANES), NEG_INF, jnp.float32)
            run_i[:] = jnp.full((1, LANES), -1, jnp.int32)

        # Fused query L2-normalize (constant refetch per tile, negligible).
        q = q_ref[:].astype(jnp.float32)  # (1, d)
        q = q * jax.lax.rsqrt(jnp.sum(q * q) + 1e-30)

        # (1, T) tile scores on the MXU: contract d of (1,d) x (T,d).
        # HIGHEST = full-f32 (3-pass bf16) accumulation, matching the XLA
        # matvec path's precision so all exact kernels rank identically.
        scores = jax.lax.dot_general(
            q, e_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        base = i * block_rows
        col = jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)
        valid = jnp.minimum(n - base, block_rows)
        scores = jnp.where(col < valid, scores, NEG_INF)

        thresh = run_s[0, k - 1]
        tile_max = jnp.max(scores)

        @pl.when(tile_max > thresh)
        def _():
            cand_s = jnp.concatenate([run_s[:], scores], axis=1)
            cand_i = jnp.concatenate([run_i[:], col + base], axis=1)
            new_s, new_i = _merge_topk(cand_s, cand_i, k)
            run_s[:] = new_s
            run_i[:] = new_i

        @pl.when(i == num - 1)
        def _():
            out_s_ref[:] = run_s[:]
            out_i_ref[:] = run_i[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "interpret")
)
def fused_topk(
    emb: jax.Array, query: jax.Array, k: int,
    block_rows: int = 2048, interpret: bool = False,
):
    """Exact top-k inner-product search, single fused kernel.

    emb: (N, d) float32/bfloat16. query: (d,) float32 (normalized inside).
    Returns (scores (k,), indices (k,)) by (score desc, index asc).
    """
    n, d = emb.shape
    if k > LANES:
        raise ValueError(f"k={k} > {LANES} not supported by the kernel")
    grid = pl.cdiv(n, block_rows)
    kernel = _make_kernel(n, block_rows, k)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.VMEM((1, LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d,
            bytes_accessed=n * d * emb.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(query.reshape(1, d).astype(jnp.float32), emb)
    return out_s[0, :k], out_i[0, :k]
