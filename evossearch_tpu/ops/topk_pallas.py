"""Pallas TPU kernels: fused GEMM + top-k search over an embedding matrix.

Replaces the FAISS IndexFlatIP scan (reference oldapp.py:87/2005) at the
kernel level. Two kernels:

``fused_topk``       — single-query streaming exact top-k (running top-k
                       buffer in VMEM, tile-skip when a tile can't beat the
                       current k-th best).
``fused_topk_batch`` — the serving kernel: a batch of queries against the
                       corpus in ONE pass over HBM. The embedding matrix
                       streams HBM -> VMEM tile by tile; each tile's
                       (128, T) scores are computed on the MXU and reduced
                       IN REGISTERS/VMEM to per-256-row-block top-LEVELS
                       scores (+ top-(LEVELS-1) indices). The (Q, N) score
                       matrix — which the XLA certified path writes to and
                       re-reads from HBM three times — never exists.
                       Traffic is one read of the corpus: the bandwidth
                       speed of light.

Exactness of the batched kernel (certified): candidates are the
top-(LEVELS-1) of every 256-row block, so an element can only be missed if
it ranks LEVELS-th or lower in its block, i.e. missed <= block's
LEVELS-th-best. The final merge certifies per query that every block's
LEVELS-th-best < the selected k-th score; then nothing missed can belong
to the top-k. Failure needs >= LEVELS of the global top-~k elements to
share one 256-row block (P ~ C(48,LEVELS)/L^(LEVELS-1) — never at corpus
scale; adversarial all-tie inputs do trip it) and is caught and routed to
the exact XLA fallback per query.

Tie contract everywhere: (score desc, global index asc) — block top-4
selects lowest index among equals, candidates are laid out so candidate
position order == global index order for equal scores, and lax.top_k's
lowest-position preference finishes the job.

Shapes: k <= 128; d % 128 == 0 (CLIP dims 512/768).
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


# -- batched kernel: one HBM pass, per-block top-4, certified-exact merge --

# Rows per reduction block: each block yields LEVELS candidate scores +
# LEVELS-1 indices; the last score is the certification bound only.
SUB_ROWS = 256
# Selection depth per block. Candidates = top-(LEVELS-1) of each 256-row
# block; exactness fails (-> caught, exact fallback) only when >= LEVELS
# of the global top-~k land in ONE block — P ~ C(48,LEVELS)/L^(LEVELS-1)
# per query, L = N/256 blocks. Depth 3 cuts the kernel's VPU selection
# work by one full max-extract pass, but its failure rate only vanishes
# when L is large: at N=10M it is ~1e-5/query, at N=50k it is ~0.5/query
# (every batch would pay the exact fallback). So depth is chosen from the
# corpus size: 3 above _LEVELS3_MIN_ROWS (P < ~1e-4/query there), else 4.
LEVELS = 4
_LEVELS3_MIN_ROWS = 4 << 20  # ~4.2M rows


def default_levels(n_rows: int) -> int:
    """Selection depth for an ``n_rows`` corpus (see LEVELS note)."""
    return 3 if n_rows >= _LEVELS3_MIN_ROWS else LEVELS
# Corpus rows per grid step (VMEM budget: E tile f32 2048x768x4 = 6 MB
# double-buffered by the pipeline + (128, 2048) f32 scores = 1 MB).
TILE_ROWS = 2048
_SUBS_PER_TILE = TILE_ROWS // SUB_ROWS  # 8 = f32 min sublane tile
_INT_MAX = np.int32(2**31 - 1)


def _make_batch_kernel(n: int, d: int, compute_dtype, levels: int):
    def kernel(q_ref, e_ref, *out_refs):
        s_refs = out_refs[:levels]
        i_refs = out_refs[levels : 2 * levels - 1]
        i = pl.program_id(0)
        q = q_ref[:].astype(compute_dtype)  # (LANES, d)
        # (LANES, TILE_ROWS) tile scores on the MXU, queries on sublanes,
        # corpus rows on lanes. (A corpus-on-sublanes orientation with
        # axis-1 reductions over (blocks, SUB, LANES) was tried and costs
        # ~4x more — Mosaic lowers those 3D sublane reductions poorly.)
        # For f32 inputs HIGHEST (bf16x3) matches the XLA paths' precision
        # so all device kernels rank identically; for bf16 the MXU
        # accumulates f32 natively and Mosaic rejects an explicit fp32
        # contract precision.
        precision = (
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        scores = jax.lax.dot_general(
            q, e_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        base = i * TILE_ROWS
        # One local iota shared by every sub-block and level (hoisted —
        # re-materializing it per sub-block was measurable VPU time).
        col_local = jax.lax.broadcasted_iota(jnp.int32, (LANES, SUB_ROWS), 1)

        def select(mask_tail: bool) -> None:
            for s in range(_SUBS_PER_TILE):
                sub_base = base + s * SUB_ROWS
                work = scores[:, s * SUB_ROWS : (s + 1) * SUB_ROWS]
                if mask_tail:
                    work = jnp.where(
                        jnp.minimum(n - sub_base, SUB_ROWS) > col_local,
                        work, NEG_INF,
                    )
                # `levels`-deep selection, lowest index among equal
                # scores. Levels 0..levels-2 emit (score, index)
                # candidates; the last level emits its score only (the
                # certification bound).
                for lvl in range(levels):
                    m = jnp.max(work, axis=1)  # (LANES,)
                    s_refs[lvl][s, :] = m
                    if lvl < levels - 1:
                        is_m = work == m[:, None]
                        sel = jnp.min(
                            jnp.where(is_m, col_local, _INT_MAX), axis=1
                        )
                        i_refs[lvl][s, :] = sel + sub_base
                        # sel is a unique column, so matching on the
                        # column alone knocks out exactly that element
                        # (the old `is_m &` conjunct was redundant work).
                        work = jnp.where(
                            col_local == sel[:, None], NEG_INF, work
                        )

        if n % TILE_ROWS == 0:
            select(mask_tail=False)
        else:
            # Tail masking costs two extra passes per sub-block; only the
            # final tile overlaps the corpus tail, so branch per tile and
            # pay masking there alone.
            is_tail = base + TILE_ROWS > n

            @pl.when(is_tail)
            def _():
                select(mask_tail=True)

            @pl.when(jnp.logical_not(is_tail))
            def _():
                select(mask_tail=False)

    return kernel


def _block_candidates(
    emb: jax.Array, queries_padded: jax.Array, interpret: bool,
    levels: int = LEVELS,
):
    """Run the one-pass kernel: (L, LANES) top-``levels`` scores +
    top-``levels-1`` indices per 256-row block, L = cdiv(N, 256) padded to
    the tile grid. Returns (scores tuple, indices tuple, cert scores)."""
    n, d = emb.shape
    if d % LANES:
        raise ValueError(f"d={d} must be a multiple of {LANES}")
    grid = pl.cdiv(n, TILE_ROWS)
    rows_l = grid * _SUBS_PER_TILE
    out_block = pl.BlockSpec(
        (_SUBS_PER_TILE, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    f32 = jax.ShapeDtypeStruct((rows_l, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows_l, LANES), jnp.int32)
    compute_dtype = emb.dtype if emb.dtype == jnp.bfloat16 else jnp.float32
    outs = pl.pallas_call(
        _make_batch_kernel(n, d, compute_dtype, levels),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((LANES, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_block,) * (2 * levels - 1),
        out_shape=(f32,) * levels + (i32,) * (levels - 1),
        cost_estimate=pl.CostEstimate(
            flops=2 * LANES * n * d,
            bytes_accessed=n * d * emb.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries_padded, emb)
    return outs[: levels - 1], outs[levels : 2 * levels - 1], outs[levels - 1]


@functools.partial(jax.jit, static_argnames=("k", "interpret", "levels"))
def fused_topk_batch(
    emb: jax.Array, queries: jax.Array, k: int, interpret: bool = False,
    levels: int | None = None,
):
    """Batched certified-exact top-k in one pass over the corpus.

    emb: (N, d) float32/bfloat16, d % 128 == 0. queries: (Q, d) float32,
    Q <= 128. Returns (ok (Q,) bool, scores (Q, k) f32, indices (Q, k)
    int32): rows with ok=True are the exact global top-k under the
    (score desc, index asc) contract; ok=False rows (adversarial mass ties
    only) need the caller's exact fallback.
    """
    n, d = emb.shape
    q = queries.shape[0]
    if levels is None:
        levels = default_levels(n)
    nc = levels - 1  # candidates kept per 256-row block
    if k > LANES:
        raise ValueError(f"k={k} > {LANES} not supported by the kernel")
    if q > LANES:
        raise ValueError(f"Q={q} > {LANES} queries per kernel call")
    queries = queries.astype(jnp.float32)
    if q < LANES:
        queries = jnp.concatenate(
            [queries, jnp.zeros((LANES - q, d), jnp.float32)]
        )
    ss, ii, s_cert = _block_candidates(emb, queries, interpret, levels)
    # Candidate layout (Q, L*nc) interleaved [block0: lvl1..lvl_nc,
    # block1: ...]: position order == global-index order for equal scores
    # (levels within a block are index-ascending on ties by construction,
    # blocks are index-ascending by layout), so lax.top_k's lowest-position
    # tie preference implements the lowest-index contract.
    # The kernel computes all LANES query lanes (MXU shape), but the merge
    # below only needs the q REAL queries — slice first so the candidate
    # selection, certification counts, and lexsorts don't pay for padding
    # lanes (2.6x wasted merge work at the serving batch of 48).
    cand_s = jnp.stack(ss, axis=1)  # (L, nc, LANES)
    cand_i = jnp.stack(ii, axis=1)
    rows_l = cand_s.shape[0]
    cand_s = cand_s.transpose(2, 0, 1)[:q].reshape(q, rows_l * nc)
    cand_i = cand_i.transpose(2, 0, 1)[:q].reshape(q, rows_l * nc)
    kk = min(k, rows_l * nc)
    from ..index.search import blocked_top_k  # no cycle: search is jax-only

    top_s, pos = jax.vmap(lambda s: blocked_top_k(s, kk))(cand_s)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    if kk < k:  # tiny corpus: nc-per-block can't fill k rows; callers
        # route those cases to the plain path, this keeps shapes total
        pad = k - kk
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
    # Certification: nothing outside the candidates can reach the top-k
    # (a missed element ranks > nc in its block, i.e. <= that block's
    # (nc+1)-th best, which this asserts is strictly below the k-th pick).
    m = top_s[:, min(k, n) - 1]
    ok = jnp.all(s_cert.T[:q] < m[:, None], axis=1)
    return ok, top_s[:, :k], top_i[:, :k]


# -- halving-tree kernel: the bandwidth-bound formulation ----------------
#
# Measured on v5e (scripts/exp_topk_variants.py): a matmul + single-max
# pass sweeps a 10M bf16 corpus at 761 GB/s, while each per-block
# max-extract level of the kernel above costs ~1.3x the entire sweep —
# Mosaic lowers 256-lane-wide axis-1 reductions (and the broadcast-compare
# that follows them) very poorly. This kernel removes EVERY cross-lane
# operation from the hot loop: tile scores (Q, T) are reduced by
# repeatedly merging contiguous halves (pure elementwise max/select ops on
# register-aligned slices) down to lane width 128. Each surviving lane j
# then summarizes the "residue class" {cols c : c % 128 == j} of the tile
# — a fixed, data-independent partition, so the same certification
# argument as above applies with classes in place of row blocks: the
# kernel keeps each class's top-2 (scores + global indices, lowest-index
# tie contract via index-aware lex comparisons) plus its 3rd-best score as
# the bound on anything missed.
#
# The merge over (Q, ~2*N/256) candidates uses the TPU's native ApproxTopK
# with its own counting certificate (every candidate >= the k-th selected
# value must appear among the fetched rows), so a recall miss can never
# silently corrupt the result — it routes to the exact fallback like a
# tie collision would.

TREE_CLASSES = LANES


def _tree_tile_rows(dtype) -> int:
    """Corpus rows per tree-kernel tile. VMEM-bound: the bf16 tile is
    16384x512x2 = 16 MB (double-buffered) + (128, 16384) f32 scores 8 MB +
    tree intermediates; f32 tiles halve to stay inside VMEM.

    Tile sweep at 10M bf16 (v5e): SMALLER tiles run the kernel itself
    faster (4096: ~12.8 ms vs 16384: ~15 ms net — better DMA overlap),
    but each halving of the tile doubles the candidate count the merge
    must select over (2 * N/tile * 128): at 4096 the ApproxTopK merge
    over 625k candidates/query drops certification to 0.958 (recall
    misses at fetch=80) and end-to-end is ~6 ms SLOWER. 16384 is the
    measured optimum end to end."""
    return 16384 if dtype == jnp.bfloat16 else 8192


def _tree_reduce_emit(
    n: int, tile_rows: int, i, scores, cs_ref, ci_ref, m3_ref
) -> None:
    """Shared reduction tail of the tree kernels: collapse a
    (LANES, tile_rows) score tile to per-residue-class top-2 (scores +
    global indices) + 3rd-best bound, and write the pre-packed candidate
    blocks. ``scores`` is whatever figure the caller ranks by — true
    inner products (tree kernel) or the SQ8 kernel's certified upper
    bounds — the reduction and the certification structure are
    identical."""
    base = i * tile_rows

    def leaf(mask_tail: bool):
        # Width T -> T/2: singleton -> per-slot top-2. Left cols are
        # all lower than right cols here, so >= keeps the lower index.
        half = tile_rows // 2
        a = scores[:, :half]
        b = scores[:, half:]
        ia = jax.lax.broadcasted_iota(jnp.int32, (LANES, half), 1)
        if mask_tail:
            valid = n - base
            a = jnp.where(ia < valid, a, NEG_INF)
            b = jnp.where(ia + half < valid, b, NEG_INF)
        take = a >= b
        return (
            jnp.maximum(a, b),
            jnp.where(take, ia, ia + half),
            jnp.minimum(a, b),
            jnp.where(take, ia + half, ia),
            None,  # 3rd-best appears at the first true merge
        )

    def merge(sa, sb):
        # Top-3 of two score-sorted summaries, SCORE-ONLY comparisons.
        # Ties are resolved arbitrarily (prefer left) — dropping the
        # index-aware tie compares cuts ~1/3 of the merge's VPU ops,
        # and the caller's certificates make it safe: a dropped tie
        # can only matter if its value >= m (the k-th selected
        # score), and then either the class bound check (m3 < m,
        # STRICT — the equal value rides in m3) or the candidate
        # counting certificate fails, routing that query to the exact
        # fallback. Among KEPT candidates the final lexsort is
        # index-aware, so certified results still honor the
        # (score desc, index asc) contract exactly.
        m1a, i1a, m2a, i2a, m3a = sa
        m1b, i1b, m2b, i2b, m3b = sb
        c1 = m1a >= m1b
        c2a = m2a >= m1b
        c2b = m1a >= m2b
        m1 = jnp.where(c1, m1a, m1b)
        i1 = jnp.where(c1, i1a, i1b)
        m2 = jnp.where(
            c1, jnp.where(c2a, m2a, m1b), jnp.where(c2b, m1a, m2b)
        )
        i2 = jnp.where(
            c1, jnp.where(c2a, i2a, i1b), jnp.where(c2b, i1a, i2b)
        )
        m23 = jnp.maximum(m2a, m2b)
        if m3a is None:
            m3 = jnp.where(
                c1, jnp.where(c2a, m1b, m23), jnp.where(c2b, m23, m1a)
            )
        else:
            m3 = jnp.where(
                c1,
                jnp.where(c2a, jnp.maximum(m3a, m1b), m23),
                jnp.where(c2b, m23, jnp.maximum(m1a, m3b)),
            )
        return m1, i1, m2, i2, m3

    def run(mask_tail: bool) -> None:
        state = leaf(mask_tail)
        while state[0].shape[1] > TREE_CLASSES:
            h = state[0].shape[1] // 2
            sa = tuple(x if x is None else x[:, :h] for x in state)
            sb = tuple(x if x is None else x[:, h:] for x in state)
            state = merge(sa, sb)
        m1, i1, m2, i2, m3 = state
        # Candidates ship PRE-PACKED: tile i owns the 256-column block
        # [m1_tile | m2_tile], so the caller's merge consumes one
        # (LANES, grid*256) score array + one index array directly —
        # no post-kernel slices or concats (the merge's final sort is
        # index-aware, so candidate position order is free).
        cs_ref[:, :TREE_CLASSES] = m1
        cs_ref[:, TREE_CLASSES:] = m2
        ci_ref[:, :TREE_CLASSES] = i1 + base  # global row ids
        ci_ref[:, TREE_CLASSES:] = i2 + base
        m3_ref[:] = m3

    if n % tile_rows == 0:
        run(mask_tail=False)
    else:
        is_tail = base + tile_rows > n

        @pl.when(is_tail)
        def _():
            run(mask_tail=True)

        @pl.when(jnp.logical_not(is_tail))
        def _():
            run(mask_tail=False)


def _make_tree_kernel(n: int, d: int, compute_dtype, tile_rows: int):
    def kernel(q_ref, e_ref, cs_ref, ci_ref, m3_ref):
        i = pl.program_id(0)
        q = q_ref[:].astype(compute_dtype)
        precision = (
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        scores = jax.lax.dot_general(
            q, e_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (LANES queries, tile_rows)
        _tree_reduce_emit(n, tile_rows, i, scores, cs_ref, ci_ref, m3_ref)

    return kernel


def _make_sq8_kernel(n: int, d: int, tile_rows: int):
    """SQ8 bound sweep: the tree kernel over certified UPPER BOUNDS of
    the true scores, streaming an int8-quantized corpus (half the HBM
    bytes of bf16, quarter of f32).

    Inputs per row i (built by index.sq8.quantize_rows): e8_i = round-to-
    nearest int8 of row/scale_i, scale_i, and radd_i — a rigorous bound
    on everything the quantized dot misses (see quantize_rows for the
    derivation). The kernel computes

        u_i = <e8_i, bf16(q)> * scale_i + radd_i * ||q||  >=  <row_i, q>

    exactly certifiable because the bf16 MXU pass is EXACT integer
    arithmetic here: int8 values (<=127) and bf16(q) both carry <=8-bit
    mantissas, every product fits f32 exactly, and the f32 accumulation
    error is folded into radd. The tree reduction then keeps each
    residue class's top-2 bounds (+ indices) and 3rd-best bound — the
    same certified-candidate structure as the exact tree kernel, with
    bounds in place of scores."""

    def kernel(q_ref, qn_ref, e_ref, s_ref, cs_ref, ci_ref, m3_ref):
        i = pl.program_id(0)
        q = q_ref[:].astype(jnp.bfloat16)           # (LANES, d) — see above
        e = e_ref[:].astype(jnp.bfloat16)           # int8 -> bf16 is exact
        dot = jax.lax.dot_general(
            q, e,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (LANES, tile_rows) f32, exact integer-scaled dot
        scale = s_ref[0:1, :]                       # (1, tile_rows)
        radd = s_ref[1:2, :]
        qn = qn_ref[:]                              # (LANES, 1) ||q|| per lane
        bounds = dot * scale + qn * radd
        _tree_reduce_emit(n, tile_rows, i, bounds, cs_ref, ci_ref, m3_ref)

    return kernel


def _tree_candidates(
    emb: jax.Array, queries_padded: jax.Array, tile_rows: int, interpret: bool
):
    """One-pass tree kernel: per (tile, residue class) top-2 scores +
    global indices + 3rd-best bound. Outputs are query-major and
    PRE-PACKED — candidate scores (LANES, grid*256) and indices
    (LANES, grid*256), tile i writing column block i as
    [top-1 classes | top-2 classes], plus the (LANES, grid*128)
    certification bound — so the merge consumes them directly with no
    post-kernel transpose, slice, or concat."""
    n, d = emb.shape
    compute_dtype = emb.dtype if emb.dtype == jnp.bfloat16 else jnp.float32
    return _candidates_call(
        lambda: _make_tree_kernel(n, d, compute_dtype, tile_rows),
        n, d, tile_rows,
        in_specs=[
            pl.BlockSpec((LANES, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        bytes_accessed=n * d * emb.dtype.itemsize,
        interpret=interpret,
        args=(queries_padded, emb),
    )


def _candidates_call(
    make_kernel, n: int, d: int, tile_rows: int, in_specs,
    bytes_accessed: int, interpret: bool, args: tuple,
):
    """Shared pallas_call scaffolding for the two pre-packed candidate
    kernels (_tree_candidates and sq8_candidates): shape validation, the
    query-major packed candidate/certificate output layout, the cost
    estimate, and the raised scoped-VMEM cap — documented to share one
    structure, so a tuning change cannot silently fork them.

    VMEM: the tree's live set (tile scores + the first merge level's
    five channels) tops Mosaic's default 16 MB scoped-VMEM budget; the
    large tile is the whole point (candidate count ~ 256 * N/tile), so
    raise the cap instead of shrinking the tile. ~70 MB measured peak
    incl. double-buffered corpus tiles; v5e VMEM is 128 MB."""
    if d % LANES:
        raise ValueError(f"d={d} must be a multiple of {LANES}")
    if tile_rows < 512 or tile_rows & (tile_rows - 1):
        raise ValueError(f"tile_rows={tile_rows} must be a power of two >= 512")
    grid = pl.cdiv(n, tile_rows)
    cand_block = pl.BlockSpec(
        (LANES, 2 * TREE_CLASSES), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    cert_block = pl.BlockSpec(
        (LANES, TREE_CLASSES), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    cand_f32 = jax.ShapeDtypeStruct((LANES, grid * 2 * TREE_CLASSES), jnp.float32)
    cand_i32 = jax.ShapeDtypeStruct((LANES, grid * 2 * TREE_CLASSES), jnp.int32)
    cert_f32 = jax.ShapeDtypeStruct((LANES, grid * TREE_CLASSES), jnp.float32)
    return pl.pallas_call(
        make_kernel(),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(cand_block, cand_block, cert_block),
        out_shape=(cand_f32, cand_i32, cert_f32),
        cost_estimate=pl.CostEstimate(
            flops=2 * LANES * n * d,
            bytes_accessed=bytes_accessed,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


# SQ8 tile: unlike the tree kernel, the SQ8 select is MERGE-bound — the
# post-kernel ApproxTopK over fetch=512 degenerates to a full top-k of
# the (Q, candidates) tensor, so halving the candidate density (one
# 256-column block per 32768 rows) buys more than the kernel loses:
# measured at 20M rows, 41.5 ms vs 55.9 ms net select (263 vs 195 GB/s)
# with the counting certificate still 48/48. 65536 exceeds the 100 MB
# scoped-VMEM limit (117.85 MB stack). The class certificate keeps
# 128 * n/tile cells to spread the top-k over — 82k at 20M, ample.
SQ8_TILE_ROWS = 32768


def sq8_candidates(
    e8: jax.Array, scal2: jax.Array, queries_padded: jax.Array,
    qnorm: jax.Array, tile_rows: int = SQ8_TILE_ROWS,
    interpret: bool = False,
):
    """One-pass SQ8 bound sweep (see _make_sq8_kernel): per (tile,
    residue class) top-2 BOUNDS + global indices + 3rd-best bound,
    pre-packed exactly like _tree_candidates.

    e8: (N, d) int8 quantized corpus. scal2: (2, N) f32 [scale; radd]
    per-row scalars (index.sq8.quantize_rows). queries_padded:
    (LANES, d) f32. qnorm: (LANES, 1) f32 per-lane ||q|| scaling the
    additive bound term (rows quantized against unit queries stay
    rigorous for any query norm)."""
    n, d = e8.shape
    return _candidates_call(
        lambda: _make_sq8_kernel(n, d, tile_rows),
        n, d, tile_rows,
        in_specs=[
            pl.BlockSpec((LANES, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        bytes_accessed=n * d + 8 * n,
        interpret=interpret,
        args=(queries_padded, qnorm, e8, scal2),
    )


def use_tree_kernel(n_rows: int, k: int, dtype) -> bool:
    """Policy: prefer the tree kernel when its expected cost (pass +
    certification-failure fallbacks) beats the block kernel's. A query
    fails only if >= 3 of its top-~k rows land in one residue class —
    P ~ C(k,3)/L^2 over L = n/(tile/128) classes; accepted when
    P <= ~1e-3/query. At that boundary a 48-query batch pays an exact
    fallback (~35 ms incl dispatch) ~5% of the time, +~2 ms expected,
    while the tree pass saves 4-6 ms outright: measured on v5e, batch-48
    net of the rig's RPC floor, the tree beats the block kernel at 1M
    rows for BOTH dtypes (bf16: 1.9 vs 7.9 ms; f32: 9.2 vs 14.6 ms) and
    sweeps 10M bf16 at ~580 GB/s vs ~230 GB/s (the earlier 2e-4 cutoff
    mis-routed 0.3-1M bf16 corpora to the block kernel)."""
    import math

    classes = n_rows // max(_tree_tile_rows(dtype) // TREE_CLASSES, 1)
    if classes < 1024:
        return False
    return math.comb(k, 3) <= 1e-3 * classes * classes


# ApproxTopK overfetch for the candidate merge: boundary ties and recall
# misses beyond this margin fail the counting certificate -> exact fallback.
_TREE_FETCH_PAD = 32


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fused_topk_batch_tree(
    emb: jax.Array, queries: jax.Array, k: int, interpret: bool = False
):
    """Batched certified-exact top-k via the halving-tree kernel.

    Same contract as ``fused_topk_batch``: (ok (Q,), scores (Q, k),
    indices (Q, k)); ok=False rows need the caller's exact fallback.
    Built for multi-million-row corpora (the class partition needs many
    tiles for certification to succeed at k~48; callers choose between
    this and the block kernel by corpus size)."""
    n, d = emb.shape
    q = queries.shape[0]
    if k > LANES:
        raise ValueError(f"k={k} > {LANES} not supported by the kernel")
    if q > LANES:
        raise ValueError(f"Q={q} > {LANES} queries per kernel call")
    queries = queries.astype(jnp.float32)
    if q < LANES:
        queries = jnp.concatenate(
            [queries, jnp.zeros((LANES - q, d), jnp.float32)]
        )
    tile_rows = _tree_tile_rows(emb.dtype)
    cs_all, ci_all, m3 = _tree_candidates(emb, queries, tile_rows, interpret)
    # Candidates arrive pre-packed, tile-major (NOT index-interleaved):
    # the final sort below is index-aware, so candidate position order is
    # free to be arbitrary. Slice to the q REAL query rows first: the
    # kernel fills all LANES lanes (MXU shape), but the ApproxTopK merge
    # + the two counting certificates below each sweep the
    # (rows, ~2N/128) f32 candidate tensor — at 10M rows that is ~160 MB
    # per sweep, and padding lanes would pay 2.6x of it for nothing at
    # the serving batch of 48.
    cand_s = cs_all[:q]
    cand_i = ci_all[:q]
    cert = m3[:q]
    c_total = cand_s.shape[1]
    kk = min(k, c_total)
    fetch = min(kk + _TREE_FETCH_PAD, c_total)
    # Hardware ApproxTopK over the candidates (f32, ~N/128 of the corpus),
    # then an index-aware lexsort of the fetched rows enforces the
    # (score desc, index asc) tie contract regardless of fetch order.
    cs, cpos = jax.lax.approx_max_k(
        cand_s, fetch, recall_target=0.999, aggregate_to_topk=True
    )
    ci = jnp.take_along_axis(cand_i, cpos, axis=1)
    from ..index.search import sort_by_score_then_index  # jax-only, no cycle

    top_s, top_i = sort_by_score_then_index(cs, ci, kk)
    m = top_s[:, kk - 1]
    # Certificates (either failing -> caller's exact fallback):
    #  (1) merge: every candidate scoring >= m was fetched — counts over
    #      the full candidate set and the fetched set must agree, so an
    #      ApproxTopK recall miss or a tie plateau wider than the fetch
    #      pad is always caught.
    #  (2) class bound: everything the kernel dropped scores < m.
    ge_all = jnp.sum(cand_s >= m[:, None], axis=1)
    ge_got = jnp.sum(cs >= m[:, None], axis=1)
    ok = (ge_all == ge_got) & jnp.all(cert < m[:, None], axis=1)
    if kk < k:
        pad = k - kk
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=NEG_INF)
        top_i = jnp.pad(top_i, ((0, 0), (0, pad)), constant_values=-1)
    return ok, top_s[:, :k], top_i[:, :k]
