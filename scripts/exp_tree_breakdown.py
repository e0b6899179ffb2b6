"""One-off TPU experiment: where does the tree kernel's time go?

Model from kbench2 (net-of-floor, interleaved): t(N) = fixed + N*b with
fixed ~1.8 ms and marginal ~513 GB/s (63% of v5e HBM peak). This script
splits the pipeline per scale:

  floor        trivial-op dispatch (relay RPC floor)
  sweep        pallas matmul + per-tile running max only (DMA/MXU floor)
  kernel       the tree pallas_call alone (outputs reduced to one scalar
               on device; no candidate-sized XLA consumers)
  e2e          fused_topk_batch_tree packed (production path)
  merge        e2e - kernel (approx_max_k + certs + lexsort + pack)
  exactmerge   variant: blocked_top_k over the candidates + lexsort +
               counting certificate (no ApproxTopK, one fewer cand sweep)

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/exp_tree_breakdown.py
(keep the existing PYTHONPATH — it registers the axon TPU plugin via
sitecustomize; never kill a TPU-attached process on this rig)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D, K = 512, 48


def log(msg):
    print(msg, flush=True)


def p50(fn, iters=11):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50))


def main():
    import jax
    import jax.numpy as jnp

    from evossearch_tpu.ops.topk_pallas import (
        LANES, _tree_candidates, _tree_tile_rows, _TREE_FETCH_PAD,
    )
    from evossearch_tpu.index.search import (
        _pallas_topk_packed, blocked_top_k,
    )

    trivial = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,))
    np.asarray(trivial(z))
    log(f"devices: {jax.devices()}")

    def floor():
        return p50(lambda: trivial(z), iters=9)

    # matmul + per-256-row-block max only (the block kernel at levels=1):
    # the DMA/MXU speed-of-light probe (same probe as exp_topk_variants)
    from evossearch_tpu.ops.topk_pallas import _block_candidates

    @jax.jit
    def sweep(emb, qp):
        _, _, cert = _block_candidates(emb, qp, False, levels=1)
        return cert.sum()

    @functools.partial(jax.jit, static_argnames=("n", "chunks", "dtype"))
    def gen(n, chunks, dtype):
        rows = n // chunks

        def body(i, out):
            key = jax.random.fold_in(jax.random.key(0), i)
            c = jax.random.normal(key, (rows, D), jnp.float32)
            c = (c / jnp.linalg.norm(c, axis=1, keepdims=True)).astype(dtype)
            return jax.lax.dynamic_update_slice(out, c, (i * rows, 0))

        return jax.lax.fori_loop(0, chunks, body, jnp.zeros((n, D), dtype))

    # exact-merge variant: blocked_top_k over candidates + lexsort +
    # counting certificate (replaces approx_max_k + its recall cert)
    @functools.partial(jax.jit, static_argnames=("k",))
    def tree_exactmerge_packed(emb, queries, k):
        q = queries.shape[0]
        qp = queries.astype(jnp.float32)
        if q < LANES:
            qp = jnp.concatenate(
                [qp, jnp.zeros((LANES - q, D), jnp.float32)]
            )
        tile = _tree_tile_rows(emb.dtype)
        cs_all, ci_all, m3 = _tree_candidates(emb, qp, tile, False)
        cand_s = cs_all[:q]
        cand_i = ci_all[:q]
        cert = m3[:q]
        kk = min(k, cand_s.shape[1])
        fetch = min(kk + _TREE_FETCH_PAD, cand_s.shape[1])
        cs, cpos = jax.vmap(lambda s: blocked_top_k(s, fetch))(cand_s)
        ci = jnp.take_along_axis(cand_i, cpos, axis=1)

        def per_query(s, i):
            order = jnp.lexsort((i, -s))[:kk]
            return s[order], i[order]

        top_s, top_i = jax.vmap(per_query)(cs, ci)
        m = top_s[:, kk - 1]
        ge_all = jnp.sum(cand_s >= m[:, None], axis=1)
        ge_got = jnp.sum(cs >= m[:, None], axis=1)
        ok = (ge_all == ge_got) & jnp.all(cert < m[:, None], axis=1)
        return jnp.concatenate(
            [top_s, top_i.astype(jnp.float32), ok[:, None].astype(jnp.float32)],
            axis=1,
        )

    # kernel-only: tree candidates reduced to one scalar on device
    def make_kernel_only(tile):
        @jax.jit
        def f(emb, qp):
            cs_all, ci_all, m3 = _tree_candidates(emb, qp, tile, False)
            return cs_all.sum() + m3.sum()

        return f

    for n, dtype, chunks in (
        (1_000_000, jnp.float32, 1),
        (1_000_000, jnp.bfloat16, 1),
        (10_000_000, jnp.bfloat16, 20),
    ):
        emb = gen(n, chunks, dtype)
        np.asarray(emb[0, 0])
        qs = jax.random.normal(jax.random.key(1), (K, D), jnp.float32)
        qs = qs / jnp.linalg.norm(qs, axis=1, keepdims=True)
        qp = jnp.concatenate([qs, jnp.zeros((LANES - K, D), jnp.float32)])
        tile = _tree_tile_rows(emb.dtype)

        kernel_only = make_kernel_only(tile)
        # warm all
        np.asarray(sweep(emb, qp))
        np.asarray(kernel_only(emb, qp))
        np.asarray(_pallas_topk_packed(emb, qs, K, False, True)[0, 0])
        np.asarray(tree_exactmerge_packed(emb, qs, K)[0, 0])

        fl = floor()
        t_sweep = p50(lambda: sweep(emb, qp)) - fl
        t_kernel = p50(lambda: kernel_only(emb, qp)) - fl
        t_e2e = p50(lambda: _pallas_topk_packed(emb, qs, K, False, True)) - fl
        t_exact = p50(lambda: tree_exactmerge_packed(emb, qs, K)) - fl
        packed = np.asarray(tree_exactmerge_packed(emb, qs, K))
        ok_rate = float((packed[:, -1] > 0).mean())
        gbps = n * D * emb.dtype.itemsize / (t_sweep * 1e-3) / 1e9
        log(
            f"N={n} {jnp.dtype(dtype).name} tile={tile}: floor={fl:.2f} "
            f"sweep={t_sweep:.2f} ({gbps:.0f} GB/s) kernel={t_kernel:.2f} "
            f"e2e={t_e2e:.2f} merge={t_e2e - t_kernel:.2f} "
            f"exactmerge={t_exact:.2f} (cert rate {ok_rate:.3f})"
        )
        del emb


main()
