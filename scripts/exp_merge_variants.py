"""One-off TPU experiment: dissect + attack the tree kernel's merge cost.

exp_tree_breakdown measured (1M bf16, v5e, net of relay floor):
kernel=0.84ms but e2e=2.41ms -> the post-kernel merge over the tiny
(48, ~2*N/128) candidate tensor costs a FIXED ~1.55ms, 65% of e2e. This
script times cumulative merge stages and alternates to name the slow op
and validate a cheaper formulation before touching production code.

Stages (cumulative, each includes the kernel pass):
  s0 kernel+sums   tree kernel, outputs reduced on device (baseline)
  s1 +slice/concat build cand_s/cand_i (q, C) from m1,m2/i1,i2
  s2 +approx       approx_max_k(fetch) + take_along_axis
  s3 +lexsort      per-query lexsort of the fetched rows
  s4 +certs        counting certificate + class bound (== production)
  s5 +pack         concat [s | i | ok]  (== _pallas_topk_packed)

Alternates:
  a1 split approx  approx_max_k on m1 and m2 separately (no (q,C) concat),
                   merge 2*fetch fetched rows
  a2 topk merge    blocked_top_k over cand_s instead of approx_max_k
  a3 sortfree      lexsort replaced by top_k on score + index-min repair
                   pass (exactness preserved via the same certificates)

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/exp_merge_variants.py
(never kill a TPU-attached process on this rig)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D, K, Q = 512, 48, 48


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

    from evossearch_tpu.index.search import _pallas_topk_packed, blocked_top_k
    from evossearch_tpu.ops.topk_pallas import (
        LANES, _tree_candidates, _tree_tile_rows, _TREE_FETCH_PAD,
    )

    trivial = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,))
    np.asarray(trivial(z))
    log(f"devices: {jax.devices()}")

    def floor():
        return p50(lambda: trivial(z), iters=9)

    @functools.partial(jax.jit, static_argnames=("n", "chunks", "dtype"))
    def gen(n, chunks, dtype):
        rows = n // chunks

        def body(i, out):
            key = jax.random.fold_in(jax.random.key(0), i)
            c = jax.random.normal(key, (rows, D), jnp.float32)
            c = (c / jnp.linalg.norm(c, axis=1, keepdims=True)).astype(dtype)
            return jax.lax.dynamic_update_slice(out, c, (i * rows, 0))

        return jax.lax.fori_loop(0, chunks, body, jnp.zeros((n, D), dtype))

    def make_stage(stage: int, tile: int):
        @jax.jit
        def f(emb, qp):
            m1, m2, m3, i1, i2 = _tree_candidates(emb, qp, tile, False)
            if stage == 0:
                return m1.sum() + m2.sum() + m3.sum() + i1.sum() + i2.sum()
            cand_s = jnp.concatenate([m1[:Q], m2[:Q]], axis=1)
            cand_i = jnp.concatenate([i1[:Q], i2[:Q]], axis=1)
            cert = m3[:Q]
            if stage == 1:
                return cand_s.sum() + cand_i.sum() + cert.sum()
            c_total = cand_s.shape[1]
            kk = min(K, c_total)
            fetch = min(kk + _TREE_FETCH_PAD, c_total)
            cs, cpos = jax.lax.approx_max_k(
                cand_s, fetch, recall_target=0.999, aggregate_to_topk=True
            )
            ci = jnp.take_along_axis(cand_i, cpos, axis=1)
            if stage == 2:
                return cs.sum() + ci.sum()

            def per_query(s, i):
                order = jnp.lexsort((i, -s))[:kk]
                return s[order], i[order]

            top_s, top_i = jax.vmap(per_query)(cs, ci)
            if stage == 3:
                return top_s.sum() + top_i.sum()
            m = top_s[:, kk - 1]
            ge_all = jnp.sum(cand_s >= m[:, None], axis=1)
            ge_got = jnp.sum(cs >= m[:, None], axis=1)
            ok = (ge_all == ge_got) & jnp.all(cert < m[:, None], axis=1)
            if stage == 4:
                return top_s.sum() + top_i.sum() + ok.sum()
            return jnp.concatenate(
                [top_s, top_i.astype(jnp.float32),
                 ok[:, None].astype(jnp.float32)], axis=1,
            )

        return f

    # a1: per-source approx_max_k (halved width, no big concat)
    @jax.jit
    def alt_split(emb, qp):
        tile = _tree_tile_rows(emb.dtype)
        m1, m2, m3, i1, i2 = _tree_candidates(emb, qp, tile, False)
        cert = m3[:Q]
        c_half = m1.shape[1]
        fetch = min(K + _TREE_FETCH_PAD, c_half)
        s1, p1 = jax.lax.approx_max_k(
            m1[:Q], fetch, recall_target=0.999, aggregate_to_topk=True
        )
        s2, p2 = jax.lax.approx_max_k(
            m2[:Q], fetch, recall_target=0.999, aggregate_to_topk=True
        )
        j1 = jnp.take_along_axis(i1[:Q], p1, axis=1)
        j2 = jnp.take_along_axis(i2[:Q], p2, axis=1)
        cs = jnp.concatenate([s1, s2], axis=1)
        ci = jnp.concatenate([j1, j2], axis=1)

        def per_query(s, i):
            order = jnp.lexsort((i, -s))[:K]
            return s[order], i[order]

        top_s, top_i = jax.vmap(per_query)(cs, ci)
        m = top_s[:, K - 1]
        # counting cert against BOTH sources (no concat of the full set)
        ge_all = (
            jnp.sum(m1[:Q] >= m[:, None], axis=1)
            + jnp.sum(m2[:Q] >= m[:, None], axis=1)
        )
        ge_got = jnp.sum(cs >= m[:, None], axis=1)
        ok = (ge_all == ge_got) & jnp.all(cert < m[:, None], axis=1)
        return jnp.concatenate(
            [top_s, top_i.astype(jnp.float32),
             ok[:, None].astype(jnp.float32)], axis=1,
        )

    # a2: blocked_top_k over the candidates instead of approx_max_k
    @jax.jit
    def alt_topk(emb, qp):
        tile = _tree_tile_rows(emb.dtype)
        m1, m2, m3, i1, i2 = _tree_candidates(emb, qp, tile, False)
        cand_s = jnp.concatenate([m1[:Q], m2[:Q]], axis=1)
        cand_i = jnp.concatenate([i1[:Q], i2[:Q]], axis=1)
        cert = m3[:Q]
        fetch = min(K + _TREE_FETCH_PAD, cand_s.shape[1])
        cs, cpos = jax.vmap(lambda s: blocked_top_k(s, fetch))(cand_s)
        ci = jnp.take_along_axis(cand_i, cpos, axis=1)

        def per_query(s, i):
            order = jnp.lexsort((i, -s))[:K]
            return s[order], i[order]

        top_s, top_i = jax.vmap(per_query)(cs, ci)
        m = top_s[:, K - 1]
        ge_all = jnp.sum(cand_s >= m[:, None], axis=1)
        ge_got = jnp.sum(cs >= m[:, None], axis=1)
        ok = (ge_all == ge_got) & jnp.all(cert < m[:, None], axis=1)
        return jnp.concatenate(
            [top_s, top_i.astype(jnp.float32),
             ok[:, None].astype(jnp.float32)], axis=1,
        )

    # a3: ordering via ONE batched two-key lax.sort over the fetched
    # values (== the sort_by_score_then_index now in production), with a
    # tile override to sweep tile size at fixed merge structure.
    @functools.partial(jax.jit, static_argnames=("tile",))
    def alt_smallsort_tile(emb, qp, tile):
        m1, m2, m3, i1, i2 = _tree_candidates(emb, qp, tile, False)
        cand_s = jnp.concatenate([m1[:Q], m2[:Q]], axis=1)
        cand_i = jnp.concatenate([i1[:Q], i2[:Q]], axis=1)
        cert = m3[:Q]
        fetch = min(K + _TREE_FETCH_PAD, cand_s.shape[1])
        cs, cpos = jax.lax.approx_max_k(
            cand_s, fetch, recall_target=0.999, aggregate_to_topk=True
        )
        ci = jnp.take_along_axis(cand_i, cpos, axis=1)
        # the fetched set is tiny (q, fetch): one variadic lax.sort with
        # num_keys=2 on (-s, i) — same as lexsort but batched, no vmap
        neg = -cs
        ss, ii = jax.lax.sort((neg, ci), dimension=1, num_keys=2)
        top_s, top_i = -ss[:, :K], ii[:, :K]
        m = top_s[:, K - 1]
        ge_all = jnp.sum(cand_s >= m[:, None], axis=1)
        ge_got = jnp.sum(cs >= m[:, None], axis=1)
        ok = (ge_all == ge_got) & jnp.all(cert < m[:, None], axis=1)
        return jnp.concatenate(
            [top_s, top_i.astype(jnp.float32),
             ok[:, None].astype(jnp.float32)], axis=1,
        )

    for n, dtype, chunks in (
        (1_000_000, jnp.bfloat16, 1),
        (1_000_000, jnp.float32, 1),
        (10_000_000, jnp.bfloat16, 20),
    ):
        emb = gen(n, chunks, dtype)
        np.asarray(emb[0, 0])
        qs = jax.random.normal(jax.random.key(1), (Q, D), jnp.float32)
        qs = qs / jnp.linalg.norm(qs, axis=1, keepdims=True)
        qp = jnp.concatenate([qs, jnp.zeros((LANES - Q, D), jnp.float32)])
        tile = _tree_tile_rows(emb.dtype)

        # tile sweep only makes sense where multiple tiles certify
        tiles = (8192, 16384) if dtype == jnp.bfloat16 else (tile,)

        stages = [make_stage(s, tile) for s in range(6)]
        for f in stages:
            np.asarray(f(emb, qp))
        np.asarray(_pallas_topk_packed(emb, qs, K, False, True)[0, 0])
        for f in (alt_split, alt_topk):
            np.asarray(f(emb, qp)[0, 0])
        for t in tiles:
            np.asarray(alt_smallsort_tile(emb, qp, t)[0, 0])

        fl = floor()
        ts = [p50(lambda f=f: f(emb, qp)) - fl for f in stages]
        t_prod = p50(lambda: _pallas_topk_packed(emb, qs, K, False, True)) - fl
        t_a1 = p50(lambda: alt_split(emb, qp)) - fl
        t_a2 = p50(lambda: alt_topk(emb, qp)) - fl
        t_a3 = {
            t: p50(lambda t=t: alt_smallsort_tile(emb, qp, t)) - fl
            for t in tiles
        }

        ref = np.asarray(_pallas_topk_packed(emb, qs, K, False, True))
        checks = [("a1", lambda: alt_split(emb, qp)),
                  ("a2", lambda: alt_topk(emb, qp))]
        checks += [
            (f"a3/t{t}", lambda t=t: alt_smallsort_tile(emb, qp, t))
            for t in tiles
        ]
        ok_rates = {}
        for name, f in checks:
            out = np.asarray(f())
            ok_rates[name] = float((out[:, -1] > 0).mean())
            both = (out[:, -1] > 0) & (ref[:, -1] > 0)
            same = np.allclose(out[both, : 2 * K], ref[both, : 2 * K])
            ok_rates[name + "_match"] = bool(same)
        a3_lines = "\n".join(
            f"  a3 valsort t={t:<6} {t_a3[t]:.2f}  {ok_rates[f'a3/t{t}']:.3f}"
            f" match={ok_rates[f'a3/t{t}_match']}"
            for t in tiles
        )
        log(
            f"N={n} {jnp.dtype(dtype).name} tile={tile}: floor={fl:.2f}\n"
            f"  s0 kernel     {ts[0]:.2f}\n"
            f"  s1 +concat    {ts[1]:.2f}  (+{ts[1]-ts[0]:.2f})\n"
            f"  s2 +approx    {ts[2]:.2f}  (+{ts[2]-ts[1]:.2f})\n"
            f"  s3 +lexsort   {ts[3]:.2f}  (+{ts[3]-ts[2]:.2f})\n"
            f"  s4 +certs     {ts[4]:.2f}  (+{ts[4]-ts[3]:.2f})\n"
            f"  s5 +pack      {ts[5]:.2f}  (+{ts[5]-ts[4]:.2f})\n"
            f"  production    {t_prod:.2f}  (valsort merge)\n"
            f"  a1 split      {t_a1:.2f}  {ok_rates['a1']:.3f} "
            f"match={ok_rates['a1_match']}\n"
            f"  a2 topk       {t_a2:.2f}  {ok_rates['a2']:.3f} "
            f"match={ok_rates['a2_match']}\n"
            f"{a3_lines}"
        )
        del emb


main()
