"""One-off TPU experiment: dissect + attack the tree kernel's merge cost.

exp_tree_breakdown measured (1M bf16, v5e, net of relay floor):
kernel=0.84ms but e2e=2.41ms -> the post-kernel merge over the tiny
(48, ~2*N/128) candidate tensor costs a FIXED ~1.55ms, 65% of e2e. Since
then production gained (a) a batched two-key value sort replacing the
vmapped lexsort + gathers and (b) pre-packed kernel candidate outputs
replacing the slices + concats. This script times cumulative merge
stages on the CURRENT kernel to locate what cost remains, plus
alternates (blocked_top_k merge, tile sweep).

Stages (cumulative, each includes the kernel pass):
  s0 kernel+sums   tree kernel, outputs reduced on device (baseline)
  s1 +slice        slice to q real query rows
  s2 +approx       approx_max_k(fetch) + take_along_axis
  s3 +sort         batched two-key value sort of the fetched rows
  s4 +certs        counting certificate + class bound
  s5 +pack         concat [s | i | ok]  (== production _pallas_topk_packed)

Alternates:
  a2 topk merge    blocked_top_k over cand_s instead of approx_max_k
  a3 tile sweep    production merge at tile overrides (bf16: 8192, 16384)

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

    from evossearch_tpu.index.search import (
        _pallas_topk_packed, blocked_top_k, sort_by_score_then_index,
    )
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
            cs_all, ci_all, m3 = _tree_candidates(emb, qp, tile, False)
            if stage == 0:
                return cs_all.sum() + ci_all.sum() + m3.sum()
            cand_s = cs_all[:Q]
            cand_i = ci_all[:Q]
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
            top_s, top_i = sort_by_score_then_index(cs, ci, kk)
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

    # a2: blocked_top_k over the candidates instead of approx_max_k
    @jax.jit
    def alt_topk(emb, qp):
        tile = _tree_tile_rows(emb.dtype)
        cs_all, ci_all, m3 = _tree_candidates(emb, qp, tile, False)
        cand_s, cand_i, cert = cs_all[:Q], ci_all[:Q], m3[:Q]
        fetch = min(K + _TREE_FETCH_PAD, cand_s.shape[1])
        cs, cpos = jax.vmap(lambda s: blocked_top_k(s, fetch))(cand_s)
        ci = jnp.take_along_axis(cand_i, cpos, axis=1)
        top_s, top_i = sort_by_score_then_index(cs, ci, K)
        m = top_s[:, K - 1]
        ge_all = jnp.sum(cand_s >= m[:, None], axis=1)
        ge_got = jnp.sum(cs >= m[:, None], axis=1)
        ok = (ge_all == ge_got) & jnp.all(cert < m[:, None], axis=1)
        return jnp.concatenate(
            [top_s, top_i.astype(jnp.float32),
             ok[:, None].astype(jnp.float32)], axis=1,
        )

    # a3: production merge at a tile override (tile sweep)
    @functools.partial(jax.jit, static_argnames=("tile",))
    def prod_tile(emb, qp, tile):
        cs_all, ci_all, m3 = _tree_candidates(emb, qp, tile, False)
        cand_s, cand_i, cert = cs_all[:Q], ci_all[:Q], m3[:Q]
        fetch = min(K + _TREE_FETCH_PAD, cand_s.shape[1])
        cs, cpos = jax.lax.approx_max_k(
            cand_s, fetch, recall_target=0.999, aggregate_to_topk=True
        )
        ci = jnp.take_along_axis(cand_i, cpos, axis=1)
        top_s, top_i = sort_by_score_then_index(cs, ci, K)
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
        tiles = (8192, 16384) if dtype == jnp.bfloat16 else (tile,)

        stages = [make_stage(s, tile) for s in range(6)]
        for f in stages:
            np.asarray(f(emb, qp))
        np.asarray(_pallas_topk_packed(emb, qs, K, False, True)[0, 0])
        np.asarray(alt_topk(emb, qp)[0, 0])
        for t in tiles:
            np.asarray(prod_tile(emb, qp, t)[0, 0])

        fl = floor()
        ts = [p50(lambda f=f: f(emb, qp)) - fl for f in stages]
        t_prod = p50(lambda: _pallas_topk_packed(emb, qs, K, False, True)) - fl
        t_a2 = p50(lambda: alt_topk(emb, qp)) - fl
        t_a3 = {
            t: p50(lambda t=t: prod_tile(emb, qp, t)) - fl for t in tiles
        }

        ref = np.asarray(_pallas_topk_packed(emb, qs, K, False, True))
        checks = [("a2", lambda: alt_topk(emb, qp))]
        checks += [
            (f"a3/t{t}", lambda t=t: prod_tile(emb, qp, t)) for t in tiles
        ]
        ok_rates = {}
        for name, f in checks:
            out = np.asarray(f())
            ok_rates[name] = float((out[:, -1] > 0).mean())
            both = (out[:, -1] > 0) & (ref[:, -1] > 0)
            same = np.allclose(out[both, : 2 * K], ref[both, : 2 * K])
            ok_rates[name + "_match"] = bool(same)
        a3_lines = "\n".join(
            f"  a3 tile={t:<6}  {t_a3[t]:.2f}  {ok_rates[f'a3/t{t}']:.3f}"
            f" match={ok_rates[f'a3/t{t}_match']}"
            for t in tiles
        )
        log(
            f"N={n} {jnp.dtype(dtype).name} tile={tile}: floor={fl:.2f}\n"
            f"  s0 kernel     {ts[0]:.2f}\n"
            f"  s1 +slice     {ts[1]:.2f}  (+{ts[1]-ts[0]:.2f})\n"
            f"  s2 +approx    {ts[2]:.2f}  (+{ts[2]-ts[1]:.2f})\n"
            f"  s3 +sort      {ts[3]:.2f}  (+{ts[3]-ts[2]:.2f})\n"
            f"  s4 +certs     {ts[4]:.2f}  (+{ts[4]-ts[3]:.2f})\n"
            f"  s5 +pack      {ts[5]:.2f}  (+{ts[5]-ts[4]:.2f})\n"
            f"  production    {t_prod:.2f}\n"
            f"  a2 topk       {t_a2:.2f}  {ok_rates['a2']:.3f} "
            f"match={ok_rates['a2_match']}\n"
            f"{a3_lines}"
        )
        del emb


main()
