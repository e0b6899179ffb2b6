"""TPU validation: the SQ8 certified capacity tier at scale.

Two phases:

  A (production path, 1M + 2M rows): the REAL SQ8Index pipeline —
    host quantize_rows over a host-resident bf16 corpus, device
    _sq8_select, host rerank with the store's score contract, the
    certificates, and the fallback — validated against a host exact
    oracle over the same bytes. This is bit-for-bit the engine's
    over-budget configuration (rows come from one host array, exactly
    like the mmap store).

  B (capacity, 20M rows): only the int8 sidecar fits; ground truth is
    the DEQUANTIZED corpus (scale_i * e8_i — computable bit-identically
    in any program), so the kernel, merge, id hi/lo packing, and
    certificates are validated at 2x the bf16 HBM ceiling while the
    slack rigor rides on phase A + the host property tests.

Hard-won harness rule: never compare rows REGENERATED in two different
XLA programs — reduction order and FMA contraction vary with fusion, so
regenerated f32/bf16 values are not bit-identical across programs
(observed: ~4e-4 score skew that shuffles near-rank ids). Materialize
once; gather from the one array. Production is immune (rows come from
the mmap store).

Run: PYTHONPATH=/root/repo python scripts/val_sq8.py
(never kill a TPU-attached process on this rig; let it finish)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D, K, Q = 512, 48, 48
CHUNK = 1 << 19
FETCH = 512


def log(msg):
    print(msg, flush=True)


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

    from evossearch_tpu.index.sq8 import (
        _ID_SPLIT, _sq8_select, quantize_rows_device,
    )
    from evossearch_tpu.ops.topk_pallas import SQ8_TILE_ROWS

    trivial = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,))
    t0 = time.perf_counter()
    np.asarray(trivial(z))
    log(f"devices: {jax.devices()} warmup {time.perf_counter() - t0:.1f}s")
    floor = p50(lambda: trivial(z), iters=9)
    log(f"RPC floor {floor:.1f}ms")

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen_corpus(key, n):
        def body(c, out):
            k = jax.random.fold_in(key, c)
            v = jax.random.normal(k, (CHUNK, D), jnp.float32)
            v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
            return jax.lax.dynamic_update_slice(
                out, v.astype(jnp.bfloat16), (c * CHUNK, 0))

        return jax.lax.fori_loop(
            0, n // CHUNK, body, jnp.zeros((n, D), jnp.bfloat16))

    # phase-B truth: dequantized corpus, one fp multiply per element —
    # bit-identical in every program
    @functools.partial(jax.jit, static_argnames=("n",))
    def oracle_dequant(e8, scal2, n, queries):
        qb = queries.astype(jnp.bfloat16).astype(jnp.float32)

        def body(c, carry):
            best_s, best_i = carry
            ids = c * CHUNK + jnp.arange(CHUNK)
            rows = jax.lax.dynamic_slice(
                e8, (c * CHUNK, 0), (CHUNK, D)).astype(jnp.float32)
            rows = rows * jax.lax.dynamic_slice(
                scal2, (0, c * CHUNK), (1, CHUNK))[0][:, None]
            s = jax.lax.dot_general(
                qb, rows, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            cs, cp = jax.lax.top_k(s, K)
            cand_s = jnp.concatenate([best_s, cs], axis=1)
            cand_i = jnp.concatenate([best_i, ids[cp]], axis=1)
            neg, idx = jax.lax.sort(
                (-cand_s, cand_i), dimension=1, num_keys=2)
            return -neg[:, :K], idx[:, :K]

        init = (jnp.full((Q, K), -jnp.inf, jnp.float32),
                jnp.zeros((Q, K), jnp.int32))
        return jax.lax.fori_loop(0, n // CHUNK, body, init)

    @jax.jit
    def rerank_dequant(e8, scal2, ids, queries):
        rows = e8[ids.reshape(-1)].reshape(*ids.shape, D).astype(jnp.float32)
        sc = scal2[0][ids.reshape(-1)].reshape(ids.shape)
        qb = queries.astype(jnp.bfloat16)
        dots = jnp.sum(
            rows * qb.astype(jnp.float32)[:, None, :], axis=2)
        return dots * sc

    def evaluate(name, n, e8, scal2, queries, rr_fn, oracle_fn,
                 fetch=FETCH):
        sel = lambda: _sq8_select(e8, scal2, queries, fetch, SQ8_TILE_ROWS,
                                  False)
        packed = np.asarray(sel())  # compile
        t_sel = p50(sel) - floor
        gbps = n * (D + 8) / (t_sel * 1e-3) / 1e9
        fb = packed[:, :fetch]
        ids = (packed[:, fetch:2 * fetch].astype(np.int64) * _ID_SPLIT
               + packed[:, 2 * fetch:3 * fetch].astype(np.int64))
        cnt_ok = packed[:, -2] > 0
        m3max = packed[:, -1]
        mf = fb[:, -1]
        rr = np.asarray(rr_fn(jnp.asarray(ids, jnp.int32)))
        os_, oi = map(np.asarray, oracle_fn())
        certs = matches = 0
        worst = 0.0
        for qi in range(Q):
            order = np.lexsort((ids[qi], -rr[qi]))[:K]
            s_q, i_q = rr[qi][order], ids[qi][order]
            m = s_q[-1]
            ok = cnt_ok[qi] and m >= mf[qi] and m3max[qi] < m
            certs += ok
            if ok:
                matches += bool((i_q == oi[qi]).all())
                worst = max(worst, float(np.abs(s_q - os_[qi]).max()))
        log(f"{name} N={n}: select p50 net {t_sel:.2f}ms ({gbps:.0f} GB/s, "
            f"{(t_sel + floor) / Q:.3f} ms/q wall) cert={certs}/{Q} "
            f"id_match={matches}/{certs} max|ds|={worst:.2e}")

    # -- phase A: the PRODUCTION SQ8Index pipeline over a host corpus -----
    import ml_dtypes

    from evossearch_tpu.index.sq8 import SQ8Index, quantize_rows

    class HostReader:
        def __init__(self, emb_h):
            self._emb = emb_h
            self.count, self.dim = emb_h.shape
            self.dtype_name = "bfloat16"
            self.root = "/tmp/nonexistent"

        def shard_arrays(self):
            return [self._emb]

    for n in (1 << 20, 2 << 20):
        key = jax.random.key(n)
        emb = gen_corpus(key, n)
        t0 = time.perf_counter()
        emb_h = np.asarray(emb).astype(ml_dtypes.bfloat16)  # ONE host copy
        del emb
        log(f"A N={n}: corpus fetched to host in "
            f"{time.perf_counter() - t0:.1f}s")
        qk = jax.random.fold_in(key, 2**31 - 1)
        queries = np.array(jax.random.normal(qk, (Q, D), jnp.float32))
        queries = queries / np.linalg.norm(queries, axis=1, keepdims=True)

        t0 = time.perf_counter()
        e8_h, scal2_h = quantize_rows(emb_h.astype(np.float32))
        idx = SQ8Index(e8_h, scal2_h, HostReader(emb_h), fetch=FETCH)
        idx.ensure_device()  # int8 upload rides the relay once
        log(f"A N={n}: host quantize + int8 upload "
            f"{time.perf_counter() - t0:.1f}s")
        idx.search_batch(queries, K)  # compile
        t_q = p50(lambda: np.concatenate(idx.search_batch(queries, K)),
                  iters=7)
        s, i = idx.search_batch(queries, K)
        # host oracle: the store score contract (widened rows x bf16(q))
        qb = queries.astype(ml_dtypes.bfloat16).astype(np.float32)
        s_all = emb_h.astype(np.float32) @ qb.T  # (n, Q)
        matches = 0
        worst = 0.0
        for qi in range(Q):
            o = np.lexsort((np.arange(n), -s_all[:, qi]))[:K]
            matches += bool((i[qi] == o).all())
            worst = max(worst, float(np.abs(s[qi] - s_all[o, qi]).max()))
        log(f"A/production N={n}: FULL pipeline (select + host rerank + "
            f"certs) p50 {t_q:.1f}ms wall for {Q} queries = "
            f"{t_q / Q:.3f} ms/q; id_match={matches}/{Q} "
            f"max|ds|={worst:.2e}")
        del idx, emb_h, e8_h

    # -- phase B: capacity scale, dequantized truth ------------------------
    n = 20 << 20
    key = jax.random.key(n)

    @functools.partial(jax.jit, static_argnames=("nn",))
    def build_direct(key, nn):
        def body(c, carry):
            e8_all, s2_all = carry
            k = jax.random.fold_in(key, c)
            v = jax.random.normal(k, (CHUNK, D), jnp.float32)
            v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
            e8, s2 = quantize_rows_device(
                v.astype(jnp.bfloat16).astype(jnp.float32))
            return (
                jax.lax.dynamic_update_slice(e8_all, e8, (c * CHUNK, 0)),
                jax.lax.dynamic_update_slice(s2_all, s2, (0, c * CHUNK)),
            )

        init = (jnp.zeros((nn, D), jnp.int8), jnp.zeros((2, nn), jnp.float32))
        return jax.lax.fori_loop(0, nn // CHUNK, body, init)

    t0 = time.perf_counter()
    e8, scal2 = build_direct(key, n)
    np.asarray(e8[0, 0])
    log(f"B/capacity N={n}: int8 corpus built in "
        f"{time.perf_counter() - t0:.1f}s ({n * D / 2**30:.1f} GB — the "
        f"bf16 original ({n * D * 2 / 2**30:.1f} GB) would not fit HBM)")
    qk = jax.random.fold_in(key, 2**31 - 1)
    queries = jax.random.normal(qk, (Q, D), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    # fetch ladder: the merge's ApproxTopK degenerates to a full O(n*k)
    # TopK (l == n at these k/recall points), so smaller fetch is the
    # merge-cost lever — IF the certificates still pass at this scale.
    # The oracle is fetch-INDEPENDENT: compute (and host-fetch) it once
    # for the whole ladder instead of sweeping the 10 GB corpus three
    # times.
    oracle_cache: list = []

    def oracle_once():
        if not oracle_cache:
            oracle_cache.append(tuple(
                np.asarray(x)
                for x in oracle_dequant(e8, scal2, n, queries)
            ))
        return oracle_cache[0]

    for fetch in (512, 256, 128):
        evaluate(
            f"B/capacity fetch={fetch}", n, e8, scal2, queries,
            lambda ids: rerank_dequant(e8, scal2, ids, queries),
            oracle_once,
            fetch=fetch,
        )


main()
