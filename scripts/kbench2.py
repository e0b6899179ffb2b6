"""Microbench 2: (a) chained vs fused dispatch wall latency on the relay,
(b) packed single-dispatch exact-top-k kernel sweep at 1M/10M, f32/bf16.

Run on the real TPU:  python scripts/kbench2.py
Interleaves reps round-robin across candidates to cancel relay drift.
"""
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from evossearch_tpu.index.search import (
    _fast_topk_batch_packed,
    _pallas_topk_packed,
    _topk_batch,
)

D, K = 512, 48


def sync(x):
    return np.asarray(x)


@functools.partial(jax.jit, static_argnames=("k",))
def _blocked_packed(emb, queries, k):
    s, i = _topk_batch.__wrapped__(emb, queries, k)
    ok = jnp.ones((s.shape[0], 1), jnp.float32)
    return jnp.concatenate([s, i.astype(jnp.float32), ok], axis=1)


def interleaved_p50(named_fns, reps=21):
    walls = {name: [] for name, _ in named_fns}
    for _ in range(reps):
        for name, fn in named_fns:
            t0 = time.perf_counter()
            fn()
            walls[name].append((time.perf_counter() - t0) * 1e3)
    return {n: float(np.percentile(w, 50)) for n, w in walls.items()}


@functools.partial(jax.jit, static_argnames=("n", "d", "chunks", "dtype"))
def _gen_corpus(n, d, chunks, dtype):
    rows = n // chunks

    def body(i, out):
        key = jax.random.fold_in(jax.random.key(0), i)
        c = jax.random.normal(key, (rows, d), jnp.float32)
        c = (c / jnp.linalg.norm(c, axis=1, keepdims=True)).astype(dtype)
        return jax.lax.dynamic_update_slice(out, c, (i * rows, 0))

    return jax.lax.fori_loop(0, chunks, body, jnp.zeros((n, d), dtype))


def kernel_sweep(n, dtype, qs):
    print(f"-- sweep N={n} dtype={jnp.dtype(dtype).name} --", flush=True)
    emb = _gen_corpus(n, D, 20 if n > 2_000_000 else 1, dtype)
    sync(emb[0, 0])
    for q in qs:
        qv = jax.random.normal(jax.random.key(1), (q, D), jnp.float32)
        qv = qv / jnp.linalg.norm(qv, axis=1, keepdims=True)
        cands = [
            ("certified", lambda: sync(_fast_topk_batch_packed(emb, qv, K))),
            ("blocked", lambda: sync(_blocked_packed(emb, qv, K))),
            ("pallas_blk", lambda: sync(_pallas_topk_packed(emb, qv, K, False, False))),
            ("pallas_tree", lambda: sync(_pallas_topk_packed(emb, qv, K, False, True))),
        ]
        for _, fn in cands:  # warm/compile
            fn()
        res = interleaved_p50(cands)
        floor = res_floor()
        line = " ".join(f"{k2}={v:.2f}({v-floor:.2f})" for k2, v in res.items())
        print(f"Q={q}: floor={floor:.2f} wall(net): {line}", flush=True)
    del emb


_trivial = jax.jit(lambda x: x + 1.0)
_z = jnp.zeros((8,))


def res_floor(reps=15):
    sync(_trivial(_z))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(_trivial(_z))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50))


def chain_vs_fused():
    print("-- chained vs fused dispatch --", flush=True)
    n = 1_000_000
    emb = jax.random.normal(jax.random.key(0), (n, D), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    sync(emb[0, 0])
    # stand-in "text tower": 12 chained 512x512 matmuls over a token-derived vec
    W = jax.random.normal(jax.random.key(2), (12, D, D), jnp.float32) * 0.02
    tok = jnp.arange(77, dtype=jnp.int32)

    @jax.jit
    def enc(W, tok):
        x = jnp.ones((1, D), jnp.float32) * (tok.sum() % 97).astype(jnp.float32) / 97.0
        def body(x, w):
            return jnp.tanh(x @ w), None
        x, _ = jax.lax.scan(body, x, W)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    @functools.partial(jax.jit, static_argnames=("k",))
    def fused(W, tok, emb, k):
        x = jnp.ones((1, D), jnp.float32) * (tok.sum() % 97).astype(jnp.float32) / 97.0
        def body(x, w):
            return jnp.tanh(x @ w), None
        x, _ = jax.lax.scan(body, x, W)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        s, i = _topk_batch.__wrapped__(emb, x, k)
        return jnp.concatenate([s, i.astype(jnp.float32)], axis=1)

    def chained():
        qv = enc(W, tok)
        return sync(_blocked_packed(emb, qv, K))

    def chained_sync_mid():
        qv = sync(enc(W, tok))
        return sync(_blocked_packed(emb, jnp.asarray(qv), K))

    def one_fused():
        return sync(fused(W, tok, emb, K))

    for fn in (chained, chained_sync_mid, one_fused):
        fn()
    res = interleaved_p50([
        ("chained_async", chained),
        ("chained_syncmid", chained_sync_mid),
        ("fused", one_fused),
    ])
    floor = res_floor()
    print(f"floor={floor:.2f} " + " ".join(f"{k2}={v:.2f}" for k2, v in res.items()), flush=True)
    del emb


def main():
    print("devices:", jax.devices(), flush=True)
    sync(_trivial(_z))  # claim handshake
    print(f"floor={res_floor():.2f}ms", flush=True)
    chain_vs_fused()
    kernel_sweep(1_000_000, jnp.float32, (1, 48, 64))
    kernel_sweep(1_000_000, jnp.bfloat16, (1, 64))
    kernel_sweep(10_000_000, jnp.bfloat16, (1, 64))


main()
