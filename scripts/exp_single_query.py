"""Round-4 experiment: where do the single-query milliseconds go?

VERDICT r3 item 2: a lone exact top-48 query at 1M measured 62.5 ms wall
(32.1 ms net of the ~30 ms RPC floor) in BENCH_r02 while a 48-query batch
was 34.4 ms TOTAL. Hypotheses: (a) the per-iteration ``queries[:1]``
slice is its own eager dispatch that serializes a second relay round
trip; (b) the Q=1 kernel shape is slow; (c) the packed fetch pays more
than one round trip. This script times each variant on the real chip.

Run: PYTHONPATH=/root/repo python scripts/exp_single_query.py
"""
import sys
import time

import numpy as np

N, D, K = 1_000_000, 512, 48


def log(m):
    print(m, file=sys.stderr, flush=True)


def p50(fn, iters=20):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50)), float(np.percentile(ts, 90))


def main():
    import jax
    import jax.numpy as jnp

    from evossearch_tpu.index.search import (
        _fast_topk_batch_packed, _pallas_topk_packed,
        best_exact_search_batch,
    )
    from evossearch_tpu.ops.topk_pallas import use_tree_kernel

    t0 = time.perf_counter()
    trivial = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,))
    np.asarray(trivial(z))
    log(f"warmup/claim: {time.perf_counter() - t0:.1f}s; devices={jax.devices()}")

    emb = jax.random.normal(jax.random.key(0), (N, D), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    q48 = jax.random.normal(jax.random.key(1), (48, D), jnp.float32)
    q48 = q48 / jnp.linalg.norm(q48, axis=1, keepdims=True)
    q1 = jnp.asarray(q48[:1])  # pre-sliced, committed
    np.asarray(q1)  # force materialization
    tree = use_tree_kernel(N, K, emb.dtype)
    log(f"tree kernel: {tree}")

    # compiles
    np.asarray(_pallas_topk_packed(emb, q48, K, False, tree))
    np.asarray(_pallas_topk_packed(emb, q1, K, False, tree))
    np.asarray(_pallas_topk_packed(emb, q1, K, False, not tree))
    np.asarray(_fast_topk_batch_packed(emb, q1, K))
    best_exact_search_batch(emb, q48, K)
    best_exact_search_batch(emb, q1, K)

    f, f90 = p50(lambda: np.asarray(trivial(z)))
    log(f"floor: p50={f:.2f} p90={f90:.2f}")

    b, b90 = p50(lambda: best_exact_search_batch(emb, q48, K)[0])
    log(f"A batched48 best_exact(full API): p50={b:.2f} p90={b90:.2f} "
        f"net={b - f:.2f}")

    s, s90 = p50(lambda: best_exact_search_batch(emb, q1, K)[0])
    log(f"B single best_exact(hoisted q1): p50={s:.2f} p90={s90:.2f} "
        f"net={s - f:.2f}")

    s2, s290 = p50(lambda: best_exact_search_batch(emb, q48[:1], K)[0])
    log(f"C single best_exact(per-iter slice): p50={s2:.2f} p90={s290:.2f} "
        f"net={s2 - f:.2f}")

    r, r90 = p50(lambda: np.asarray(_pallas_topk_packed(emb, q1, K, False, tree)))
    log(f"D single raw pallas packed tree={tree}: p50={r:.2f} p90={r90:.2f} "
        f"net={r - f:.2f}")

    r2, r290 = p50(
        lambda: np.asarray(_pallas_topk_packed(emb, q1, K, False, not tree))
    )
    log(f"E single raw pallas packed tree={not tree}: p50={r2:.2f} "
        f"p90={r290:.2f} net={r2 - f:.2f}")

    x, x90 = p50(lambda: np.asarray(_fast_topk_batch_packed(emb, q1, K)))
    log(f"F single certified-XLA packed: p50={x:.2f} p90={x90:.2f} "
        f"net={x - f:.2f}")

    # dispatch-issue cost alone (no fetch): how long does the host spend
    # issuing the kernel dispatch through the relay?
    def dispatch_only():
        _pallas_topk_packed(emb, q1, K, False, tree)

    d, d90 = p50(dispatch_only)
    log(f"G dispatch-only (no fetch): p50={d:.2f} p90={d90:.2f}")
    np.asarray(_pallas_topk_packed(emb, q1, K, False, tree))  # drain

    # two dependent dispatches + fetch: does a dependency chain pay 2 floors?
    def chained():
        qq = q48[:1]  # eager slice dispatch
        return np.asarray(_pallas_topk_packed(emb, qq, K, False, tree))

    c, c90 = p50(chained)
    log(f"H slice + kernel + fetch chained: p50={c:.2f} p90={c90:.2f} "
        f"net={c - f:.2f}")

    log("done")


main()
