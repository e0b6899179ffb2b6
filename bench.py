"""Benchmark: exact top-48 query latency at 1M vectors (the BASELINE.md
headline search metric; target p50 < 10 ms on one TPU v5e chip).

Prints ONE JSON line:
  {"metric": ..., "value": p50_ms, "unit": "ms", "vs_baseline": 10.0/p50}
vs_baseline > 1.0 means better (faster) than the 10 ms target.

Extra context (encode throughput, p99) goes to stderr.

Sync methodology: under the axon loopback platform, jax.block_until_ready
returns before device execution completes, so every timed region syncs by
fetching a (small) result to host with np.asarray().
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_VECTORS = 1_000_000
DIM = 512
K = 48
WARMUP = 5
ITERS = 50
TARGET_P50_MS = 10.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_search() -> dict:
    import jax
    import jax.numpy as jnp

    from evossearch_tpu.index.search import _topk_matvec

    log(f"devices: {jax.devices()}")
    key = jax.random.key(0)
    emb = jax.random.normal(key, (N_VECTORS, DIM), dtype=jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    emb = jax.device_put(emb)
    queries = jax.random.normal(jax.random.key(1), (ITERS + WARMUP, DIM),
                                dtype=jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)

    # warmup (compile + cache); np.asarray is the host-sync point
    for i in range(WARMUP):
        np.asarray(_topk_matvec(emb, queries[i], K)[0])

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        s, ix = _topk_matvec(emb, queries[WARMUP + i], K)
        np.asarray(s)
        np.asarray(ix)
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.array(times)
    p50, p99 = float(np.percentile(times, 50)), float(np.percentile(times, 99))
    log(f"search p50={p50:.3f}ms p99={p99:.3f}ms min={times.min():.3f}ms "
        f"(N={N_VECTORS}, d={DIM}, k={K})")
    return {"p50_ms": p50, "p99_ms": p99}


def bench_encode() -> None:
    """Secondary: ViT-B/32 image encode throughput (preprocessed inputs)."""
    import jax
    import jax.numpy as jnp

    from evossearch_tpu.core import CLIP_MODEL_SPECS
    from evossearch_tpu.models import encode_image, init_params

    spec = CLIP_MODEL_SPECS["ViT-B/32"]
    params = init_params(jax.random.key(0), spec)
    batch = 256
    images = jax.random.normal(
        jax.random.key(2), (batch, 224, 224, 3), dtype=jnp.bfloat16
    )

    @jax.jit
    def fwd(p, x):
        return encode_image(p, x, spec, compute_dtype=jnp.bfloat16)

    np.asarray(fwd(params, images))  # compile + warm
    t0 = time.perf_counter()
    reps = 10
    outs = [fwd(params, images) for _ in range(reps)]
    for out in outs:
        np.asarray(out)  # host sync (see module docstring)
    dt = time.perf_counter() - t0
    ips = reps * batch / dt
    log(f"encode ViT-B/32 bf16: {ips:.0f} images/sec/chip (batch {batch}) "
        f"[target >= 1000]")


def main() -> None:
    try:
        bench_encode()
    except Exception as e:  # secondary metric must not kill the primary one
        log(f"encode bench failed: {e}")
    stats = bench_search()
    p50 = stats["p50_ms"]
    print(json.dumps({
        "metric": "exact_top48_query_p50_at_1M_vectors",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_P50_MS / p50, 3),
    }))


if __name__ == "__main__":
    main()
