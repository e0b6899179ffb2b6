"""CPU smoke test for bench.py's phases (no TPU claim, reduced scale).

Validates that each phase runs end-to-end — imports resolve, APIs match,
summary lines print — so a hardware bench run never dies to a typo.
Not a performance measurement.

Usage: python scripts/smoke_bench_phases.py [phase ...]
       (default: bench_serve bench_train — the round-4 additions)
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon,cpu

import bench  # noqa: E402


def shrink() -> None:
    bench.N_VECTORS = 20_000
    bench.QUERY_BATCH = 8
    bench.ITERS = 3


def smoke_serve() -> None:
    # shrink the module-level constants bench_serve reads via closure
    import types

    src_fn = bench.bench_serve
    g = dict(src_fn.__globals__)
    small = types.FunctionType(src_fn.__code__, g, src_fn.__name__)
    g["N_VECTORS"] = 20_000
    # bench_serve hardcodes n, chunk, threads, per_thread locally; patch by
    # running the real function but with a tiny store via monkeypatched
    # IndexWriter chunking is overkill — instead exec a tweaked copy.
    import inspect
    import textwrap

    src = inspect.getsource(bench.bench_serve)
    src = src.replace("n, chunk = 1_000_000, 1 << 17", "n, chunk = 4096, 2048")
    src = src.replace("threads, per_thread = 8, 40", "threads, per_thread = 4, 3")
    ns = dict(bench.__dict__)
    exec(textwrap.dedent(src), ns)
    ns["bench_serve"]()


def smoke_train() -> None:
    import inspect
    import textwrap

    src = inspect.getsource(bench.bench_train)
    src = src.replace("bs = 256", "bs = 4")
    src = src.replace("reps = 10", "reps = 2")
    src = src.replace('CLIP_MODEL_SPECS["ViT-B/32"]', "_TINY_SPEC")
    ns = dict(bench.__dict__)
    from evossearch_tpu.core import CLIP_MODEL_SPECS

    ns["_TINY_SPEC"] = CLIP_MODEL_SPECS["ViT-B/32"]
    exec(textwrap.dedent(src), ns)
    ns["bench_train"]()


def smoke_search() -> None:
    shrink()
    bench.bench_search()


def smoke_encode_rn50() -> None:
    # full RN50 at batch 1 x 1 rep: ~seconds on CPU, exercises the real
    # spec + conv stack + flops accounting end to end
    bench._bench_encode_spec("RN50", batch=1, reps=1)


SMOKES = {
    "bench_serve": smoke_serve,
    "bench_train": smoke_train,
    "bench_search": smoke_search,
    "bench_encode_rn50": smoke_encode_rn50,
}


if __name__ == "__main__":
    names = sys.argv[1:] or ["bench_serve", "bench_train"]
    for name in names:
        print(f"--- smoke {name} ---", file=sys.stderr, flush=True)
        SMOKES[name]()
    print("SMOKE OK", file=sys.stderr)
