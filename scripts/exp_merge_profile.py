"""One-off TPU experiment: per-op profile of the tree kernel's merge.

exp_tree_breakdown located ~1.5 ms of fixed post-kernel time (the
candidate merge: slices/concat, ApproxTopK, lexsort, counting
certificates, packing) that does not scale with corpus size. This
captures a jax.profiler perfetto trace of the packed tree search at
1M bf16 and prints device-op durations, so the slow op is named before
any restructuring.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/exp_merge_profile.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, D, K, REPS = 1_000_000, 512, 48, 8


def main():
    import jax
    import jax.numpy as jnp

    from evossearch_tpu.index.search import _pallas_topk_packed

    trivial = jax.jit(lambda x: x + 1.0)
    np.asarray(trivial(jnp.zeros((8,))))
    print(f"devices: {jax.devices()}", flush=True)

    emb = jax.random.normal(jax.random.key(0), (N, D), jnp.float32)
    emb = (emb / jnp.linalg.norm(emb, axis=1, keepdims=True)).astype(
        jnp.bfloat16
    )
    qs = jax.random.normal(jax.random.key(1), (K, D), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=1, keepdims=True)
    np.asarray(_pallas_topk_packed(emb, qs, K, False, True)[0, 0])  # compile

    log_dir = "/tmp/merge_profile"
    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        for _ in range(REPS):
            np.asarray(_pallas_topk_packed(emb, qs, K, False, True)[0, 0])

    paths = sorted(
        glob.glob(f"{log_dir}/**/*perfetto*", recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("NO perfetto trace produced; files:", flush=True)
        for p in glob.glob(f"{log_dir}/**/*", recursive=True):
            print(" ", p, flush=True)
        return
    path = paths[-1]
    print(f"trace: {path}", flush=True)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", trace if isinstance(trace, list) else [])
    # name the process/thread tracks
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_op = defaultdict(float)
    by_track = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        track = (
            f"{pid_names.get(e['pid'], e['pid'])}/"
            f"{tid_names.get((e['pid'], e['tid']), e['tid'])}"
        )
        by_track[track] += e["dur"]
        if "TPU" in track or "tpu" in track or "XLA Op" in track:
            by_op[e["name"]] += e["dur"]
    print("-- total dur (us) per track --", flush=True)
    for t, d in sorted(by_track.items(), key=lambda x: -x[1])[:12]:
        print(f"  {d/REPS:12.1f} us/rep  {t}", flush=True)
    # DEVICE ops only (fall back to all tracks if the trace exposes no
    # TPU track): aggregating every event mixed host spans (~30 ms/rep
    # relay waits) into the listing and could name a host wait as the
    # top "op" instead of the device merge op this script exists to find
    src = by_op or by_track
    which = "device ops" if by_op else "all tracks (no TPU track found)"
    print(f"-- top {which} (us/rep over {REPS} reps) --", flush=True)
    for name, d in sorted(src.items(), key=lambda x: -x[1])[:40]:
        print(f"  {d/REPS:12.1f}  {name[:110]}", flush=True)


main()
