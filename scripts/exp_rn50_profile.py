"""RN50 MFU attribution (VERDICT r4 #7: the family's low point at ~38%).

Times each tower segment (stem / stage1-4 / attnpool) as its own jit with
device-resident inputs, fetch-last over many reps (per-dispatch relay
overhead amortized), and reports per-segment MFU against the analytic
matmul FLOPs — pinpointing where the missing ~62% of the MXU goes.
Also sweeps the full-tower batch size and two numeric variants:
  * f32-chain: keep the conv output in f32 through BN+ReLU, one cast at
    the end (today: conv casts to bf16, BN upcasts to f32 again);
  * bn-bf16: apply the folded scale/bias in bf16 (today: f32).

Run ON THE TPU: python scripts/exp_rn50_profile.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import _paired_reps_ms, _settle_scalar
from evossearch_tpu.core import CLIP_MODEL_SPECS
from evossearch_tpu.models import encode_image, init_params
from evossearch_tpu.models.resnet import (
    _attn_pool, _avg_pool, _bn, _conv, _stage,
)

V5E_PEAK = 197e12
SPEC = CLIP_MODEL_SPECS["RN50"]
BATCH = 128
REPS = 40


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def timed(fn, *args, reps: int = REPS) -> float:
    """ms per rep via bench.py's paired-reps (wall(2N) - wall(N) with a
    scalar-reduce settle — fetching a (B, 56, 56, 256) activation ships
    hundreds of MB through the ~11-20 MB/s relay and dominated the first
    version of this experiment). Shares bench's implementation so the
    drift guard (retry + conservative fallback, never negative) applies
    to this attribution report identically."""
    _settle_scalar(fn(*args))  # compile
    ms, note = _paired_reps_ms(lambda: fn(*args), reps)
    if note:
        log(f"    note:{note}")
    return ms


def stem_flops(s: int, w: int) -> float:
    return (2 * s * s * 9 * 3 * (w // 2)
            + 2 * s * s * 9 * (w // 2) * (w // 2)
            + 2 * s * s * 9 * (w // 2) * w)


def stage_flops(i: int, s_in: int, cin: int, w: int, n_blocks: int):
    """(flops, s_out, c_out) for stage i (0-based) at input spatial s_in."""
    planes = w * (2 ** i)
    stride = 1 if i == 0 else 2
    s_out = s_in // stride
    f = 0
    for b in range(n_blocks):
        c_in = cin if b == 0 else planes * 4
        sp_in = s_in if b == 0 else s_out
        f += 2 * sp_in * sp_in * c_in * planes
        f += 2 * sp_in * sp_in * 9 * planes * planes
        f += 2 * s_out * s_out * planes * planes * 4
        if b == 0:
            f += 2 * s_out * s_out * c_in * planes * 4
    return f, s_out, planes * 4


def attnpool_flops(spec) -> float:
    C, T = spec.attn_dim, spec.num_image_tokens
    return 2 * C * C + 2 * 2 * T * C * C + 2 * C * spec.embed_dim


def main() -> None:
    params = init_params(jax.random.key(0), SPEC)
    v = params["visual"]
    key = jax.random.key(1)
    img = jax.random.normal(
        key, (BATCH, SPEC.image_size, SPEC.image_size, 3), jnp.bfloat16
    )

    @jax.jit
    def full(p, x):
        return encode_image(p, x, SPEC, compute_dtype=jnp.bfloat16)

    total_flops = stem_flops(SPEC.image_size // 2, SPEC.vision_width)
    s, c = SPEC.image_size // 4, SPEC.vision_width
    seg_flops = [("stem", total_flops)]
    for i, n in enumerate(SPEC.vision_layers):
        f, s, c = stage_flops(i, s, c, SPEC.vision_width, n)
        seg_flops.append((f"stage{i + 1}", f))
        total_flops += f
    seg_flops.append(("attnpool", attnpool_flops(SPEC)))
    total_flops += attnpool_flops(SPEC)
    # the per-segment split must reconcile with bench.py's MFU
    # denominator — this attribution report exists to explain the bench
    # number, so a drift between the two formulas is a bug here
    from bench import _resnet_fwd_flops

    bench_total = _resnet_fwd_flops(SPEC)
    assert abs(total_flops - bench_total) / bench_total < 1e-6, (
        total_flops, bench_total,
    )

    full_ms = timed(full, params, img)
    ips = BATCH / full_ms * 1e3
    log(f"full tower batch {BATCH}: {full_ms:.2f} ms = {ips:.0f} img/s, "
        f"MFU {ips * total_flops / V5E_PEAK:.1%} "
        f"(analytic {total_flops / 1e9:.2f} GFLOP/img)")

    # -- per-segment timing with device-resident inputs -----------------
    w = SPEC.vision_width

    @jax.jit
    def stem_fn(vv, x):
        st = vv["stem"]
        x = jax.nn.relu(_bn(st["bn1"], _conv(x, st["conv1"]["kernel"], 2, 1)))
        x = jax.nn.relu(_bn(st["bn2"], _conv(x, st["conv2"]["kernel"], 1, 1)))
        x = jax.nn.relu(_bn(st["bn3"], _conv(x, st["conv3"]["kernel"], 1, 1)))
        return _avg_pool(x, 2)

    import functools

    @functools.partial(jax.jit, static_argnames=("i", "stride"))
    def stage_fn(vv, x, i, stride):
        return _stage(vv[f"stage{i}"], x, stride, False)

    @jax.jit
    def pool_fn(vv, x):
        return _attn_pool(vv["attnpool"], x, SPEC.vision_heads)

    acts = {"stem_in": img}
    x = stem_fn(v, img)
    acts["stage_in"] = [x]
    for i, stride in enumerate((1, 2, 2, 2)):
        x = stage_fn(v, acts["stage_in"][-1], i + 1, stride)
        acts["stage_in"].append(x)

    rows = []
    ms = timed(stem_fn, v, img)
    rows.append(("stem", ms, seg_flops[0][1]))
    for i, stride in enumerate((1, 2, 2, 2)):
        ms = timed(
            lambda vv, xx, i=i, st=stride: stage_fn(vv, xx, i + 1, st),
            v, acts["stage_in"][i],
        )
        rows.append((f"stage{i + 1}", ms, seg_flops[i + 1][1]))
    ms = timed(pool_fn, v, acts["stage_in"][4])
    rows.append(("attnpool", ms, seg_flops[5][1]))

    seg_sum = sum(r[1] for r in rows)
    log(f"segment sum {seg_sum:.2f} ms vs full {full_ms:.2f} ms "
        f"(gap = inter-segment fusion / paired-reps noise)")
    for name, ms, f in rows:
        mfu = BATCH * f / (ms * 1e-3) / V5E_PEAK
        log(f"  {name:9s} {ms:7.2f} ms  {f / 1e9:6.2f} GFLOP/img  "
            f"MFU {mfu:5.1%}  share {ms / seg_sum:5.1%}")

    # -- batch sweep -----------------------------------------------------
    for b in (64, 256, 512):
        im = jax.random.normal(
            key, (b, SPEC.image_size, SPEC.image_size, 3), jnp.bfloat16
        )
        ms = timed(full, params, im, reps=max(8, REPS * 128 // b))
        ips_b = b / ms * 1e3
        log(f"batch {b:4d}: {ips_b:7.0f} img/s  "
            f"MFU {ips_b * total_flops / V5E_PEAK:.1%}")


if __name__ == "__main__":
    main()
