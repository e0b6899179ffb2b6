"""evossearch_tpu — a TPU-native semantic image search framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
`evo-ssearch` reference application (see /root/repo/SURVEY.md): CLIP-based
natural-language and image-to-image search over local photo folders.

Layer map (bottom-up):
    core/        dtype policy, model constants, config (env-var surface of
                 reference config.py:18-99), mesh helpers
    tokenizer/   byte-BPE CLIP text tokenizer (host-side)
    models/      functional JAX CLIP image+text towers + checkpoint converters
    preprocess/  image decode + resize/center-crop/normalize (device-side)
    ops/         Pallas TPU kernels (fused L2norm+GEMM+streaming top-k, IVF)
    index/       memory-mapped embedding shard store + index builder
    parallel/    jax.sharding Mesh / shard_map corpus sharding + ICI top-k merge
    train/       contrastive fine-tuning (pjit train step, dp/tp shardings)
    server/      stdlib WSGI micro-framework + HTTP API (contract of
                 reference oldapp.py routes) + SPA frontend
    utils/       structured logging, timing, profiling hooks
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level exports; jax-importing modules load only when used.
    if name == "SearchEngine":
        from .engine import SearchEngine

        return SearchEngine
    if name == "Config":
        from .core import Config

        return Config
    if name == "create_app":
        from .server import create_app

        return create_app
    raise AttributeError(f"module 'evossearch_tpu' has no attribute {name!r}")
