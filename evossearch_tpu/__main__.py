"""Command-line interface: ``python -m evossearch_tpu <command>``.

The reference is server-only (``python oldapp.py``); the CLI adds scriptable
access to the same engine: index folders, search them, serve HTTP.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def _tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_leaves(v)
    else:
        yield tree


def _folder_fingerprint(folder, extensions) -> list[tuple]:
    """(path, mtime, size) for every candidate image, in scan order."""
    from .index.builder import scan_folder

    fp = []
    for p in scan_folder(folder, extensions):
        try:
            st = p.stat()
        except OSError:
            continue
        fp.append((str(p), st.st_mtime, st.st_size))
    return fp


def watch_folder(
    engine, folder: str, interval_s: float, max_cycles: int | None = None
) -> int:
    """Poll ``folder`` every ``interval_s`` seconds and incrementally
    re-index when any file is added, removed, or modified. Runs until
    interrupted (or ``max_cycles`` polls, for tests); returns the number
    of re-index runs performed."""
    import time

    exts = engine.cfg.SUPPORTED_EXTENSIONS

    def indexed_fingerprint():
        """What the LIVE INDEX covers — the baseline must be the index,
        not the current folder, so changes made before watch started
        still trigger a run."""
        _, reader = engine._cached_index(folder)
        if reader is None or not reader.metadata:
            return []
        return sorted(
            (m["path"], m["mtime"], m["size"]) for m in reader.metadata
        )

    last = indexed_fingerprint()
    runs = 0
    cycles = 0
    print(f"watching {folder} every {interval_s:g}s (ctrl-c to stop)",
          file=sys.stderr)
    while max_cycles is None or cycles < max_cycles:
        cycles += 1
        try:
            time.sleep(interval_s)
        except KeyboardInterrupt:
            break
        current = sorted(_folder_fingerprint(folder, exts))
        if current == last:
            continue
        try:
            count = engine.index_folder(folder, incremental=True)
            runs += 1
            print(json.dumps({"success": True, "count": count,
                              "watch_run": runs}), flush=True)
        except Exception as e:
            print(f"watch re-index failed: {e}", file=sys.stderr)
            continue  # keep watching; next change retries
        # Baseline becomes the FOLDER fingerprint that triggered this run
        # (not the index's): an undecodable file is in the folder forever
        # but never in the index, and an index-based baseline would
        # re-index every cycle until the end of time.
        last = current
    return runs


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="evossearch_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_index = sub.add_parser("index", help="(re)index an image folder")
    p_index.add_argument("folder")
    p_index.add_argument("--resume", action="store_true",
                         help="resume a crashed indexing run")
    p_index.add_argument("--incremental", action="store_true",
                         help="reuse embeddings of unchanged files")
    p_index.add_argument("--watch", type=float, default=0, metavar="SECONDS",
                         help="keep running: poll the folder every N "
                              "seconds and incrementally re-index when "
                              "files change (the reference requires a "
                              "manual /index per change)")

    p_search = sub.add_parser("search", help="text search an indexed folder")
    p_search.add_argument("folder")
    p_search.add_argument("query")
    p_search.add_argument("-k", type=int, default=12)

    p_similar = sub.add_parser("similar", help="find images similar to a file")
    p_similar.add_argument("folder")
    p_similar.add_argument("image")
    p_similar.add_argument("-k", type=int, default=12)

    p_serve = sub.add_parser("serve", help="run the HTTP server")
    p_serve.add_argument("--host", default=None)
    p_serve.add_argument("--port", type=int, default=None)

    p_train = sub.add_parser(
        "train",
        help="contrastive fine-tune on a folder of images + captions.json "
             "(pairs dataset; writes clip.npz usable via "
             "EVOSSEARCH_CHECKPOINT)",
    )
    p_train.add_argument("folder")
    p_train.add_argument("--epochs", type=int, default=1)
    p_train.add_argument("--batch-size", type=int, default=32)
    p_train.add_argument("--lr", type=float, default=1e-5)
    p_train.add_argument("--out", default="ckpts", help="checkpoint dir")
    p_train.add_argument("--resume", action="store_true",
                         help="resume from --out/clip.npz")
    p_train.add_argument("--init-from", default=None,
                         help="initial .npz checkpoint (e.g. from convert)")
    p_train.add_argument("--model", default=None,
                         help="CLIP variant (default: EVOSSEARCH_CLIP_MODEL)")

    p_sq8 = sub.add_parser(
        "sq8",
        help="prebuild the SQ8 capacity-tier sidecar for an indexed "
             "folder (production warm-up: otherwise it builds on the "
             "first over-HBM-budget query; no device needed)",
    )
    p_sq8.add_argument("folder")
    p_sq8.add_argument("--force", action="store_true",
                       help="rebuild even when a fresh sidecar exists")

    p_conv = sub.add_parser(
        "convert",
        help="convert an OpenAI .pt / HF CLIP checkpoint to the native "
             ".npz format (then set EVOSSEARCH_CHECKPOINT to use it)",
    )
    p_conv.add_argument("src", help="OpenAI .pt file or HF model directory")
    p_conv.add_argument("out", help="output .npz path")

    args = parser.parse_args(argv)

    if args.command == "train":
        from .core import CLIP_MODEL_SPECS, config
        from .models.checkpoint import load_params
        from .tokenizer import load_tokenizer
        from .train import PairDataset, fit

        name = args.model or config.CLIP_MODEL
        if name not in CLIP_MODEL_SPECS:
            print(f"unknown CLIP model {name!r}; available: "
                  f"{', '.join(CLIP_MODEL_SPECS)}", file=sys.stderr)
            return 1
        spec = CLIP_MODEL_SPECS[name]
        if spec.family == "resnet":
            print(f"{name} is a ResNet-family model; contrastive training "
                  "supports the ViT family only (frozen inference BatchNorm "
                  "— see train/contrastive.py)", file=sys.stderr)
            return 1
        params = None
        if args.init_from:
            params, loaded_spec = load_params(args.init_from)
            if loaded_spec != spec:
                print(f"--init-from checkpoint is {loaded_spec.name}, "
                      f"not {name}", file=sys.stderr)
                return 1
        tokenizer = load_tokenizer(config.BPE_VOCAB_PATH or None)
        dataset = PairDataset(
            args.folder, tokenizer, spec, batch_size=args.batch_size
        )
        params, history = fit(
            spec, dataset, epochs=args.epochs, learning_rate=args.lr,
            params=params, checkpoint_dir=args.out, resume=args.resume,
        )
        losses = [float(h) for h in history]
        if not any(math.isfinite(v) for v in losses):
            # zero training batches (e.g. <2 decodable captioned images):
            # report the failure instead of success:true with a bare NaN
            # token that strict JSON parsers reject
            print(json.dumps({
                "success": False, "model": name,
                "error": "no trainable batches (need >= 2 decodable "
                         "captioned images per batch)",
            }))
            return 1
        print(json.dumps({
            "success": True, "model": name, "epochs": args.epochs,
            "loss_history": [
                round(v, 4) if math.isfinite(v) else None for v in losses
            ],
            "checkpoint": f"{args.out}/clip.npz",
        }))
        return 0

    if args.command == "convert":
        # torch (CPU) only needed here — the serving/indexing paths never
        # import it. Reference counterpart: clip.load downloads+loads the
        # release checkpoint at startup (oldapp.py:28); here conversion is
        # a one-time offline step.
        from .models.checkpoint import save_params
        from .models.convert import load_checkpoint

        params, spec = load_checkpoint(args.src)
        written = save_params(args.out, params, spec)
        n_params = sum(int(p.size) for p in _tree_leaves(params))
        print(json.dumps({
            "success": True, "model": spec.name, "params": n_params,
            "out": str(written),
        }))
        return 0

    from .core import config
    from .engine import SearchEngine

    if args.command == "sq8":
        import time as _time

        from .index.sq8 import SQ8Index
        from .index.store import IndexReader

        reader = IndexReader.open(args.folder, config.INDEX_FOLDER_NAME)
        if reader is None:
            print("Folder not indexed", file=sys.stderr)
            return 1
        mt = reader.mtime()
        if not args.force:
            smt = SQ8Index.sidecar_mtime(reader)
            if smt is not None and smt >= mt and SQ8Index.load(
                reader, store_mtime=mt
            ) is not None:
                print(json.dumps(
                    {"success": True, "count": reader.count, "built": False}
                ))
                return 0
        t0 = _time.time()
        SQ8Index.build_from_reader(
            reader, fetch=config.SQ8_FETCH, store_mtime=mt
        )
        print(json.dumps({
            "success": True, "count": reader.count, "built": True,
            "seconds": round(_time.time() - t0, 1),
        }))
        return 0

    if args.command == "serve":
        from .server.__main__ import main as serve_main

        sys.argv = ["evossearch_tpu.server"]
        if args.host:
            sys.argv += ["--host", args.host]
        if args.port:
            sys.argv += ["--port", str(args.port)]
        serve_main()
        return 0

    engine = SearchEngine(cfg=config)

    if args.command == "index":
        count = engine.index_folder(
            args.folder, resume=args.resume,
            incremental=args.incremental or None,
        )
        if count == 0 and not args.watch:
            print("No images found in folder", file=sys.stderr)
            return 1
        print(json.dumps({"success": True, "count": count}))
        if args.watch:
            watch_folder(engine, args.folder, args.watch)
        return 0

    if args.command in ("search", "similar"):
        if args.command == "search":
            result = engine.search_text(args.folder, args.query, args.k)
        else:
            from PIL import Image

            result = engine.search_image(
                args.folder, Image.open(args.image), args.k
            )
        if result is None:
            print("Folder not indexed", file=sys.stderr)
            return 1
        scores, indices, reader = result
        for score, idx in zip(scores, indices):
            print(json.dumps(
                {"path": reader.paths[int(idx)], "similarity": float(score)}
            ))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
