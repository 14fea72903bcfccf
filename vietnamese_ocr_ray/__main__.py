"""CLI entry points — the ``ray job submit`` surface.

    python -m vietnamese_ocr_ray synth   --sf-dir /root/testdata/sf0.01 --out /tmp/corpus
    python -m vietnamese_ocr_ray extract --docs /tmp/corpus/docs --media /tmp/corpus/media \
        --out /tmp/extracted [--mode cogroup] [--resume]
    python -m vietnamese_ocr_ray predict-txt --extracted /tmp/extracted --out /tmp/pred

On a real cluster the same commands run via
``ray job submit -- python -m vietnamese_ocr_ray extract ...`` — the
code only ever talks to the Dataset API, so local vs multi-node is a
``ray.init`` concern. The CLI owns its Ray session (library code never
calls ray.init/shutdown).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv=None):
    p = argparse.ArgumentParser(prog="vietnamese_ocr_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth", help="synthesize an interleaved corpus from a documents table")
    sp.add_argument("--sf-dir", required=True)
    sp.add_argument("--out", required=True)

    ep = sub.add_parser("extract", help="run the flagship extraction pipeline (resumable)")
    ep.add_argument("--docs", required=True)
    ep.add_argument("--media", required=True)
    ep.add_argument("--out", required=True)
    ep.add_argument("--mode", default="cogroup", choices=["cogroup", "join", "broadcast", "copartitioned"])
    ep.add_argument("--chunk-fragments", type=int, default=8)
    ep.add_argument(
        "--cogroup-buckets",
        type=int,
        default=96,
        help="logical join buckets; use >> physical partition count "
        "(input blocks) so range partitioning cannot skew",
    )
    ep.add_argument(
        "--recognize-compute",
        default="actors",
        choices=["actors", "tasks"],
        help="actors pins model weights per worker (GPU shape); tasks "
        "caches per process and lets the executor rebalance CPUs",
    )
    ep.add_argument("--recognize-batch-size", type=int, default=2048)

    tp = sub.add_parser("predict-txt", help="format extracted output as reference prediction.txt")
    tp.add_argument("--extracted", required=True)
    tp.add_argument("--out", required=True)

    mf = sub.add_parser("media-features", help="per-image feature extraction over a media table")
    mf.add_argument("--media", required=True)
    mf.add_argument("--out", required=True)

    cp = sub.add_parser(
        "compact",
        help="merge small parquet fragments into target-size files "
        "(post-resumable-write maintenance)",
    )
    cp.add_argument("--in-dir", required=True)
    cp.add_argument("--out", required=True)
    cp.add_argument("--target-mb", type=int, default=64)

    dm = sub.add_parser(
        "demo",
        help="interactive single-record path (the app.py analog, "
        "reference app.py:33-61): render --text to an image, run the "
        "single-image predict path, print JSON",
    )
    dm.add_argument("--text", required=True)
    dm.add_argument("--media-ref", default="demo-0")
    dm.add_argument("--height", type=int, default=64)

    args = p.parse_args(argv)
    if args.cmd == "demo":
        # single-record path: no Ray session needed (reference app.py
        # also runs in-process; predict_single caches its model)
        from vietnamese_ocr_ray.pipelines.extract import predict_single
        from vietnamese_ocr_ray.synth import clean_words, render_text

        # multi-word input: one render+predict per cleaned token (the
        # corpus pipeline's media spans are single words; app.py lines
        # decompose the same way)
        words = clean_words(args.text) or ["a"]
        preds = []
        for i, w in enumerate(words):
            img = render_text(w, args.height)
            preds.append(predict_single(img, f"{args.media_ref}-{i}"))
        print(
            json.dumps(
                {
                    "media_ref": args.media_ref,
                    "n_words": len(words),
                    "text": " ".join(preds),
                    "match": preds == [w or "a" for w in words],
                }
            )
        )
        return 0
    ray = _ray_session()
    try:
        if args.cmd == "synth":
            from vietnamese_ocr_ray.synth import synth_from_documents

            docs_dir, media_dir = synth_from_documents(
                os.path.join(args.sf_dir, "documents.parquet"), args.out
            )
            print(json.dumps({"docs": docs_dir, "media": media_dir}))
        elif args.cmd == "extract":
            from vietnamese_ocr_ray.pipelines.extract import run_extract

            kwargs = dict(
                chunk_fragments=args.chunk_fragments,
                media_mode=args.mode,
                recognize_batch_size=args.recognize_batch_size,
                recognize_compute=args.recognize_compute,
            )
            if args.mode != "copartitioned":  # bucket count fixed by storage there
                kwargs["cogroup_buckets"] = args.cogroup_buckets
            summary = run_extract(args.docs, args.media, args.out, **kwargs)
            print(json.dumps(summary))
        elif args.cmd == "media-features":
            import ray.data as rd

            from vietnamese_ocr_ray.stages.multimodal import media_features

            ds = rd.read_parquet(
                args.media, columns=["media_ref", "image", "height", "width"]
            )
            media_features(ds).write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        elif args.cmd == "compact":
            from vietnamese_ocr_ray.sources.storage import compact_fragments

            print(
                json.dumps(
                    compact_fragments(args.in_dir, args.out, args.target_mb)
                )
            )
        elif args.cmd == "predict-txt":
            import ray.data as rd

            from vietnamese_ocr_ray.sinks import write_predictions_txt

            ds = rd.read_parquet(args.extracted)
            print(write_predictions_txt(ds, args.out))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
