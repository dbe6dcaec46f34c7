"""Command-line driver — the entry points a ``ray job submit`` deployment
invokes (north_star: "runs via ray job submit on fixed N-node and 4N-node
clusters"). Each subcommand owns the Ray session (guarded: under
``ray job submit`` or the test harness a session already exists and is
reused; standalone it initialises from RAY_ADDRESS / local).

    python -m pears_lite_ray build   --out /tmp/idx corpus-*.parquet
    python -m pears_lite_ray search  --index /tmp/idx "crystal lattice" -k 10
    python -m pears_lite_ray compact --index /tmp/idx
    python -m pears_lite_ray delete  --index /tmp/idx https://a.example/p/1
    python -m pears_lite_ray merge   --a idxA --b idxB --out idxM

Replaces the reference's Flask routes (app/indexer/controllers.py:64-120,
app/api/controllers.py:34-127) as the operational surface: same verbs,
batch-job shape instead of HTTP."""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
        )


def _cmd_build(args) -> dict:
    from .config import BuildConfig
    from .index.build import build_index

    cfg = BuildConfig(
        out_dir=args.out,
        tokenizer=args.tokenizer,
        vocab_path=None if args.tokenizer == "regex" else BuildConfig.vocab_path,
        keep_positions=not args.no_positions,
    )
    return build_index(args.inputs, cfg)


def _cmd_search(args) -> dict:
    from .query.engine import QueryEngine

    eng = QueryEngine(args.index, mode=args.mode)
    rows = eng.search(args.query, args.k)
    return {
        "query": args.query,
        "k": args.k,
        "mode": args.mode,
        "results": rows.to_pylist() if hasattr(rows, "to_pylist") else rows,
    }


def _cmd_compact(args) -> dict:
    from .config import BuildConfig
    from .index.maintenance import compact

    return compact(args.index, BuildConfig(out_dir=args.index,
                                           tokenizer=args.tokenizer,
                                           vocab_path=None))


def _cmd_delete(args) -> dict:
    from .index.maintenance import delete_urls

    tomb = delete_urls(args.index, args.urls)
    return {"tombstones": int(tomb.size)}


def _cmd_merge(args) -> dict:
    from .config import BuildConfig
    from .index.merge import merge_indexes

    return merge_indexes(
        args.a, args.b, args.out,
        BuildConfig(out_dir=args.out, tokenizer=args.tokenizer, vocab_path=None),
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pears_lite_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from parquet corpus files")
    b.add_argument("inputs", nargs="+")
    b.add_argument("--out", required=True)
    b.add_argument("--tokenizer", choices=("spm", "regex"), default="spm")
    b.add_argument("--no-positions", action="store_true")
    b.set_defaults(fn=_cmd_build)

    s = sub.add_parser("search", help="query an index")
    s.add_argument("query")
    s.add_argument("--index", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--mode", choices=("bm25", "pears"), default="bm25")
    s.set_defaults(fn=_cmd_search)

    c = sub.add_parser("compact", help="rebuild segments without tombstoned docs")
    c.add_argument("--index", required=True)
    c.add_argument("--tokenizer", choices=("spm", "regex"), default="regex")
    c.set_defaults(fn=_cmd_compact)

    d = sub.add_parser("delete", help="tombstone documents by url")
    d.add_argument("urls", nargs="+")
    d.add_argument("--index", required=True)
    d.set_defaults(fn=_cmd_delete)

    m = sub.add_parser("merge", help="union two indexes (S7 pod subscribe)")
    m.add_argument("--a", required=True)
    m.add_argument("--b", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--tokenizer", choices=("spm", "regex"), default="regex")
    m.set_defaults(fn=_cmd_merge)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    _ensure_ray()
    out = args.fn(args)
    json.dump(out, sys.stdout, indent=1, default=str)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
