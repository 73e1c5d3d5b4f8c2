"""CLI entry points: ``python -m myaku_ray <command>``.

The runner surface of the reference (myaku/runners/run_crawl.py,
rescore.py, build_first_page_cache.py) as subcommands over the Ray
pipelines.  Owns its Ray session (guarded init), unlike the library.

    python -m myaku_ray build   <pages_dir> <index_dir> [--cpus N]
    python -m myaku_ray update  <pages_dir> <index_dir> [--cpus N]
    python -m myaku_ray rescore <index_dir> [--now ISO] [--cpus N]
    python -m myaku_ray first-page <index_dir> [--cpus N]
    python -m myaku_ray search  <index_dir> <query> [--k K] [--page P]
    python -m myaku_ray phrase  <index_dir> <query> [--k K] [--near WINDOW]
    python -m myaku_ray delete  <index_dir> <url> [...]
    python -m myaku_ray gen     <out_dir> <n_pages>
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(cpus: int | None) -> None:
    import logging

    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, logging_level="ERROR"
        )
        if cpus:
            kwargs["num_cpus"] = cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _ratings() -> dict:
    from myaku_ray.corpus import gen_blogs_table

    blogs = gen_blogs_table()
    return dict(zip(blogs["blog_url"], blogs["rating"]))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="myaku_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("pages_dir")
    b.add_argument("index_dir")
    b.add_argument("--cpus", type=int, default=None)
    b.add_argument(
        "--positions", action="store_true",
        help="positional sidecar (enables phrase/near queries)",
    )

    u = sub.add_parser("update")
    u.add_argument("pages_dir")
    u.add_argument("index_dir")
    u.add_argument("--cpus", type=int, default=None)

    r = sub.add_parser("rescore")
    r.add_argument("index_dir")
    r.add_argument("--now", default=None, help="ISO timestamp (UTC naive)")
    r.add_argument("--cpus", type=int, default=None)

    f = sub.add_parser("first-page")
    f.add_argument("index_dir")
    f.add_argument("--cpus", type=int, default=None)

    s = sub.add_parser("search")
    s.add_argument("index_dir")
    s.add_argument("query")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--page", type=int, default=None)
    s.add_argument(
        "--since", default=None, metavar="YYYY-MM-DD",
        help="only docs crawled on/after this UTC date (filter semantics)",
    )
    s.add_argument(
        "--until", default=None, metavar="YYYY-MM-DD",
        help="only docs crawled before this UTC date (exclusive)",
    )
    s.add_argument(
        "--title-boost", type=float, default=None, metavar="B",
        help="fielded ranking: add B to a term's contribution when the "
        "doc title contains it",
    )

    ph = sub.add_parser("phrase")
    ph.add_argument("index_dir")
    ph.add_argument("query")
    ph.add_argument("--k", type=int, default=10)
    ph.add_argument(
        "--near", type=int, default=None, metavar="WINDOW",
        help="proximity mode: every term within WINDOW chars",
    )

    ml = sub.add_parser("mlt", help="more-like-this: related docs for a seed doc_id")
    ml.add_argument("index_dir")
    ml.add_argument("doc_id", type=int)
    ml.add_argument("--k", type=int, default=10)

    px = sub.add_parser(
        "prefix", help="trailing-wildcard search: terms starting with PREFIX"
    )
    px.add_argument("index_dir")
    px.add_argument("prefix")
    px.add_argument("--k", type=int, default=10)

    wc = sub.add_parser(
        "wildcard", help="general-wildcard search: *ab, a*c, *b*, a*b*c"
    )
    wc.add_argument("index_dir")
    wc.add_argument("pattern")
    wc.add_argument("--k", type=int, default=10)

    fz = sub.add_parser(
        "fuzzy", help="edit-distance search: vocabulary terms within --dist"
    )
    fz.add_argument("index_dir")
    fz.add_argument("term")
    fz.add_argument("--k", type=int, default=10)
    fz.add_argument("--dist", type=int, default=1)

    d = sub.add_parser("delete")
    d.add_argument("index_dir")
    d.add_argument("urls", nargs="+")
    d.add_argument("--cpus", type=int, default=None)

    g = sub.add_parser("gen")
    g.add_argument("out_dir")
    g.add_argument("n_pages", type=int)
    g.add_argument("--cpus", type=int, default=None)

    c = sub.add_parser("compact")
    c.add_argument("index_dir")
    c.add_argument("--cpus", type=int, default=None)

    mg = sub.add_parser("merge")
    mg.add_argument("out_dir")
    mg.add_argument("shard_index", nargs="+")
    mg.add_argument("--cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "build":
        _init_ray(args.cpus)
        from myaku_ray.pipelines.build import build_index

        m = build_index(
            args.pages_dir, args.index_dir, blog_ratings=_ratings(),
            with_positions=args.positions,
        )
        print(json.dumps({"stats": m["stats"]}))
    elif args.cmd == "update":
        _init_ray(args.cpus)
        from myaku_ray.pipelines.update import update_index

        m = update_index(args.pages_dir, args.index_dir, blog_ratings=_ratings())
        print(json.dumps({k: v for k, v in m.items() if k != "stats"}))
    elif args.cmd == "rescore":
        _init_ray(args.cpus)
        from datetime import datetime

        from myaku_ray.corpus import FIXED_NOW
        from myaku_ray.pipelines.rescore import rescore_index

        now = datetime.fromisoformat(args.now) if args.now else FIXED_NOW
        m = rescore_index(args.index_dir, now=now, blog_ratings=_ratings())
        print(json.dumps({k: v for k, v in m.items() if k != "stats"}))
    elif args.cmd == "first-page":
        _init_ray(args.cpus)
        from myaku_ray.pipelines.first_page import build_first_page_cache

        print(json.dumps(build_first_page_cache(args.index_dir)))
    elif args.cmd == "compact":
        _init_ray(args.cpus)
        from myaku_ray.pipelines.update import compact_index

        m = compact_index(args.index_dir)
        print(json.dumps({k: v for k, v in m.items() if k != "stats"}))
    elif args.cmd == "merge":
        _init_ray(args.cpus)
        from myaku_ray.pipelines.merge import merge_indexes

        m = merge_indexes(args.shard_index, args.out_dir)
        print(json.dumps(m))
    elif args.cmd == "search":
        from myaku_ray.index.searcher import Searcher

        s_ = Searcher(args.index_dir)
        if args.since or args.until:
            import datetime as _dt

            def _us(d: str | None, default: int) -> int:
                if d is None:
                    return default
                t = _dt.datetime.strptime(d, "%Y-%m-%d")
                return int(t.replace(tzinfo=_dt.timezone.utc).timestamp()) * 10**6

            lo = _us(args.since, 0)
            hi = _us(args.until, 2**62) - (1 if args.until else 0)
            hits = s_.hydrate(
                s_.topk_in_range(args.query, lo, hi, args.k), args.query
            )
        elif args.title_boost is not None:
            hits = s_.hydrate(
                s_.topk_title_boost(args.query, args.k, args.title_boost),
                args.query,
            )
        else:
            hits = (
                s_.search_page(args.query, args.page)
                if args.page
                else s_.search(args.query, k=args.k)
            )
        for h in hits:
            print(
                json.dumps(
                    {
                        "doc_id": h.doc_id,
                        "score": round(h.score, 5),
                        "url": h.url,
                        "title": h.title,
                        "preview": h.preview,
                    },
                    ensure_ascii=False,
                )
            )
    elif args.cmd == "phrase":
        from myaku_ray.index.searcher import Searcher

        s_ = Searcher(args.index_dir)
        hits = (
            s_.near_topk(args.query, args.near, args.k)
            if args.near is not None
            else s_.phrase_topk(args.query, args.k)
        )
        for h in s_.hydrate(hits, args.query):
            print(
                json.dumps(
                    {
                        "doc_id": h.doc_id,
                        "score": round(h.score, 5),
                        "url": h.url,
                        "title": h.title,
                    },
                    ensure_ascii=False,
                )
            )
    elif args.cmd == "mlt":
        from myaku_ray.index.searcher import Searcher

        s_ = Searcher(args.index_dir)
        hits = s_.more_like_this(args.doc_id, args.k)
        for h in s_.hydrate(hits, ""):
            print(
                json.dumps(
                    {
                        "doc_id": h.doc_id,
                        "score": round(h.score, 5),
                        "url": h.url,
                        "title": h.title,
                    },
                    ensure_ascii=False,
                )
            )
    elif args.cmd == "prefix":
        from myaku_ray.index.searcher import Searcher

        s_ = Searcher(args.index_dir)
        hits = s_.prefix_topk(args.prefix, args.k)
        for h in s_.hydrate(hits, args.prefix):
            print(
                json.dumps(
                    {
                        "doc_id": h.doc_id,
                        "score": round(h.score, 5),
                        "url": h.url,
                        "title": h.title,
                    },
                    ensure_ascii=False,
                )
            )
    elif args.cmd == "wildcard":
        from myaku_ray.index.searcher import Searcher

        s_ = Searcher(args.index_dir)
        hits = s_.wildcard_topk(args.pattern, args.k)
        for h in s_.hydrate(hits, args.pattern):
            print(
                json.dumps(
                    {
                        "doc_id": h.doc_id,
                        "score": round(h.score, 5),
                        "url": h.url,
                        "title": h.title,
                    },
                    ensure_ascii=False,
                )
            )
    elif args.cmd == "fuzzy":
        from myaku_ray.index.searcher import Searcher

        s_ = Searcher(args.index_dir)
        hits = s_.fuzzy_topk(args.term, args.k, max_dist=args.dist)
        for h in s_.hydrate(hits, args.term):
            print(
                json.dumps(
                    {
                        "doc_id": h.doc_id,
                        "score": round(h.score, 5),
                        "url": h.url,
                        "title": h.title,
                    },
                    ensure_ascii=False,
                )
            )
    elif args.cmd == "delete":
        _init_ray(args.cpus)
        from myaku_ray.pipelines.update import delete_urls

        print(json.dumps(delete_urls(args.index_dir, args.urls)))
    elif args.cmd == "gen":
        _init_ray(args.cpus)
        from myaku_ray.corpus import write_pages_parquet

        write_pages_parquet(args.out_dir, args.n_pages)
        print(json.dumps({"out": args.out_dir, "n_pages": args.n_pages}))

    import ray

    if ray.is_initialized():
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
