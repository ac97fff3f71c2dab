"""CLI — the engine's counterparts to the reference's entry points.

Reference                                  → here
-----------------------------------------------------------------
python src/extract/f1_dataExtractor.py     → ingest   (landed raw → silver lake)
python src/transform/f1_dataTransformer.py → transform (normalizing CSV round-trip)
streamlit run streamlit_app.py (queries)   → query    (named query to stdout)
(none)                                     → bench    (see bench.py)

Usage:
    python -m f1_data_engineering_spark ingest   <raw_dir> <lake_dir> [tables…]
    python -m f1_data_engineering_spark transform <in_dir> <out_dir>
    python -m f1_data_engineering_spark query    <name> [sf_dir] [--limit N]
    python -m f1_data_engineering_spark list
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="f1_data_engineering_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ing = sub.add_parser("ingest", help="raw CSV session tree → typed silver lake")
    p_ing.add_argument("raw_dir")
    p_ing.add_argument("lake_dir")
    p_ing.add_argument("tables", nargs="*", default=None)

    p_tr = sub.add_parser("transform", help="EP2 normalizing CSV round-trip")
    p_tr.add_argument("in_dir")
    p_tr.add_argument("out_dir")

    p_q = sub.add_parser("query", help="run a named query")
    p_q.add_argument("name")
    p_q.add_argument("sf_dir", nargs="?", default=None)
    p_q.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list available queries")

    args = ap.parse_args(argv)

    import __spark_entry__ as entry_mod  # noqa: PLC0415

    if args.cmd == "list":
        for name in entry_mod.queries():
            print(name)
        return 0

    from .session import get_spark
    from .sources.registry import default_sf_dir

    spark = get_spark(app_name=f"f1des-{args.cmd}")

    if args.cmd == "ingest":
        from .pipeline import ingest_session_tree
        from .sources.f1_compat import STRING_COLUMNS_TO_TIMEDELTA

        tables = tuple(args.tables) or tuple(STRING_COLUMNS_TO_TIMEDELTA)
        counts = ingest_session_tree(spark, args.raw_dir, args.lake_dir, tables)
        for t, n in counts.items():
            print(f"{t}: {n} rows")
        return 0

    if args.cmd == "transform":
        from .sources.f1_compat import transform_csv_tree

        stats = transform_csv_tree(spark, args.in_dir, args.out_dir)
        for t, n in stats.items():
            print(f"{t}: {n} columns transformed")
        return 0

    if args.cmd == "query":
        qs = entry_mod.queries()
        if args.name not in qs:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        df = qs[args.name](spark, args.sf_dir or default_sf_dir())
        df.show(args.limit, truncate=False)
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
