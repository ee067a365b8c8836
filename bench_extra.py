"""Extra benchmarks for the optimization rounds (guide §1: measure first).

NOT part of the driver contract — ``bench.py`` stays frozen. This harness
isolates individual headline queries with the noop sink, labels jobs, and
dumps ``.explain("formatted")`` plans so optimization claims are checkable.

Usage:
  python bench_extra.py time  [--sf DIR] [--reps N] [query ...]
  python bench_extra.py plans [--sf DIR] [--out DIR] [query ...]
  python bench_extra.py suite [--master local[8]] [--reps N]

``time`` prints one JSON line {query: best_sec}. ``plans`` writes
``<out>/<query>.txt``. ``suite`` times the fused audio suite (the bench.py
scaling workload) once per rep at the given master.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench as bench_mod  # noqa: E402  (frozen; used read-only for query list)


def _queries():
    import __spark_entry__ as entry_mod

    qs = dict(entry_mod.queries())
    for name in bench_mod.HEADLINE_QUERIES:
        if name not in qs:
            qs[name] = getattr(entry_mod, name)
    return qs


def cmd_time(args) -> None:
    from unify_spark.session import get_spark, stop_spark

    qs = _queries()
    names = args.queries or bench_mod.HEADLINE_QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    stop_spark()
    spark = get_spark("bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    out: dict[str, float] = {}
    try:
        qs["q_stats_lineitem"](spark, args.sf).collect()  # warm-up
        for rep in range(args.reps):
            for name in names:
                spark.sparkContext.setJobDescription(f"{name} rep{rep}")
                t0 = time.time()
                qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
                wall = round(time.time() - t0, 3)
                out[name] = min(out.get(name, wall), wall)
                spark.sparkContext.setJobDescription(None)
    finally:
        stop_spark()
    print(json.dumps({"sf_dir": args.sf, "queries": out}))


def cmd_plans(args) -> None:
    from unify_spark.session import get_spark, stop_spark

    qs = _queries()
    names = args.queries or bench_mod.HEADLINE_QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(args.out, exist_ok=True)
    stop_spark()
    spark = get_spark("bench-plans", master=f"local[{cpus}]", shuffle_partitions=cpus)
    try:
        for name in names:
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.out, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"[plans] wrote {name}", file=sys.stderr)
    finally:
        stop_spark()


def cmd_suite(args) -> None:
    walls = []
    for _ in range(args.reps):
        wall, n = bench_mod.run_suite(
            args.master, int(args.master.split("[")[1].rstrip("]")), reps=1
        )
        walls.append(round(wall, 2))
    print(json.dumps({"master": args.master, "walls": walls, "clips": n}))


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("time")
    t.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    t.add_argument("--reps", type=int, default=2)
    t.add_argument("queries", nargs="*")
    t.set_defaults(fn=cmd_time)
    pl = sub.add_parser("plans")
    pl.add_argument("--sf", default="/root/testdata/sf0.1")
    pl.add_argument("--out", default=os.path.join(REPO, "plans", "r06"))
    pl.add_argument("queries", nargs="*")
    pl.set_defaults(fn=cmd_plans)
    s = sub.add_parser("suite")
    s.add_argument("--master", default="local[8]")
    s.add_argument("--reps", type=int, default=2)
    s.set_defaults(fn=cmd_suite)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
