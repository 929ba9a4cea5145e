"""Per-query isolation harness (round-7 optimization work).

NOT the driver bench — bench.py is frozen for measurement. This tool times
individual declared queries with the noop sink (guide §1.4), optionally
captures .explain("formatted") into plans/r07/<query>_<tag>.txt, and prints
one JSON line per run so before/after evidence can be cited in
OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 \
      --queries q_range_count,q_components --reps 2 \
      [--explain plans/r07 --tag before] [--conf k=v ...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from giga_spatial_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True, help="comma-separated query names, or 'all'")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None, help="directory to write explain dumps")
    ap.add_argument("--tag", default="now", help="suffix for explain files (before/after)")
    ap.add_argument("--conf", action="append", default=[], help="extra spark conf k=v")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("bench_extra", cores=args.cores, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    Q = E.queries()
    names = list(Q) if args.queries == "all" else args.queries.split(",")

    out: dict[str, float] = {}
    for name in names:
        df = Q[name](spark, args.sf)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        best = float("inf")
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
            t0 = time.perf_counter()
            Q[name](spark, args.sf).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf, "tag": args.tag, "loadavg": round(os.getloadavg()[0], 2), "queries": out}))


if __name__ == "__main__":
    main()
