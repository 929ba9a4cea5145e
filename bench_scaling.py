"""Scaling-efficiency evidence for the north rule.

No real cluster exists in this sandbox, so N vs 4N executors is evidenced
by running the IDENTICAL job on the IDENTICAL input at local[8] vs
local[32] (shuffle partitions scaled proportionally, 2×cores), each in a
fresh JVM, with an in-JVM warmup so steady-state throughput is measured.

    efficiency = throughput_32 / (4 × throughput_8)  =  T_8 / (4 × T_32)

Writes BENCH/BASELINE.md. Usage:  python bench_scaling.py [n_pages]
Child mode (one parallelism level): python bench_scaling.py --child CORES N
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def child(cores: int, n_pages: int) -> None:
    from giga_spatial_spark import synth
    from giga_spatial_spark.pipeline import enrich_fused
    from giga_spatial_spark.session import get_spark
    from giga_spatial_spark.sources.webpages import ensure_webpages_parquet

    spark = get_spark(f"scale-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_webpages_parquet(
        spark, n_pages, os.path.join(REPO, ".cache", f"webpages_{n_pages}")
    )
    pages = spark.read.parquet(path)
    polys = synth.make_admin_polygons()

    def run():
        enrich_fused(pages, polys).write.mode("overwrite").format("noop").save()

    # warmup (codegen + python workers + JIT), then 3 timed runs, keep best
    enrich_fused(pages.limit(20000), polys).write.mode("overwrite").format("noop").save()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({"cores": cores, "sec": round(best, 3),
                      "docs_per_sec": round(n_pages / best, 1)}))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    # pre-generate the input once (32 cores) so neither timed child pays it
    subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from giga_spatial_spark.session import get_spark; "
         "from giga_spatial_spark.sources.webpages import ensure_webpages_parquet; "
         "import os; spark = get_spark('pregen', cores=32); "
         "ensure_webpages_parquet(spark, %d, os.path.join(%r, '.cache', 'webpages_%d'))"
         % (REPO, n_pages, REPO, n_pages)],
        check=True, cwd=REPO, capture_output=True, text=True,
    )
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(cores), str(n_pages)],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)

    t8, t32 = results[8]["sec"], results[32]["sec"]
    eff = t8 / (4 * t32)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — scaling evidence (N vs 4N)\n\n"
            "Flagship spatial-enrichment pipeline (fused single-Python-pass: "
            "html→text → geo-entity extract → mercator tile assign → "
            "broadcast grid-index PIP → salted zonal rollup) on the identical "
            "generated web-pages "
            f"table ({n_pages:,} pages, ~30% hot-cluster skew), identical "
            "code, fresh JVM per level, shuffle partitions = 2×cores.\n\n"
            "| config | wall sec | docs/sec |\n|---|---|---|\n"
            f"| local[8]  (N)  | {t8:.3f} | {results[8]['docs_per_sec']:,} |\n"
            f"| local[32] (4N) | {t32:.3f} | {results[32]['docs_per_sec']:,} |\n\n"
            f"**scaling efficiency (8→32 cores) = T8/(4·T32) = {eff:.3f}** "
            f"(target ≥ 0.8)\n\n"
            "Run via spark-submit (engine packaged as zip):\n\n"
            "```bash\npython package_pyfiles.py  # builds dist/giga_spatial_spark.zip\n"
            "spark-submit --master local[32] --py-files dist/giga_spatial_spark.zip \\\n"
            "  bench.py\n```\n"
        )
    print(json.dumps({"efficiency": round(eff, 3), "t8": t8, "t32": t32}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
