"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in the sandbox, so the same extraction job runs on the
identical executor-generated input at two parallelism levels — local[8] (N)
and local[32] (4N) — and we report throughput at both plus scaling
efficiency = throughput@4N / (4 × throughput@N).

Each level runs in its own subprocess (fresh JVM — no session reuse
contamination). Results are printed as JSON and appended to BENCH.md.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "24000"))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1]); docs = int(sys.argv[2])
from pdf_extractor_spark import corpus
from pdf_extractor_spark.operators.extract import run_extract
from pdf_extractor_spark.session import get_spark
spark = get_spark(app_name=f"scale-{cores}", cores=cores, shuffle_partitions=2*cores)
spark.sparkContext.setLogLevel("ERROR")
# identical input at both levels: same (docs, seed, chunking)
pages = corpus.pages_df_distributed(spark, docs, seed=42, partitions=64).cache()
n = pages.count()
nbytes = pages.selectExpr("sum(length(html)) b").collect()[0]["b"]
t0 = time.time()
run_extract(pages.select("url","warc_ts","html"), num_partitions=2*cores, salt=1) \
    .write.format("noop").mode("overwrite").save()
el = time.time() - t0
print(json.dumps({"cores": cores, "docs": n, "bytes": int(nbytes),
                  "elapsed_s": round(el, 2),
                  "docs_per_sec": round(n/el, 1),
                  "bytes_per_sec": round(nbytes/el, 1)}))
spark.stop()
"""


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cores), str(DOCS)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.strip().splitlines()[::-1]:
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no JSON from cores={cores}: {out.stdout[-500:]} {out.stderr[-500:]}")


def main() -> None:
    n = run_level(8)
    n4 = run_level(32)
    eff = n4["docs_per_sec"] / (4 * n["docs_per_sec"])
    result = {
        "input_docs": DOCS,
        "N_cores": 8,
        "4N_cores": 32,
        "throughput_N_docs_per_sec": n["docs_per_sec"],
        "throughput_4N_docs_per_sec": n4["docs_per_sec"],
        "throughput_N_bytes_per_sec": n["bytes_per_sec"],
        "throughput_4N_bytes_per_sec": n4["bytes_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    print(json.dumps(result))
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(
            f"\n## Scaling run (extraction, {DOCS} docs, identical input)\n\n"
            f"| level | cores | docs/sec | bytes/sec | elapsed s |\n|---|---|---|---|---|\n"
            f"| N | 8 | {n['docs_per_sec']} | {n['bytes_per_sec']} | {n['elapsed_s']} |\n"
            f"| 4N | 32 | {n4['docs_per_sec']} | {n4['bytes_per_sec']} | {n4['elapsed_s']} |\n\n"
            f"**Scaling efficiency = {n4['docs_per_sec']} / (4 × {n['docs_per_sec']}) "
            f"= {result['scaling_efficiency']}** (target ≥ 0.8 → "
            f"{'MET' if result['meets_target'] else 'NOT MET'})\n"
        )


if __name__ == "__main__":
    main()
