"""Scaling-efficiency evidence for the POSITIONAL index build.

Same methodology as tools/bench_scaling.py (fresh JVM per level,
repeated builds with min reported, identical shuffle partitioning so
only the executor-slot count varies): the north rule's two-cluster-size
criterion evidenced as local[2] vs local[8] — the clean 4x contrast
within this host's 16 physical cores (see BENCH/BASELINE.md hardware
note; 8->32 is SMT-capped at ~2.25x raw).

Usage: python tools/bench_pos_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 480_000
LEVELS = (2, 8)
SHUFFLE = 64

JOB = """
import json, sys, time, tempfile, shutil
sys.path.insert(0, {repo!r})
from sifter_mrc_search_engine_spark.session import get_spark
from sifter_mrc_search_engine_spark.operators.positional import write_positional_index

cpus, corpus, shuffle, trials = int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
spark = get_spark("posscale", master=f"local[{{cpus}}]", shuffle_partitions=shuffle)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(corpus)
times = []
for trial in range(trials):
    d = tempfile.mkdtemp(prefix=f"posscale_{{cpus}}_")
    t0 = time.monotonic()
    stats = write_positional_index(pages, d)
    times.append(round(time.monotonic() - t0, 3))
    shutil.rmtree(d, ignore_errors=True)
best = min(times)
print("RESULT " + json.dumps({{"cpus": cpus, "all_s": times, "build_s": best,
      "docs_per_sec": round(stats["n_docs"] / best, 1)}}))
spark.stop()
"""


def main() -> None:
    import shutil

    corpus = tempfile.mkdtemp(prefix="posscale_corpus_")
    prep = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
        "from sifter_mrc_search_engine_spark.session import get_spark\n"
        "from sifter_mrc_search_engine_spark.sources.pages import synthesize_pages\n"
        "spark = get_spark('prep', master='local[32]')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"synthesize_pages(spark, {N_DOCS}, partitions=64).selectExpr(\n"
        "    \"cast(split(url, '/')[4] as long) as doc_id\", 'text'\n"
        f").write.mode('overwrite').parquet({corpus!r})\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", prep], check=True, capture_output=True)

    job = JOB.format(repo=str(REPO))
    results = {}
    trials_by_level = {2: 3, 8: 4}
    try:
        for cpus in LEVELS:
            p = subprocess.run(
                [sys.executable, "-c", job, str(cpus), corpus, str(SHUFFLE),
                 str(trials_by_level.get(cpus, 3))],
                capture_output=True, text=True, check=True,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")][-1]
            results[cpus] = json.loads(line[len("RESULT "):])
            print(results[cpus], flush=True)
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
    t2, t8 = (results[c]["build_s"] for c in LEVELS)
    print(json.dumps({
        "n_docs": N_DOCS,
        "shuffle_partitions": SHUFFLE,
        "build_s": {str(c): results[c]["build_s"] for c in LEVELS},
        "docs_per_sec": {str(c): results[c]["docs_per_sec"] for c in LEVELS},
        "efficiency_2_to_8": round(t2 / (4.0 * t8), 3),
    }))


if __name__ == "__main__":
    main()
