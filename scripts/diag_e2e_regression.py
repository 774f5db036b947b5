"""One-off diagnosis for the r3->r4 repl e2e regression (VERDICT r4 item 3).

Times _bench_replication in three states:
  A. fresh session (nothing else has run)
  B. after 2 full headline passes (the bench's actual measurement point)
  C. after B plus aggressive cleanup (clear_caches + catalog.clearCache +
     Python GC so py4j releases localCheckpoint RDD blocks)

If B >> A and C ~= A, the regression is accumulated block-manager/GC
pressure from the round-4 headline additions (semantic/serving persist +
localCheckpoint), and the fix is cleanup before the e2e measurement.
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _bench_replication  # noqa: E402
from hive3_replication_spark.llm.dedup import clear_caches  # noqa: E402
from hive3_replication_spark.registry import build_queries  # noqa: E402
from hive3_replication_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="h3r-diag")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()

    print("A: fresh e2e x2", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        r = _bench_replication(spark, sf_dir)
        print(f"  A{i}: {r} (wall {time.perf_counter()-t0:.2f})", flush=True)

    print("running 2 headline passes...", flush=True)
    for _p in range(2):
        clear_caches()
        for name in HEADLINE:
            queries[name](spark, sf_dir).count()

    print("B: post-headline e2e x2", flush=True)
    for i in range(2):
        r = _bench_replication(spark, sf_dir)
        print(f"  B{i}: {r}", flush=True)

    clear_caches()
    spark.catalog.clearCache()
    gc.collect()
    time.sleep(2)  # let async block removal drain
    print("C: post-cleanup e2e x2", flush=True)
    for i in range(2):
        r = _bench_replication(spark, sf_dir)
        print(f"  C{i}: {r}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
