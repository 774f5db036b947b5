"""Two-decade counter probe for the round-11 web operators (L2e / L37).

The scale claims: (1) llm_dedup_url's canonical-URL group count grows
linearly with the corpus — groups = ceil(docs/3), so a ×N read lands at
N within one partial tail group (9.998 / 99.98 on the 5,000-doc base,
never a round N.000); (2) llm_domain_authority's domain-level edge
relation SATURATES
in key space (n_domains is fixed by the (lang, source) vocabulary, so
distinct edges stop growing) while edge MASS Σw grows exactly linearly
— the property that keeps the per-iteration join cost flat at any
corpus size. Any super-linear drift in either counter would expose a
hidden pair surface; any growth in distinct-edge count beyond the
saturation bound would expose a corpus-shaped iteration input.

Usage: python scripts/probe_web_scaling.py (uses $SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hive3_replication_spark.llm.dedup import clear_caches  # noqa: E402
from hive3_replication_spark.llm.web import (  # noqa: E402
    _domain_graph,
    llm_dedup_url,
    llm_domain_authority,
)
from hive3_replication_spark.session import get_spark  # noqa: E402
from scripts.gen_scale_probe import generate  # noqa: E402


def _counters(spark, d: str) -> dict:
    clear_caches()
    out: dict = {}
    t0 = time.perf_counter()
    # the two headline counters come from bench.py's canonical
    # definitions (ONE source of truth — round-11 review); this probe
    # only ADDS the saturation/timing columns the bench doesn't carry
    from bench import _web_counts_one

    shared = _web_counts_one(spark, d)
    out["dedup_url_sec"] = round(time.perf_counter() - t0, 3)
    out["url_groups"] = shared["url_groups"]
    out["edge_mass"] = shared["domain_edge_mass"]
    grp = llm_dedup_url(spark, d).agg(
        F.sum("n_copies").alias("docs"),
        F.sum(F.expr("CASE WHEN n_copies > 1 THEN 1 ELSE 0 END")).alias(
            "dup_groups"
        ),
    ).collect()[0]
    out["url_docs"] = int(grp["docs"])
    out["url_dup_groups"] = int(grp["dup_groups"])

    doms, edges = _domain_graph(spark, d)
    out["n_domains"] = doms.count()
    out["n_distinct_edges"] = int(edges.count())
    t0 = time.perf_counter()
    llm_domain_authority(spark, d).count()
    out["authority_sec"] = round(time.perf_counter() - t0, 3)
    clear_caches()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    x10_dir = os.path.join(repo_root, ".scaleprobe", "sf1")
    x100_dir = os.path.join(repo_root, ".scaleprobe", "sf10")
    spark = get_spark(app_name="h3r-probe-web")
    spark.sparkContext.setLogLevel("ERROR")
    generate(sf_dir, x10_dir, factor=10)
    generate(sf_dir, x100_dir, factor=100)

    out: dict = {"metric": "web_scaling_probe"}
    for tag, d in (("base", sf_dir), ("x10", x10_dir), ("x100", x100_dir)):
        for k, v in _counters(spark, d).items():
            out[f"{k}_{tag}"] = v
    for k in ("url_groups", "url_dup_groups", "edge_mass"):
        out[f"{k}_ratio_x10"] = round(out[f"{k}_x10"] / out[f"{k}_base"], 3)
        out[f"{k}_ratio_x100"] = round(
            out[f"{k}_x100"] / out[f"{k}_base"], 3
        )
    # saturation: distinct edges must be CONSTANT once every (src, tgt)
    # residue pair is populated (n_domains is corpus-size-independent)
    out["edge_saturation"] = (
        out["n_distinct_edges_x10"] == out["n_distinct_edges_x100"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
