"""Standalone A/B probe for the large-star/small-star round cost —
measures big_wcc_lss (bench.py's 50M-edge Zipf graph) in isolation and
cross-checks the component labels against hash-min wcc. Run ALONE
(bench clean-run discipline)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bench import big_graph  # noqa: E402
from linkgraph.operators import wcc  # noqa: E402
from linkgraph.operators.wcc import wcc_large_small_star  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="lss-probe", master="local[32]", shuffle_partitions=64)
    g = big_graph(spark, 64)
    g.edges.count()  # materialize the persisted layout outside the timing

    t = time.monotonic()
    lss = wcc_large_small_star(g)
    fp_lss = lss.agg(
        F.count("*").alias("n"), F.expr("bit_xor(xxhash64(id, comp))").alias("s")
    ).collect()[0]
    t_lss = time.monotonic() - t
    print(f"lss: {t_lss:.1f}s n={fp_lss['n']} sig={fp_lss['s']}")

    t = time.monotonic()
    hm = wcc(g)
    fp_hm = hm.agg(
        F.count("*").alias("n"), F.expr("bit_xor(xxhash64(id, comp))").alias("s")
    ).collect()[0]
    t_hm = time.monotonic() - t
    print(f"hashmin: {t_hm:.1f}s n={fp_hm['n']} sig={fp_hm['s']}")
    assert (fp_lss["n"], fp_lss["s"]) == (fp_hm["n"], fp_hm["s"]), "label mismatch"
    print("labels identical")
    spark.stop()


if __name__ == "__main__":
    main()
