"""Isolate the extraction-engine cost on the replicated corpus
(VERDICT r3 wrong #2 follow-up: the interleaved A/B showed the r3 fused
scan REGRESSED mentions_linked; this measures each engine/shape alone).

    python scripts/measure_extract.py [cpus] [sf_dir]

Derives transcripts once (cached via localCheckpoint is too big — it
re-derives per leg identically), then times a count() over each
extraction shape. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from guac_spark import corpus, extract, link  # noqa: E402
from guac_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else (
        "/dev/shm/guac_scaling_repl256"
    )
    spark = get_spark(app_name="measure_extract", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t = corpus.transcripts(spark, sf_dir)
    adict = corpus.alias_dict(spark, sf_dir)

    shapes = {
        "mentions_arrow": lambda: extract.extract_mentions(t, "arrow"),
        "mentions_sql": lambda: extract.extract_mentions(t, "sql"),
        "fused_arrow": lambda: extract.extract_mentions_fused(t, "arrow"),
        "fused_sql": lambda: extract.extract_mentions_fused(t, "sql"),
        "aka_arrow": lambda: extract.extract_aka_pairs(t, "arrow"),
        "aka_sql": lambda: extract.extract_aka_pairs(t, "sql"),
        "linked_fused_arrow": lambda: link.link_exact(
            extract.extract_mentions_fused(t, "arrow"), adict
        ),
        "linked_fused_sql": lambda: link.link_exact(
            extract.extract_mentions_fused(t, "sql"), adict
        ),
    }
    out: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name, fn in shapes.items():
        t0 = time.time()
        counts[name] = fn().select(F.lit(1)).count()
        out[name] = round(time.time() - t0, 1)
    print(json.dumps({"cpus": cpus, "secs": out, "rows": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
