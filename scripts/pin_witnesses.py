#!/usr/bin/env python
"""Regenerate the `_WITNESS_PINS` constants in `__spark_entry__.py`.

Runs each no-oracle registry query at the given sf dirs and prints the
(row count, bit_xor(xxhash64(*))) fingerprint of its output (computed the
same way `_witnessed` does, over the query's own columns minus `witness`).
Run after any INTENTIONAL algorithm change, eyeball the diff, paste the
dict. Usage:

    python scripts/pin_witnesses.py [sf_dir ...]   # default sf0.001 sf0.01
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

WITNESSED = [
    "minhash_dedup_docs",
    "simhash_docs",
    "openie_web_corpus",
    "media_decode_features",
    "phash_neardup_media",
    "mp4_container_meta",
    "mp4_frame_decode",
    "audiohash_neardup",
    "bpe_encode_docs",
]


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    from kgspark.session import get_spark

    spark = get_spark("pin-witnesses", cpus=8)
    # stale pins would fire the FAIL-marker row and inflate the fingerprint
    # count by 1 — always pin from the unmarked ("unpinned") output
    E._WITNESS_PINS.clear()
    qs = E.queries()
    print("_WITNESS_PINS: dict[tuple[str, str], tuple[int, int]] = {")
    for sf in sf_dirs:
        base = Path(sf.rstrip("/")).name
        for name in WITNESSED:
            df = qs[name](spark, sf).drop("witness")
            cols = ", ".join(f"`{c}`" for c in df.columns)
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.expr(f"bit_xor(xxhash64({cols}))"), F.lit(0)).alias("h"),
            ).first()
            print(f'    ("{name}", "{base}"): ({row["n"]}, {row["h"]}),')
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
