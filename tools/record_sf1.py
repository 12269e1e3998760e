"""Measure the plan-deciding sf1 entries and min-merge them into the
durable BENCH_SF1.json floor record (r13 VERDICT item 4).

The r13 A/B proved sf0.1 plan wins can invert at sf1 (score-after-
distinct: 2x better at sf0.1, 4.2x worse at sf1), so sf1 is the scale
that settles plan-shape arguments — but until r14 its deciding numbers
(r11 margin chain 29.5 s, r13 thresholded chain 22.63 s) lived in
round-notes prose where no floor or reprobe prior could challenge them.
This tool times the REGISTRY entries those arguments were about (keys
are registry names, so the floors are comparable run-over-run and
survive `min_merge_record`'s valid-keys pruning) and folds the mins into
BENCH_SF1.json via ``bench.record_extra_floors``.

Protocol per the documented box pathology (ambient drift 1.5-3x): the
.sf1 manifest is verified first (a mismatched corpus would record
incomparable floors), an untouched CONTROL entry (docs_exact_dedup)
interleaves every sweep, order alternates per rep, and the MIN of REPS
is recorded — a timing is an upper bound, so min never lies.

Usage:
    python tools/make_sfn.py                 # once, builds/verifies .sf1
    python tools/record_sf1.py [--reps 3]
Headline floors at sf1 come from bench.py itself:
    SPARK_GRAFT_SF_DIR=/root/repo/.sf1 SPARK_GRAFT_HEADLINE_ONLY=1 \
        python bench.py
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import record_extra_floors  # noqa: E402
from cupertino_nvr_spark.plans import REGISTRY  # noqa: E402
from cupertino_nvr_spark.session import get_spark  # noqa: E402

SF1_DIR = Path(__file__).resolve().parent.parent / ".sf1"

# The entries whose sf1 numbers keep deciding plan shapes, plus the
# ambient-drift control. Everything here is a REGISTRY name (the floor
# record's key contract); the deliberately-quadratic correctness
# baselines stay out — they have no business at sf1.
ENTRIES = [
    "docs_exact_dedup",           # the control every sf1 window runs
    "embedding_cosine_neardup",   # the r13 A/B thresholded chain (22.63 s)
    "embedding_margin_pairs",     # the r11 margin chain (29.5 s)
    "docs_simhash_neardup",       # capped production pairing at 10x docs
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--skip-verify",
        action="store_true",
        help="skip the .sf1 manifest verification — PRINT-ONLY: floors "
        "measured against an unverified corpus are not comparable, so "
        "nothing is min-merged into the durable record",
    )
    args = ap.parse_args()

    if not SF1_DIR.exists():
        sys.exit(f"{SF1_DIR} missing — run tools/make_sfn.py first")
    if not args.skip_verify:
        # floors are only comparable against a manifest-verified corpus
        rc = subprocess.run(
            [sys.executable, "tools/make_sfn.py", "--verify-only"],
            cwd=str(SF1_DIR.parent),
        ).returncode
        if rc != 0:
            sys.exit("manifest verification failed — not recording")

    spark = get_spark("record-sf1")
    sf_dir = str(SF1_DIR)

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # warm the scan + UDF workers outside every timed window
    timed("docs_exact_dedup")

    results: dict[str, list[float]] = {n: [] for n in ENTRIES}
    for rep in range(args.reps):
        seq = ENTRIES if rep % 2 == 0 else ENTRIES[::-1]
        for name in seq:
            results[name].append(timed(name))
            print(f"rep{rep} {name}: {results[name][-1]}", flush=True)

    floors = {name: min(ts) for name, ts in results.items()}
    print("min-of-%d floors: %s" % (args.reps, floors), flush=True)
    if args.skip_verify:
        # a floor against an unverified corpus could enter the record
        # too LOW and, under min-merge, never be raised again — the
        # unreachable-prior pathology the def-round drops exist to fix
        print("--skip-verify: corpus unverified, NOT recording", flush=True)
        return
    path = record_extra_floors(floors, sf=1.0)
    print(f"min-merged into {path}", flush=True)


if __name__ == "__main__":
    main()
