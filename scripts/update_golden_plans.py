"""Regenerate the golden-plan snapshots under tests/golden_plans/.

Run after an INTENTIONAL planner-rewrite change (or a Spark upgrade),
review the diff, and commit — the same workflow as the reference's
golden-file updates.

Usage: python scripts/update_golden_plans.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

# anchor to the repo root so the updater works from any CWD
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from flink_psl_spark import get_spark
from _golden_plans import ALL_GOLDEN, GOLDEN_DIR, golden_signature


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[4]")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in ALL_GOLDEN:
        sig = golden_signature(spark, sf_dir, name)
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(sig, f, indent=2)
            f.write("\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
