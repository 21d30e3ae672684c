"""Operational CLI for the materialize-once artifact store.

Usage::

    python scripts/artifacts_cli.py status [sf_dir]
    python scripts/artifacts_cli.py build  [sf_dir] [family ...]
    python scripts/artifacts_cli.py drop   [sf_dir]
    python scripts/artifacts_cli.py gc --keep-latest N

``status`` prints build state + row counts per (family, kind);
``build`` forces construction (all four families by default) — the
ingest-time step a scheduler would own at 100 TB; ``drop`` removes the
dataset's artifact directory (next consumer rebuilds from scratch);
``gc`` keeps the N most recently built corpus fingerprints and removes
the rest (regenerated corpora leave dead fingerprints behind).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datas_spark.operators import artifacts as ART  # noqa: E402
from datas_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("status", "build", "drop", "gc"):
        print(__doc__)
        return 2
    cmd = sys.argv[1]

    if cmd == "gc":
        try:
            keep = int(sys.argv[sys.argv.index("--keep-latest") + 1])
        except (ValueError, IndexError):
            print("usage: artifacts_cli.py gc --keep-latest N")
            return 2
        removed = ART.gc_artifacts(keep)
        for path in removed:
            print(f"removed {path}")
        print(f"kept latest {keep}; removed {len(removed)} fingerprint dir(s)")
        return 0

    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    if cmd == "drop":
        removed = set()
        for table in ("documents", "embeddings"):
            d = os.path.join(ART.artifact_root(), ART.dataset_key(sf_dir, table))
            if os.path.isdir(d) and d not in removed:
                shutil.rmtree(d)
                removed.add(d)
                print(f"removed {d}")
        if not removed:
            print("nothing to drop")
        return 0

    spark = get_spark("artifacts-cli")
    spark.sparkContext.setLogLevel("ERROR")
    if cmd == "build":
        families = sys.argv[3:] or sorted(ART._FAMILIES) + ["spans"]
        for fam in families:
            if fam == "spans":
                ART.spans_artifact(spark, sf_dir).count()
                ART.elected_spans_artifact(spark, sf_dir).count()
            else:
                ART.pairs_artifact(spark, sf_dir, fam).count()
                ART.components_artifact(spark, sf_dir, fam).count()
            print(f"built {fam}")
    for row in ART.artifact_status(spark, sf_dir):
        state = f"{row['rows']} rows" if row["built"] else "NOT BUILT"
        print(f"{row['family']:>8} {row['kind']:<11} {state}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
