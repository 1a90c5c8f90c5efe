"""Copy per-run metric JSONs from runs/ (wiped on every VM reset) into
results_data/sizes/ (committed), so every size-table / multistep row is
regenerable from git alone. Idempotent; run after any training stage.

The reference commits its evidence too
(results/heuristic-medium-19agvs-9pickers-partialobs.xlsx); this is the
rebuild's equivalent durability mechanism.
"""
import pathlib
import shutil

RUNS = pathlib.Path("/root/repo/runs")
DEST = pathlib.Path("/root/repo/results_data/sizes")

# (glob under runs/, destination file name template)
PATTERNS = [
    ("baselines_*/results.json", "{run}__results.json"),
    ("baselines_*/multistep.json", "{run}__multistep.json"),
    ("gde_*/result.json", "{run}__result.json"),
    ("gde_*/multistep.json", "{run}__multistep.json"),
]

if __name__ == "__main__":
    DEST.mkdir(parents=True, exist_ok=True)
    copied = []
    for pat, tmpl in PATTERNS:
        for src in sorted(RUNS.glob(pat)):
            dst = DEST / tmpl.format(run=src.parent.name)
            if (not dst.exists()
                    or src.read_bytes() != dst.read_bytes()):
                shutil.copyfile(src, dst)
                copied.append(str(dst))
    print(f"harvested {len(copied)} file(s)")
    for c in copied:
        print(" ", c)
