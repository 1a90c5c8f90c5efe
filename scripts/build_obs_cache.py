"""Pre-build the mmap observation sidecars for dataset files.

The TrajectoryDataset cache (data/dataset.py) is built lazily on first
full load; on hosts with slow anonymous page faults it pays to build all
sidecars once, up front, with the streaming memmap writer — every later
trainer/eval stage then maps them in milliseconds.

Usage: python scripts/build_obs_cache.py 'datasets/*large*.h5' [...]
"""
import glob
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu.data.dataset import TrajectoryDataset  # noqa: E402


def main():
    pats = sys.argv[1:] or ["datasets/*.h5"]
    files = sorted({f for p in pats for f in glob.glob(p)})
    for f in files:
        t0 = time.time()
        eps, na, npk = TrajectoryDataset._load_file(f, cache=True)
        print(
            f"{f}: {len(eps)} episodes, {na}+{npk} agents, "
            f"{time.time() - t0:.0f}s",
            flush=True,
        )
        del eps


if __name__ == "__main__":
    main()
