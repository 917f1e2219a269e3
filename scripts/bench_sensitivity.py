"""bench.py methodology sensitivity (VERDICT r3 weak #5): the serving
throughput number is measured by dispatching ``iters`` batches and
draining the device queue with one read (bench.py measure()); this
sweep documents the value's sensitivity to iters ∈ {10, 20, 40} and
warmup ∈ {2, 4} so the headline number isn't self-calibrated to a
single operating point. One JSON line per cell.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import measure  # noqa: E402


def main():
    rows = []
    for warmup in (2, 4):
        for iters in (10, 20, 40):
            v = measure(iters=iters, warmup=warmup)
            rows.append({"iters": iters, "warmup": warmup, "patches_per_sec": round(v, 2)})
            print(json.dumps(rows[-1]), flush=True)
    spread = max(r["patches_per_sec"] for r in rows) - min(r["patches_per_sec"] for r in rows)
    print(json.dumps({"spread_patches_per_sec": round(spread, 2)}))


if __name__ == "__main__":
    main()
