"""Per-partition checkpoint manifest: resumable validation runs.

The reference has no fault tolerance (SURVEY.md §4).  The engine's contract
(north_rule) is: a run can be killed and resumed, skipping completed work.

Layout under the run's output dir::

    out/
      features/item=<item_id>/part.parquet      (atomic: tmp + rename)
      violations/<check>/...
      verdicts/...
      _manifest/<unit>.json                     (one file per completed unit)

A unit is "done" only once its output files are fully written: writers
write to a temp path and rename, then drop the manifest marker — the
write-then-rename protocol from SURVEY.md §7 hard-part 6.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, out_dir: str) -> None:
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, unit: str) -> str:
        safe = unit.replace("/", "__")
        return os.path.join(self.dir, f"{safe}.json")

    def is_done(self, unit: str) -> bool:
        return os.path.exists(self._path(unit))

    def mark_done(self, unit: str, **info) -> None:
        tmp = self._path(unit) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"unit": unit, "ts": time.time(), **info}, f)
        os.replace(tmp, self._path(unit))

    def completed_units(self) -> list[str]:
        out = []
        for f in os.listdir(self.dir):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    out.append(json.load(fh)["unit"])
        return sorted(out)


def atomic_write_parquet(table, final_path: str) -> None:
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, final_path)
