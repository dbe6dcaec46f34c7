"""Per-partition build manifests: lineage + resume (SURVEY §4.3).

The reference has no checkpointing (re-runs are only semi-idempotent via a
per-url DB check, ``mk_page_vector.py:37``). Here every input partition gets
``manifest/part-<i>.json`` recording the input fingerprint, row counts and
wall time; a resumed build skips partitions whose manifest matches, giving
idempotent re-runs with lineage ("resumable output" contract)."""

from __future__ import annotations

import json
import os
import time


def input_fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"path": os.path.abspath(path), "size": st.st_size}


class BuildManifest:
    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir
        os.makedirs(manifest_dir, exist_ok=True)

    def _part_path(self, part: int) -> str:
        return os.path.join(self.dir, f"part-{part:05d}.json")

    def is_done(self, part: int, input_path: str) -> bool:
        p = self._part_path(part)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                rec = json.load(f)
            return rec.get("input") == input_fingerprint(input_path) and rec.get("status") == "done"
        except (json.JSONDecodeError, OSError):
            return False

    def mark_done(self, part: int, input_path: str, *, rows_in: int, rows_out: int,
                  output_dir: str, wall_sec: float) -> None:
        rec = {
            "status": "done",
            "part": part,
            "input": input_fingerprint(input_path),
            "rows_in": rows_in,
            "rows_out": rows_out,
            "output_dir": output_dir,
            "wall_sec": round(wall_sec, 3),
            "written_at_monotonic": time.monotonic(),
        }
        tmp = self._part_path(part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        os.replace(tmp, self._part_path(part))

    def completed_parts(self) -> list[int]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    rec = json.load(f)
                if rec.get("status") == "done":
                    out.append(rec["part"])
        return out
