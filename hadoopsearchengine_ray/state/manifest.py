"""Per-stage / per-partition checkpoint manifest (resume support).

The reference resumes by hand: stages are commented in/out of
``ProcessPipeline()`` (/root/reference/DyableCommand/DyableCommand.cpp:641-724)
and the doc-parse stage rediscovers progress by scanning output file names
(``FindParsedDocumentSetNum``, :106-127).  This module does it properly: a
JSON manifest per index build recording, for every stage, the input
lineage fingerprint (file paths + sizes), row/token/posting counts,
per-partition metrics, wall time and status.  A rerun skips stages whose
lineage matches and whose outputs exist — kill/resume equivalence is
covered by tests/test_resume.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any


def lineage_fingerprint(paths: list[str]) -> str:
    """Stable fingerprint of a set of input files: globally sorted
    (path, size, mtime_ns).

    mtime catches in-place rewrites that happen to keep the byte size
    (at the cost of a spurious rebuild after a copy — the safe
    direction); the file list is sorted as a whole so os.walk's
    filesystem-dependent directory order cannot change the fingerprint."""

    def _stat(fp: str) -> str:
        st = os.stat(fp)
        return f"{fp}:{st.st_size}:{st.st_mtime_ns}"

    entries = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                entries.extend(os.path.join(root, f) for f in files)
        elif os.path.exists(p):
            entries.append(p)
        else:
            entries.append(f"{p}:absent")
    lines = sorted(_stat(e) if not e.endswith(":absent") else e
                   for e in entries)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


@dataclass
class Manifest:
    path: str
    stages: dict[str, dict[str, Any]] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "Manifest":
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            return cls(path=path, stages=data.get("stages", {}))
        return cls(path=path)

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stages": self.stages}, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)  # atomic publish

    def is_done(self, stage: str, lineage: str, output: str | None = None) -> bool:
        ent = self.stages.get(stage)
        if not ent or ent.get("status") != "done" or ent.get("lineage") != lineage:
            return False
        if output is not None and not os.path.exists(output):
            return False
        return True

    def start(self, stage: str, lineage: str, output: str | None = None) -> None:
        self.stages[stage] = {
            "status": "running",
            "lineage": lineage,
            "output": output,
            "started_at": time.time(),
        }
        self.save()

    def finish(self, stage: str, **metrics: Any) -> None:
        ent = self.stages[stage]
        ent["status"] = "done"
        ent["wall_sec"] = round(time.time() - ent["started_at"], 3)
        ent["metrics"] = metrics
        self.save()
