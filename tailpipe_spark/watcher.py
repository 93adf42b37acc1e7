"""File-change watching for live config/catalog reload.

The reference watches its config directory with fsnotify and reloads
connections mid-session (reference:
internal/file_watcher/file_watcher.go, connection_watcher.go). The
dependency-free Spark-side analog is mtime polling: clusters commonly
mount config from NFS or object-store fuse mounts where inotify events
never fire, so a poll at interaction boundaries (each shell statement,
each collect run) is both simpler and more portable. The poll is a
handful of ``stat`` calls — microseconds — so doing it per interactive
statement costs nothing.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class FileWatcher:
    """Detect changes to a set of files and directories by mtime.

    ``changed()`` rescans and returns the paths that were added,
    removed, or modified since the previous call (or construction),
    updating the snapshot. Directories are watched one level deep over
    config-like entries (``*.tpc``/``*.hcl``/``*.json``).
    """

    paths: list[str]
    _snapshot: dict[str, float] = field(default_factory=dict, repr=False)

    def __post_init__(self):
        self._snapshot = self._scan()

    def _scan(self) -> dict[str, float]:
        out: dict[str, float] = {}
        for p in self.paths:
            if os.path.isdir(p):
                try:
                    names = os.listdir(p)
                except OSError:
                    continue
                for name in names:
                    if name.endswith((".tpc", ".hcl", ".json")):
                        fp = os.path.join(p, name)
                        try:
                            out[fp] = os.path.getmtime(fp)
                        except OSError:
                            pass
            elif os.path.exists(p):
                try:
                    out[p] = os.path.getmtime(p)
                except OSError:
                    pass
        return out

    def changed(self) -> list[str]:
        now = self._scan()
        prev = self._snapshot
        delta = sorted(
            set(now) ^ set(prev)
            | {p for p in set(now) & set(prev) if now[p] != prev[p]}
        )
        self._snapshot = now
        return delta
