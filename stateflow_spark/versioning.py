"""CURRENT-pointer resolution for versioned stored-index layouts.

The apply jobs (similarity.ivf_apply_resplit, dedup.minhash_apply_
compaction) publish IMMUTABLE index versions: a fully-built directory
appears atomically under a fresh name and is never mutated afterwards
(DEPLOY.md "Concurrent-probe contract"). What production still needs is
the cutover primitive — the pointer probes resolve at startup. This
module is that primitive, filesystem-portable and crash-safe:

- `publish_current(root, version_dir)` repoints `<root>/CURRENT` with a
  write-temp + os.replace — atomic on POSIX, so a concurrent
  `resolve_current` reads either the old or the new pointer, never a
  torn one. The version must carry its `_INDEX_READY` stamp (refused
  otherwise: an unstamped dir is a .building scratch or a partial copy).
- `resolve_current(root)` returns the pointed-at version directory and
  verifies its READY stamp. A prober resolves ONCE and holds that
  version for its lifetime (batch job or streaming query) — versions
  being immutable, a publish during the run is invisible to it; picking
  up the new version is a re-resolve (stream restart), exactly the
  round-12 soak's demonstrated posture.

On an object store replace the pointer file with the store's
conditional-put (S3 If-None-Match / GCS generation preconditions); the
version directories themselves need no changes — immutability is what
makes eventual consistency a non-issue for readers.
"""

from __future__ import annotations

import os

READY_MARKER = "_INDEX_READY"
POINTER = "CURRENT"


def publish_current(root: str, version_dir: str) -> str:
    """Atomically repoint `<root>/CURRENT` at `version_dir`.

    Returns the pointer path. Refuses an unstamped version: the READY
    marker is what separates a published, immutable version from a
    .building scratch."""
    version_dir = os.path.abspath(version_dir)
    if not os.path.exists(os.path.join(version_dir, READY_MARKER)):
        raise ValueError(
            f"refusing to publish {version_dir}: no {READY_MARKER} stamp "
            "(not a fully-published index version)"
        )
    os.makedirs(root, exist_ok=True)
    ptr = os.path.join(root, POINTER)
    tmp = ptr + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(version_dir + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ptr)  # atomic: readers see old or new, never torn
    return ptr


def resolve_current(root: str) -> str:
    """Resolve `<root>/CURRENT` to the live version directory, verifying
    its READY stamp. Resolve once per job and hold the result — the
    version is immutable for your lifetime."""
    ptr = os.path.join(root, POINTER)
    with open(ptr) as f:
        version_dir = f.read().strip()
    if not os.path.exists(os.path.join(version_dir, READY_MARKER)):
        raise ValueError(
            f"CURRENT points at {version_dir} which has no {READY_MARKER} "
            "stamp — a partial copy or a deleted version"
        )
    return version_dir
