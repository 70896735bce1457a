"""Commit-plane filesystem seam (r12).

The maintenance plane got its injectable filesystem in r11
(operators/maintenance.py ``LocalFilesystem`` — vacuum's lister and
deleter). This module extends the seam to the COMMIT plane: the three
visibility-changing operations a table format's log writer performs —
put-if-absent publish of a commit payload, atomic replace of a
checkpoint part, and atomic small-doc write (``_last_checkpoint``) — go
through this interface instead of binding POSIX calls inline, so an
object-store deployment injects conditional-put/copy semantics without
touching the log writers. Scratch-space operations (Spark's own write
dirs, temp spools) intentionally stay POSIX: they are executor-local by
construction.

Instances may be pickled into tasks — keep them stateless.
"""

from __future__ import annotations

import os
import uuid


class LocalCommitFilesystem:
    """POSIX implementation — the default everywhere."""

    def publish_if_absent(self, src: str, dest: str) -> None:
        """Publish ``src`` under ``dest`` with O_EXCL semantics: raise
        ``FileExistsError`` when ``dest`` already exists (the commit
        version race). POSIX uses ``link`` (atomic, no byte copy); an
        object store implements conditional put (If-None-Match: *)."""
        os.link(src, dest)

    def replace(self, src: str, dest: str) -> None:
        """Atomically move ``src`` over ``dest`` (readers see old-or-new,
        never partial). Object stores implement copy-then-delete on a
        staging key — their single-key puts are already atomic."""
        os.replace(src, dest)

    def write_atomic(self, path: str, data: str) -> None:
        """Write a small document so readers never observe a torn file:
        temp sibling + atomic replace."""
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)
