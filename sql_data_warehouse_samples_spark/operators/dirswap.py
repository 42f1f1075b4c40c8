"""Crash-safe staged-directory swap for parquet rewriters.

The ledger and the persisted IVF index both compact by writing a staged
directory and swapping it into place.  A directory swap is two renames —
``mv live old; mv stage live`` — and a crash between them leaves NO live
directory.  The recovery contract here keeps the live path always
restorable:

* ``swap_in`` verifies the staged directory (caller-supplied check)
  BEFORE touching the live path, and deletes the displaced ``__old`` copy
  only after the new live directory passes the same check — a failure at
  any point leaves either the old data live or the old data at
  ``<live>__old``.
* ``recover`` heals the one non-atomic window (crash between the two
  renames): live missing + ``__old`` present → move it back.  Readers
  call it before opening the path, so a crashed compact self-heals on the
  next read instead of erroring until manual surgery.

Object stores at production scale do this with a manifest/pointer object
instead of renames; the directory form keeps the local/simple-FS layout
engine-portable while preserving the same "always a readable corpus"
guarantee.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable


def recover(live: str) -> bool:
    """Heal a crashed swap: if ``live`` is missing but ``<live>__old``
    exists, restore it.  Returns True if a restore happened."""
    old = f"{live}__old"
    if not os.path.exists(live) and os.path.exists(old):
        shutil.move(old, live)
        return True
    return False


def swap_in(live: str, stage: str, verify: Callable[[], None] | None = None) -> None:
    """Replace directory ``live`` with ``stage``.

    ``verify`` (e.g. a 1-row read of the target) runs against the staged
    data before the swap and against the new live directory before the
    displaced copy is deleted; an exception aborts with the previous data
    still live (before the swap) or preserved at ``<live>__old`` (after).
    """
    old = f"{live}__old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(live, old)
    shutil.move(stage, live)
    if verify is not None:
        verify()  # raises -> old copy kept on disk at <live>__old
    shutil.rmtree(old, ignore_errors=True)
