"""Crash-safe staged-directory swap for parquet rewriters.

The ledger and the persisted IVF index both compact by writing a staged
directory and swapping it into place.  A directory swap is two renames —
``mv live old; mv stage live`` — and a crash between them leaves NO live
directory.  The recovery contract here keeps the live path always
restorable:

* ``swap_in`` verifies the STAGED directory (caller-supplied check,
  called with the directory to check) BEFORE touching the live path —
  a bad stage aborts with the previous data still live and untouched.
* After the swap the same check runs against the new live directory
  (catches rename-level corruption); a failure there triggers an
  AUTOMATIC ROLLBACK — the bad tree is moved aside to ``<live>__bad``
  and the displaced ``__old`` copy is restored as live — so the caller
  never observes a live path holding unverified data.
* ``recover`` heals the one non-atomic window (crash between the two
  renames): live missing + ``__old`` present → move it back.  Readers
  call it before opening the path, so a crashed compact self-heals on
  the next read instead of erroring until manual surgery.

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


def swap_in(live: str, stage: str, verify: Callable[[str], None] | None = None) -> None:
    """Replace directory ``live`` with ``stage``.

    ``verify`` (e.g. a 1-row read of the given directory) is called with
    ``stage`` before any rename — an exception there aborts with the
    previous data still live — and with ``live`` after the swap; a
    post-swap failure rolls back automatically (bad tree parked at
    ``<live>__bad``, previous data restored as live) and re-raises.
    Either way the caller never sees unverified data at the live path,
    and the last good copy is never deleted on a failure path.
    """
    old = f"{live}__old"
    bad = f"{live}__bad"
    if verify is not None:
        verify(stage)  # raises -> live path untouched
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(live, old)
    shutil.move(stage, live)
    if verify is not None:
        try:
            verify(live)
        except Exception:
            # roll back: park the bad tree for post-mortem, restore the
            # displaced good copy as live, then surface the failure
            shutil.rmtree(bad, ignore_errors=True)
            shutil.move(live, bad)
            shutil.move(old, live)
            raise
    shutil.rmtree(old, ignore_errors=True)


def atomic_write(path: str, data: bytes) -> None:
    """Crash-safe small-artifact write (same local-FS contract as the
    directory swap above): write to a same-directory temp file, then
    ``os.replace`` — readers see the old content or the new, never a torn
    file."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def atomic_json_write(path: str, obj) -> None:
    """``atomic_write`` for the JSON meta sidecars (index constants,
    Bloom meta): a crash mid-write must never tear the sidecar every
    reopen parses."""
    import json

    atomic_write(path, json.dumps(obj).encode())
