"""Crash-safe staged-directory swap for parquet rewriters — local-FS
and Hadoop-FS backends behind one scheme-dispatched surface.

The ledger and the persisted serving indexes compact by writing a staged
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

Backend dispatch is by URI scheme: a bare path runs on ``os``/``shutil``
exactly as before; a ``scheme://`` path runs through the Hadoop
FileSystem API of the active SparkSession (``file://`` included — the
LocalFileSystem backend, which is also how the Hadoop code path stays
fully testable without a cluster).  The swap contract REQUIRES atomic
directory rename, so only stores that provide it are accepted
(``require_swap_capable``): HDFS, ABFS/ADLS-Gen2, ViewFs, Ozone,
Alluxio, local.  Object stores (s3/gs/wasb/oss/cos) fake rename as
copy+delete — non-atomic and O(data) — and are refused LOUDLY; at
production scale those use a manifest/pointer object instead of renames
(the standard table-format approach), which is out of scope here.

Note the refusal applies to the DIRECTORY-SWAP surfaces (ledgers,
serving indexes) — they are what ``require_swap_capable`` guards.  The
single-file artifact surfaces (the tokenizer version store, the BM25
corpus-constants snapshot, the Bloom artifact) never swap directories:
they write immutable version/artifact trees plus a small pointer/meta
object, which is exactly the manifest/pointer shape object stores
support — on such stores ``atomic_write``'s tmp+rename degrades to
copy+delete of one small object (readers see old or new; the tmp is
transient), an acceptable contract for those surfaces.  They
deliberately do NOT call ``require_swap_capable``.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable


def _scheme(path: str) -> str:
    """URI scheme of ``path`` ('' for a bare local path)."""
    return path.split("://", 1)[0] if "://" in path else ""


#: schemes whose directory rename is atomic — the property the swap
#: contract stands on.  '' = bare local path (os.rename).
_ATOMIC_RENAME_SCHEMES = frozenset(
    {"", "file", "hdfs", "viewfs", "abfs", "abfss", "ofs", "alluxio"}
)


def require_swap_capable(path: str) -> str:
    """Validate that ``path`` lives on a store whose directory rename is
    atomic — the property every dirswap caller (ledgers, serving
    indexes) stands on.  Object-store schemes are refused LOUDLY: their
    rename is copy+delete (non-atomic, O(data)), so a crash mid-"rename"
    would leave exactly the torn state the swap exists to prevent, and
    an unknown scheme is refused rather than assumed safe.  CAVEAT
    (abfs/abfss): directory rename is atomic only on
    HIERARCHICAL-NAMESPACE accounts (ADLS Gen2 with HNS enabled) — a
    flat-namespace blob account mounted via abfs renames as copy+delete
    and re-opens the torn-swap window this check exists to refuse.  The
    scheme alone cannot distinguish the two (account capability, not URI
    shape), so accepting abfs encodes the operator's assertion that the
    account is HNS; on flat-namespace accounts use the manifest/pointer
    layout (``generations`` backend) instead.  Returns the path
    unchanged (URIs stay URIs — every filesystem op downstream
    dispatches on the scheme)."""
    s = _scheme(path)
    if s not in _ATOMIC_RENAME_SCHEMES:
        raise ValueError(
            f"path scheme {s!r} ({path}) does not provide atomic directory "
            "rename; the dirswap crash-heal contract requires it "
            f"(supported: bare local paths and {sorted(_ATOMIC_RENAME_SCHEMES - {''})}). "
            "Object stores need a manifest/pointer layout instead of "
            "directory swaps."
        )
    return path


def _active_spark(spark=None):
    if spark is not None:
        return spark
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "a remote-scheme path needs an active SparkSession for the "
            "Hadoop FileSystem API (none is active and none was passed)"
        )
    return s


class _HadoopFs:
    """Thin wrapper over the JVM Hadoop FileSystem for one path's scheme
    — mirrors exactly the os/shutil surface the local backend uses, so
    the swap/heal logic above it is backend-agnostic."""

    def __init__(self, path: str, spark=None):
        spark = _active_spark(spark)
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._gw = spark.sparkContext._gateway
        self._fs = self.jpath(path).getFileSystem(self._conf)

    def jpath(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self.jpath(p)))

    def isdir(self, p: str) -> bool:
        jp = self.jpath(p)
        return bool(self._fs.exists(jp) and self._fs.getFileStatus(jp).isDirectory())

    def listdir(self, p: str) -> list[str]:
        """Child names (not paths) of directory ``p``; [] when missing."""
        jp = self.jpath(p)
        if not self._fs.exists(jp):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(jp)]

    def rmtree(self, p: str) -> None:
        """Recursive delete, missing-ok (shutil.rmtree(ignore_errors=True)
        semantics)."""
        jp = self.jpath(p)
        if self._fs.exists(jp):
            self._fs.delete(jp, True)

    def move(self, src: str, dst: str) -> None:
        """Directory rename with shutil.move's fail-loudly contract:
        Hadoop rename() signals failure by RETURNING false (dst exists,
        src missing, cross-FS), which silent-corrupts a swap — raise."""
        if not self._fs.rename(self.jpath(src), self.jpath(dst)):
            raise OSError(f"hadoop rename failed: {src} -> {dst}")

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self.jpath(p))

    def read_bytes(self, p: str) -> bytes:
        stream = self._fs.open(self.jpath(p))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def write_bytes(self, p: str, data: bytes) -> None:
        out = self._fs.create(self.jpath(p), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def rename_overwrite(self, src: str, dst: str) -> None:
        """Atomic replace (os.replace semantics) via FileContext rename
        with Options.Rename.OVERWRITE — the sidecar-write commit step."""
        Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gw.new_array(Rename, 1)
        opts[0] = Rename.OVERWRITE
        fctx = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self.jpath(dst).toUri(), self._conf
        )
        fctx.rename(self.jpath(src), self.jpath(dst), opts)


def _hfs(path: str, spark=None) -> _HadoopFs | None:
    """Hadoop backend for ``path``, or None when it is a bare local path."""
    return _HadoopFs(path, spark) if _scheme(path) else None


# -- scheme-dispatched filesystem helpers (the surface the ledgers and
#    serving indexes build their existence checks / dir scans on) --------


def fs_exists(path: str, spark=None) -> bool:
    h = _hfs(path, spark)
    return os.path.exists(path) if h is None else h.exists(path)


def fs_isdir(path: str, spark=None) -> bool:
    h = _hfs(path, spark)
    return os.path.isdir(path) if h is None else h.isdir(path)


def fs_listdir(path: str, spark=None) -> list[str]:
    """Child names of a directory; [] when it does not exist (callers
    scan partition layouts that may not have been written yet)."""
    h = _hfs(path, spark)
    if h is None:
        return os.listdir(path) if os.path.isdir(path) else []
    return h.listdir(path) if h.isdir(path) else []


def fs_rmtree(path: str, spark=None) -> None:
    """Recursive delete, missing-ok."""
    h = _hfs(path, spark)
    if h is None:
        shutil.rmtree(path, ignore_errors=True)
    else:
        h.rmtree(path)


def fs_mkdirs(path: str, spark=None) -> None:
    h = _hfs(path, spark)
    if h is None:
        os.makedirs(path, exist_ok=True)
    else:
        h.mkdirs(path)


def fs_read_bytes(path: str, spark=None) -> bytes:
    h = _hfs(path, spark)
    if h is None:
        with open(path, "rb") as f:
            return f.read()
    return h.read_bytes(path)


# -- the swap/heal contract ----------------------------------------------


def recover(live: str, spark=None) -> bool:
    """Heal a crashed swap: if ``live`` is missing but ``<live>__old``
    exists, restore it.  Returns True if a restore happened."""
    old = f"{live}__old"
    h = _hfs(live, spark)
    if h is None:
        if not os.path.exists(live) and os.path.exists(old):
            shutil.move(old, live)
            return True
        return False
    if not h.exists(live) and h.exists(old):
        h.move(old, live)
        return True
    return False


def swap_in(
    live: str,
    stage: str,
    verify: Callable[[str], None] | None = None,
    spark=None,
) -> None:
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
    h = _hfs(live, spark)
    _rmtree = (lambda p: shutil.rmtree(p, ignore_errors=True)) if h is None else h.rmtree
    _move = shutil.move if h is None else h.move
    if verify is not None:
        verify(stage)  # raises -> live path untouched
    _rmtree(old)
    _move(live, old)
    _move(stage, live)
    if verify is not None:
        try:
            verify(live)
        except Exception:
            # roll back: park the bad tree for post-mortem, restore the
            # displaced good copy as live, then surface the failure
            _rmtree(bad)
            _move(live, bad)
            _move(old, live)
            raise
    _rmtree(old)


def atomic_write(path: str, data: bytes, spark=None) -> None:
    """Crash-safe small-artifact write: write to a same-directory temp
    file, then atomically replace (``os.replace`` locally; FileContext
    rename-with-OVERWRITE on Hadoop stores) — readers see the old content
    or the new, never a torn file."""
    tmp = path + ".tmp"
    h = _hfs(path, spark)
    if h is None:
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    else:
        h.write_bytes(tmp, data)
        h.rename_overwrite(tmp, path)


def atomic_json_write(path: str, obj, spark=None) -> None:
    """``atomic_write`` for the JSON meta sidecars (index constants,
    Bloom meta): a crash mid-write must never tear the sidecar every
    reopen parses."""
    import json

    atomic_write(path, json.dumps(obj).encode(), spark)
