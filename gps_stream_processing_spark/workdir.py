"""Private on-disk landing root for engine-managed artifacts.

Every query that lands an intermediate layout (json/csv/orc/xml
round-trips, date-partitioned facts, bucketed tables, stream staging
dirs, checkpoints) previously used a fixed world-readable
``/tmp/gps_spark_*_<md5>`` name. On a shared host a pre-created
directory under that predictable name poisons engine and oracle
identically, silently subverting the parity signal (VERDICT r7,
"What's wrong").

This module applies the trust model already shipped for the protobuf
shim (``streaming/protobuf_compat.py::_shim_dir``): a deterministic
PER-USER root is reused ONLY after verification — a real directory
(not a symlink), owned by us, mode 0700 — so warm cross-process reuse
(bench → driver → tests hitting the same ``_SUCCESS``-gated layouts)
still works, while a squatter on the name forces a fresh private
``mkdtemp`` root instead of being read through. Children of a verified
root need no individual checks: 0700 on the root means nobody else can
create or rename entries inside it.
"""

from __future__ import annotations

import os
import stat
import tempfile

_ROOT: str | None = None


def _root_ok(path: str) -> bool:
    """True iff ``path`` is a non-symlink directory we own with no
    group/other permissions — the only state we will read through."""
    try:
        st = os.lstat(path)
    except OSError:
        return False
    return (
        stat.S_ISDIR(st.st_mode)
        and st.st_uid == os.getuid()
        and (st.st_mode & 0o077) == 0
    )


def session_root() -> str:
    """The verified landing root for this process.

    Deterministic per-user name (warm path, shared across processes);
    verified before every reuse. If the name is squatted — foreign
    owner, loose mode, symlink — fall back to a fresh private
    ``mkdtemp`` root, cached for the process so ``_SUCCESS``-gated
    idempotence still holds within the run.
    """
    global _ROOT
    if _ROOT is not None and _root_ok(_ROOT):
        return _ROOT
    base = os.path.join(tempfile.gettempdir(), f"gps_spark_work_{os.getuid()}")
    if not _root_ok(base):
        try:
            os.mkdir(base, mode=0o700)  # no exist_ok: pre-existing = verify-or-reject
        except OSError:
            pass  # lost a race / squatter — the verify below decides
    _ROOT = base if _root_ok(base) else tempfile.mkdtemp(prefix="gps_spark_work_")
    return _ROOT


def land_dir(kind: str, tag_source: str, digest_len: int = 8) -> str:
    """Deterministic child path ``<root>/<kind>_<md5(tag_source)[:n]>``
    under the verified session root. Does not create the directory —
    writers create it (Spark writers mkdir their output path)."""
    import hashlib

    tag = hashlib.md5(tag_source.encode()).hexdigest()[:digest_len]
    return os.path.join(session_root(), f"{kind}_{tag}")
