"""On-disk format migrations.

The reference ships three upgrade steps for its LMDB layout
(reference: src/upgrade.rs:26,150,183) with committed old-format assets
exercising them (src/tests/upgrade.rs:11-96).  arroy-tpu's chain:

- **1.0.0 → 1.1.0** — v1.0.0 generations stored state either as plain
  ``*.npy`` files or as a ``state.atc`` container; v1.1.0 declares the
  CRC-checked native container the only store.  The migration rewrites
  the index as a fresh container generation (the loader already reads
  both layouts, like the reference's version-generic read codecs,
  src/node.rs:285-341, so the step is a re-encode — the same shape as
  the reference's 0.5→0.6 version-key rewrite, src/upgrade.rs:150-173).

`upgrade_index` is idempotent and transactional: the rewrite publishes a
new generation atomically, so a crash mid-upgrade leaves the readable
old format in place.
"""

from __future__ import annotations

from .errors import UnknownVersion
from .store.database import Database
from .version import CURRENT_VERSION, OLDEST_READABLE_VERSION, V1_0_0, Version


def _npy_store_to_container(st) -> None:
    """1.0.0 → 1.1.0: nothing to transform in memory — the loader decoded
    the legacy layout already; committing the touched state re-encodes it
    as a container generation (persist._write_state's default store)."""


#: ordered chain of (from_version, to_version, migration_fn)
_MIGRATIONS: list[tuple[Version, Version, object]] = [
    (V1_0_0, Version(1, 1, 0), _npy_store_to_container),
]


def upgrade_index(db: Database, index: int) -> None:
    """Bring one index up to CURRENT_VERSION (in-place, committed)."""
    with db.write() as wtxn:
        st = wtxn.state(index)
        if st is None:
            return
        v = st.version
        if v == CURRENT_VERSION:
            return
        if v < OLDEST_READABLE_VERSION or v > CURRENT_VERSION:
            raise UnknownVersion(str(v))
        st = wtxn.state_mut(index)
        for frm, to, fn in _MIGRATIONS:
            if st.version == frm:
                fn(st)
                st.version = to
        if st.version != CURRENT_VERSION:
            raise UnknownVersion(str(st.version))


def upgrade_all(db: Database) -> list[int]:
    """Upgrade every index in the database; returns those touched."""
    touched = []
    for index in db.read().indexes():
        st = db.read().state(index)
        if st is not None and st.version != CURRENT_VERSION:
            upgrade_index(db, index)
            touched.append(index)
    return touched
