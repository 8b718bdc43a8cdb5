"""On-disk format migrations.

The reference ships three upgrade steps for its LMDB layout
(reference: src/upgrade.rs:26,150,183).  arroy-tpu starts at container
format 1.0.0, so today the only job is validating versions and providing
the dispatch point future formats will hook into — mirroring
`Version`-gated decoding (reference: src/reader.rs:302-315).
"""

from __future__ import annotations

from .errors import UnknownVersion
from .store.database import Database
from .version import CURRENT_VERSION, OLDEST_READABLE_VERSION, Version

#: ordered chain of (from_version, to_version, migration_fn)
_MIGRATIONS: list[tuple[Version, Version, object]] = []


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
