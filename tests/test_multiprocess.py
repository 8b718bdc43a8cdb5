"""Cross-process sharing: the LMDB concurrency contract on files.

Reference behavior: many processes mmap the same store; readers always
see the last commit; one writer at a time (reference: README.md:16,28-37).
"""

import numpy as np

from arroy_tpu import Database, Reader, Writer

from .util import random_vectors


def test_second_handle_sees_commits(tmp_path):
    path = str(tmp_path / "db")
    x = random_vectors(60, 8, seed=1)
    db1 = Database(path)
    w = Writer(db1, 0, 8)
    with db1.write() as wtxn:
        for i in range(30):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(2).build(wtxn)

    db2 = Database(path)  # a second "process"
    r2 = Reader.open(db2.read(), 0, db2)
    assert r2.n_items() == 30

    # first handle commits more; second picks it up on the next read()
    with db1.write() as wtxn:
        for i in range(30, 60):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=2).n_trees(2).build(wtxn)
    r2b = Reader.open(db2.read(), 0, db2)
    assert r2b.n_items() == 60
    # the old snapshot is unaffected (MVCC)
    assert r2.n_items() == 30


def test_writer_lock_file_created(tmp_path):
    import os

    path = str(tmp_path / "db")
    db = Database(path)
    w = Writer(db, 0, 4)
    with db.write() as wtxn:
        w.add_item(wtxn, 0, [1, 2, 3, 4])
        w.builder(seed=1).build(wtxn)
    assert os.path.exists(os.path.join(path, "LOCK"))


def test_subprocess_reader(tmp_path):
    """A genuinely separate process opens and queries the database."""
    import subprocess
    import sys
    import os

    path = str(tmp_path / "db")
    x = random_vectors(40, 8, seed=2)
    db = Database(path)
    w = Writer(db, 0, 8)
    with db.write() as wtxn:
        for i in range(40):
            w.add_item(wtxn, i, x[i])
        w.builder(seed=1).n_trees(2).build(wtxn)

    code = (
        "from arroy_tpu import Database, Reader\n"
        f"db = Database({path!r})\n"
        "r = Reader.open(db.read(), 0, db)\n"
        "r.assert_validity()\n"
        "res = r.nns(3).by_item(5)\n"
        "assert res[0][0] == 5, res\n"
        "print('SUBPROCESS_OK')\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
        timeout=300,
    )
    assert "SUBPROCESS_OK" in out.stdout, out.stdout + out.stderr
