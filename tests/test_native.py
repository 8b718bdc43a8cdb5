"""Native storage container: format roundtrip, integrity, atomicity."""

import os

import numpy as np
import pytest

from arroy_tpu.native import Container, native_available, write_container


def _arrays():
    rng = np.random.default_rng(0)
    return {
        "vectors": rng.standard_normal((500, 64)).astype(np.float32),
        "ids": np.arange(500, dtype=np.uint32),
        "empty": np.empty((0, 8), np.float32),
        "flags": np.asarray([1, 0, 1], np.int8),
    }


def test_native_library_compiles():
    assert native_available(), "g++ toolchain should build the container library"


def test_roundtrip(tmp_path):
    path = str(tmp_path / "c.atc")
    arrays = _arrays()
    write_container(path, arrays)
    with Container(path, verify=True) as c:
        assert c.names() == sorted(arrays)
        for k, v in arrays.items():
            got = c.array(k)
            assert got.dtype == v.dtype and got.shape == v.shape
            np.testing.assert_array_equal(np.array(got), v)


def test_corruption_detected(tmp_path):
    path = str(tmp_path / "c.atc")
    write_container(path, _arrays())
    data = bytearray(open(path, "rb").read())
    data[-3] ^= 0xFF
    bad = str(tmp_path / "bad.atc")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(OSError, match="crc mismatch"):
        Container(bad, verify=True)


def test_write_is_atomic(tmp_path):
    path = str(tmp_path / "c.atc")
    write_container(path, _arrays())
    before = open(path, "rb").read()
    # a failed write must not clobber the existing file
    try:
        write_container(path, {"bad": None})  # type: ignore[arg-type]
    except Exception:
        pass
    assert open(path, "rb").read() == before


def test_zero_copy_view(tmp_path):
    path = str(tmp_path / "c.atc")
    arrays = _arrays()
    write_container(path, arrays)
    c = Container(path)
    v = c.array("vectors")
    assert not v.flags.writeable  # mmap view is read-only
    assert not v.flags.owndata


def test_many_big_blobs_header_fits(tmp_path):
    """Regression: the layout reserved 4 chars (`null`) per big-blob CRC
    and substituting real 10-digit CRCs overflowed the header into the
    first blob with ~11+ blobs >= 1MB, corrupting the file silently."""
    import numpy as np

    from arroy_tpu.native import Container, write_container

    rng = np.random.default_rng(0)
    arrays = {
        f"blob_{i:02d}": rng.integers(0, 255, 1_300_000, dtype=np.uint8)
        for i in range(15)
    }
    p = str(tmp_path / "big.atc")
    write_container(p, arrays)
    with Container(p, verify=True) as c:
        for name, arr in arrays.items():
            got = np.array(c.array(name))
            np.testing.assert_array_equal(got, arr)
