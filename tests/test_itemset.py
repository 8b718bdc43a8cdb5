import numpy as np

from arroy_tpu.utils.itemset import ItemSet


def test_basic_ops():
    a = ItemSet([3, 1, 2, 3])
    assert len(a) == 3
    assert list(a) == [1, 2, 3]
    assert 2 in a and 5 not in a


def test_algebra():
    a = ItemSet([1, 2, 3, 4])
    b = ItemSet([3, 4, 5])
    assert list(a & b) == [3, 4]
    assert list(a | b) == [1, 2, 3, 4, 5]
    assert list(a - b) == [1, 2]
    assert a.is_superset(ItemSet([2, 4]))
    assert not b.is_superset(a)


def test_contains_many():
    a = ItemSet([10, 20, 30])
    got = a.contains_many(np.array([5, 10, 25, 30], dtype=np.uint32))
    assert got.tolist() == [False, True, False, True]


def test_u32_max():
    a = ItemSet([0, 2**32 - 1])
    assert 2**32 - 1 in a
    assert a.max() == 2**32 - 1


def test_empty():
    a = ItemSet()
    assert a.is_empty()
    assert list(a & ItemSet([1])) == []
    assert not a.contains_many(np.array([1], np.uint32)).any()
