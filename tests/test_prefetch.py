import pytest


def test_prefetch_order_and_exception():
    from codlad_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(100)), size=4)) == list(range(100))
    assert list(prefetch(iter([]), size=2)) == []

    def bad():
        yield 1
        yield 2
        raise ValueError("boom")

    got = []
    with pytest.raises(ValueError, match="boom"):
        for x in prefetch(bad(), size=1):
            got.append(x)
    assert got == [1, 2]
