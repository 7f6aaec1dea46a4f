"""Join-tree scheduler: fan-out, claim folding, retry/idempotency."""

import numpy as np
import pytest

from zeth_tpu.recursion import aggregate_segments
from zeth_tpu.recursion.scheduler import _leaf_claim, join_claims


def _fake_prove(seg):
    return np.full(8, seg, dtype=np.uint32)


def test_aggregate_root_is_deterministic_fold():
    segs = [1, 2, 3, 4, 5]
    tree = aggregate_segments(segs, _fake_prove, max_workers=3)
    assert len(tree.seals) == 5
    c = [_leaf_claim(_fake_prove(s)) for s in segs]
    l1 = [join_claims(c[0], c[1]), join_claims(c[2], c[3]), c[4]]
    l2 = [join_claims(l1[0], l1[1]), l1[2]]
    want = join_claims(l2[0], l2[1])
    assert (tree.root_claim == want).all()
    assert tree.depth == 3


def test_aggregate_retries_flaky_worker():
    failures = {2: 1}

    def flaky(seg):
        if failures.get(seg, 0) > 0:
            failures[seg] -= 1
            raise RuntimeError("transient")
        return _fake_prove(seg)

    tree = aggregate_segments([1, 2, 3], flaky, max_workers=2)
    assert tree.retries == 1
    ok = aggregate_segments([1, 2, 3], _fake_prove)
    assert (tree.root_claim == ok.root_claim).all()


def test_aggregate_gives_up_after_max_retries():
    def always_fail(seg):
        raise RuntimeError("dead")

    with pytest.raises(RuntimeError):
        aggregate_segments([1], always_fail, max_retries=1)


def test_single_segment_tree():
    tree = aggregate_segments([9], _fake_prove)
    assert tree.depth == 0
    assert (tree.root_claim == _leaf_claim(_fake_prove(9))).all()
