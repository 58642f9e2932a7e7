"""Row-LUT unit tests: pin the table to an independent re-derivation
of the 2048 slide/merge rules (SURVEY §4 test strategy)."""

import numpy as np

from tpu2048.engine.lut import build_row_tables, pack_row_np


def slide_left_rules(row):
    """Straightforward scalar re-derivation of one row move."""
    tiles = [v for v in row if v != 0]
    out = []
    score = 0
    i = 0
    while i < len(tiles):
        if i + 1 < len(tiles) and tiles[i] == tiles[i + 1]:
            out.append(tiles[i] + 1)
            score += 1 << (tiles[i] + 1)
            i += 2
        else:
            out.append(tiles[i])
            i += 1
    out = out + [0] * (4 - len(out))
    return out, score


def test_lut_matches_rules_exhaustively():
    t = build_row_tables()
    codes = np.arange(65536)
    rows = np.stack([(codes >> s) & 0xF for s in (12, 8, 4, 0)], axis=1)
    # exhaustive check on all 65,536 rows
    for code in range(65536):
        row = rows[code]
        exp_row, exp_score = slide_left_rules(list(row))
        assert list(t.cells[code]) == exp_row, (row, t.cells[code], exp_row)
        assert t.score[code] == exp_score
        assert t.changed[code] == (list(row) != exp_row)


def test_lut_packing_roundtrip():
    t = build_row_tables()
    # codes valid wherever no exponent-16 tile was created
    ok = (t.cells < 16).all(axis=1)
    packed = pack_row_np(t.cells.astype(np.int64))
    assert (packed[ok] == t.codes[ok]).all()


def test_known_rows():
    t = build_row_tables()

    def res(row):
        code = (row[0] << 12) | (row[1] << 8) | (row[2] << 4) | row[3]
        return list(t.cells[code]), int(t.score[code]), bool(t.changed[code])

    assert res([0, 0, 0, 0]) == ([0, 0, 0, 0], 0, False)
    assert res([1, 0, 0, 0]) == ([1, 0, 0, 0], 0, False)
    assert res([0, 0, 0, 1]) == ([1, 0, 0, 0], 0, True)
    assert res([1, 1, 0, 0]) == ([2, 0, 0, 0], 4, True)
    assert res([1, 1, 1, 1]) == ([2, 2, 0, 0], 8, True)
    assert res([1, 1, 2, 2]) == ([2, 3, 0, 0], 12, True)
    assert res([2, 1, 1, 2]) == ([2, 2, 2, 0], 4, True)
    # created tile does not merge again: [1,1,2] -> [2,2], not [3]
    assert res([1, 1, 2, 0]) == ([2, 2, 0, 0], 4, True)
    # 4 distinct non-zero values: the reference's fast path — unchanged
    assert res([1, 2, 3, 4]) == ([1, 2, 3, 4], 0, False)
    assert res([3, 3, 3, 0]) == ([4, 3, 0, 0], 16, True)
