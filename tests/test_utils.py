"""XYZ helper tests (reference tests/test_utils.py)."""

import pytest

from nbed_tpu.utils import build_ordered_xyz_string, save_ordered_xyz_file

STRUCT = {
    0: ("O", (0, 0, 0)),
    1: ("H", (0.2774, 0.8929, 0.2544)),
    2: ("H", (0.6068, -0.2383, -0.7169)),
}


def test_build_ordered_xyz_string():
    out = build_ordered_xyz_string(STRUCT, [1, 0, 2])
    lines = out.splitlines()
    assert lines[0] == "3"
    assert lines[2].startswith("H")
    assert lines[3].startswith("O")


def test_invalid_active_indices():
    with pytest.raises(ValueError):
        build_ordered_xyz_string(STRUCT, [5])


def test_save_ordered_xyz_file(tmp_path):
    path = save_ordered_xyz_file("water", STRUCT, [1, 0, 2], save_location=tmp_path)
    assert path.exists()
    content = path.read_text()
    assert content.splitlines()[0] == "3"
