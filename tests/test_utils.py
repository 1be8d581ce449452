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


def test_pubchem_mol_geometry_parses_record(monkeypatch):
    """PubChem fetch (reference utils.py:80-112 contract) parsed from a
    canned PUG-REST record; network is mocked (zero-egress image)."""
    import io
    import json as _json
    import urllib.request

    from nbed_tpu.utils import pubchem_mol_geometry

    record = {"PC_Compounds": [{
        "atoms": {"element": [8, 1, 1]},
        "coords": [{"conformers": [{
            "x": [0.0, 0.2774, 0.6068],
            "y": [0.0, 0.8929, -0.2383],
            "z": [0.0, 0.2544, -0.7169],
        }]}],
    }]}

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        assert "record_type=3d" in url and "water" in url
        return _Resp(_json.dumps(record).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    out = pubchem_mol_geometry("water")
    assert out[0] == ("O", (0.0, 0.0, 0.0))
    assert out[1][0] == "H" and out[2][0] == "H"
    assert len(out) == 3


def test_pubchem_offline_raises(monkeypatch):
    import urllib.error
    import urllib.request

    from nbed_tpu.utils import pubchem_mol_geometry

    def fake_urlopen(url, timeout=None):
        raise urllib.error.URLError("no route to host")

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    with pytest.raises(RuntimeError, match="network"):
        pubchem_mol_geometry("water")
